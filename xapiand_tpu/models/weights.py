"""Ranking weight schemes: host-side per-term constants + device per-posting
formulas.

Reference parity target: src/xapian/weight/ — the full registry:
bm25weight.cc, bm25plusweight.cc, tfidfweight.cc, tradweight.cc,
boolweight.cc, coordweight.cc, dicecoeffweight.cc, the DFR family
(inl2weight.cc, ifb2weight.cc, ineb2weight.cc, bb2weight.cc, pl2weight.cc,
pl2plusweight.cc, dlhweight.cc, dphweight.cc) and the unigram language
model (lmweight.cc). Each scheme splits as the reference does: ``init()``
computes per-term constants from collection statistics host-side;
``get_sumpart(wdf, doclen, uniqterms)`` is evaluated per posting — here
vectorised on the VPU over posting blocks.

Schemes may need more than one per-term constant (DFR schemes need both an
idf-style product and the collection frequency F): ``n_constants`` declares
how many; ``term_constant`` then returns a tuple and the bound plan carries
a [T, n_constants] array. Schemes with ``needs_uniqterms`` (dicecoeff, LM
absolute-discount smoothing) additionally receive the per-document distinct
term count (Xapian's UNIQUE_TERMS statistic).

Global statistics (collection_size N, average length, per-term termfreq and
collfreq) come from the *whole index* across shards (the two-phase
prepare_mset/add_prepared_mset stat merge of the reference,
src/database/handler.cc:1532-1538, happens at plan time on host because the
coordinator's term dictionary already aggregates per-shard lens).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

_LN2 = math.log(2.0)
_LOG2_2PI = math.log2(2.0 * math.pi)


@dataclass(frozen=True)
class CollectionStats:
    doc_count: int          # N
    avg_doclen: float       # collection average document length
    doclen_lower: float = 1.0
    doclen_upper: float = 1.0
    total_len: float = 0.0  # total term occurrences (sum of doclens)
    query_length: int = 1   # sum of wqf over the query's terms


class WeightScheme:
    """Base: subclasses define term_constant() and sumpart()."""

    name = "base"
    n_constants = 1          # floats returned by term_constant()
    needs_uniqterms = False  # sumpart() wants per-doc distinct-term counts

    def impact_np(self, wdf, doclen, stats: CollectionStats):
        """Numpy per-posting impact g(wdf, doclen) for schemes whose
        sumpart factorises as tconst * g (the maxweight-pruning order,
        ≙ bm25weight.cc:184 get_maxpart). None = not separable; the
        impact-prefix fast path (ops/executor.py prefix mode) is then
        unavailable for this scheme."""
        return None

    def term_constant(self, stats: CollectionStats, termfreq: int,
                      wqf: int = 1, factor: float = 1.0, collfreq: int = 0):
        """Host-side per-term constant(s) (the reference's Weight::init)."""
        raise NotImplementedError

    def sumpart(self, wdf, doclen, tconst, stats: CollectionStats,
                uniq=None):
        """Vectorised device formula over posting blocks.

        tconst is a scalar when n_constants == 1, else a [n_constants]
        vector; wdf/doclen (and uniq when needs_uniqterms) are [L] blocks.
        """
        raise NotImplementedError

    def max_sumpart(self, tconst: float, max_wdf: float,
                    stats: CollectionStats) -> float:
        """Upper bound (block-max pruning analog, bm25weight.cc:184)."""
        t = tconst[0] if hasattr(tconst, "__len__") else tconst
        return abs(t) * 1e9

    def key(self) -> str:
        return self.name


def _wdfn(wdf, doclen, c, avg):
    """DFR "normalization 2": wdfn = wdf * log2(1 + c*avg_len/len)."""
    return wdf * jnp.log2(1.0 + c * avg / jnp.maximum(doclen, 1.0))


class BM25(WeightScheme):
    """Xapian::BM25Weight (bm25weight.cc). Defaults k1=1, k2=0, k3=1, b=0.5,
    min_normlen=0.5."""

    name = "bm25"

    def __init__(self, k1: float = 1.0, k2: float = 0.0, k3: float = 1.0,
                 b: float = 0.5, min_normlen: float = 0.5):
        self.k1, self.k2, self.k3, self.b = k1, k2, k3, b
        self.min_normlen = min_normlen

    def key(self):
        return f"bm25:{self.k1}:{self.k2}:{self.k3}:{self.b}:{self.min_normlen}"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        # bm25weight.cc:49-90 (no rset path)
        n = max(int(termfreq), 0)
        tw = (stats.doc_count - n + 0.5) / (n + 0.5)
        if tw < 2.0:
            tw = tw * 0.5 + 1.0
        termweight = math.log(tw) * factor
        if self.k3 != 0:
            termweight *= (self.k3 + 1.0) * wqf / (self.k3 + wqf)
        termweight *= (self.k1 + 1.0)
        return termweight

    def _len_factor(self, stats):
        if self.k2 == 0 and (self.b == 0 or self.k1 == 0):
            return 0.0
        # trace-safe: avg_doclen may be a jax scalar inside jit
        return jnp.where(stats.avg_doclen > 0,
                         1.0 / jnp.maximum(stats.avg_doclen, 1e-9), 0.0)

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        # bm25weight.cc:171-181
        lf = self._len_factor(stats)
        normlen = jnp.maximum(doclen * lf, self.min_normlen)
        denom = self.k1 * (normlen * self.b + (1.0 - self.b)) + wdf
        return tconst * (wdf / jnp.maximum(denom, 1e-9))

    def impact_np(self, wdf, doclen, stats):
        # sumpart == tconst * g: the same formula, host-side numpy (the
        # impact-prefix build sorts 10^7-10^8 postings; routing that
        # through jnp would round-trip the arrays over the device tunnel)
        import numpy as np
        avg = float(stats.avg_doclen)
        lf = (1.0 / max(avg, 1e-9)) if (avg > 0 and not (
            self.k2 == 0 and (self.b == 0 or self.k1 == 0))) else 0.0
        normlen = np.maximum(doclen * lf, self.min_normlen)
        denom = self.k1 * (normlen * self.b + (1.0 - self.b)) + wdf
        return (wdf / np.maximum(denom, 1e-9)).astype(np.float32)

    def sumextra(self, doclen, stats):
        # bm25weight.cc:219-224 (k2 doc-length correction; k2=0 default)
        if self.k2 == 0:
            return None
        lf = self._len_factor(stats)
        normlen = jnp.maximum(doclen * lf, self.min_normlen)
        return (2.0 * self.k2 * stats.query_length) / (1.0 + normlen)

    def max_sumpart(self, tconst, max_wdf, stats):
        lf = self._len_factor(stats)
        normlen_lb = max(max(max_wdf, stats.doclen_lower) * lf,
                         self.min_normlen)
        denom = self.k1
        if self.k1 != 0 and self.b != 0:
            denom *= normlen_lb * self.b + (1 - self.b)
        denom += max_wdf
        return tconst * (max_wdf / denom) if denom > 0 else 0.0


class BM25Plus(BM25):
    """Xapian::BM25PlusWeight (bm25plusweight.cc): BM25 + delta lower bound."""

    name = "bm25plus"

    def __init__(self, k1: float = 1.0, k2: float = 0.0, k3: float = 1.0,
                 b: float = 0.5, min_normlen: float = 0.5,
                 delta: float = 1.0):
        super().__init__(k1, k2, k3, b, min_normlen)
        self.delta = delta

    def key(self):
        return super().key() + f":+{self.delta}"

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        lf = self._len_factor(stats)
        normlen = jnp.maximum(doclen * lf, self.min_normlen)
        denom = self.k1 * (normlen * self.b + (1.0 - self.b)) + wdf
        part = wdf / jnp.maximum(denom, 1e-9) + self.delta / (self.k1 + 1.0)
        return jnp.where(wdf > 0, tconst * part, 0.0)

    def max_sumpart(self, tconst, max_wdf, stats):
        return super().max_sumpart(tconst, max_wdf, stats) + \
            abs(tconst) * self.delta / (self.k1 + 1.0)


class TfIdf(WeightScheme):
    """Xapian::TfIdfWeight, default normalizations "ntn"
    (tfidfweight.cc: wdf * log(N/termfreq))."""

    name = "tfidf"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        n = max(int(termfreq), 1)
        return math.log(stats.doc_count / n) * factor * wqf

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        return tconst * wdf

    def max_sumpart(self, tconst, max_wdf, stats):
        return tconst * max_wdf


class Trad(WeightScheme):
    """Xapian::TradWeight (tradweight.cc): k * wdf / (k*normlen + wdf) * idf."""

    name = "trad"

    def __init__(self, k: float = 1.0):
        self.k = k

    def key(self):
        return f"trad:{self.k}"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        n = max(int(termfreq), 0)
        tw = (stats.doc_count - n + 0.5) / (n + 0.5)
        if tw < 2.0:
            tw = tw * 0.5 + 1.0
        return math.log(tw) * factor

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        if self.k == 0:
            return tconst * jnp.ones_like(wdf)
        normlen = doclen / jnp.maximum(stats.avg_doclen, 1e-9)
        denom = self.k * normlen + wdf
        return tconst * (wdf / jnp.maximum(denom, 1e-9))


class Bool(WeightScheme):
    """Xapian::BoolWeight: all weights zero."""

    name = "bool"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        return 0.0

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        return jnp.zeros_like(wdf)

    def max_sumpart(self, tconst, max_wdf, stats):
        return 0.0


class Coord(WeightScheme):
    """Xapian::CoordWeight: 1 per matching term."""

    name = "coord"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        return factor

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        return tconst * jnp.ones_like(wdf)

    def max_sumpart(self, tconst, max_wdf, stats):
        return tconst


class DiceCoeff(WeightScheme):
    """Xapian::DiceCoeffWeight (dicecoeffweight.cc):
    2 * wqf / (query_length + uniqterms(doc))."""

    name = "dicecoeff"
    needs_uniqterms = True

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        return wqf * factor

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        qlen = stats.query_length
        u = uniq if uniq is not None else jnp.ones_like(wdf)
        return jnp.where(wdf > 0, tconst * 2.0 / (qlen + u), 0.0)

    def max_sumpart(self, tconst, max_wdf, stats):
        return tconst * 2.0 / (1.0 + 1.0)


# ---------------------------------------------------------------------------
# DFR (Divergence From Randomness) family
# ---------------------------------------------------------------------------

class InL2(WeightScheme):
    """Xapian::InL2Weight (inl2weight.cc): I(n)L2 —
    idf = log2((N+1)/(n+0.5)); w = idf * wdfn/(wdfn+1)."""

    name = "inl2"

    def __init__(self, c: float = 1.0):
        if c <= 0:
            raise ValueError("Parameter c is invalid.")
        self.c = c

    def key(self):
        return f"{self.name}:{self.c}"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        n = max(int(termfreq), 0)
        idf = math.log2((stats.doc_count + 1.0) / (n + 0.5))
        return wqf * factor * idf

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        wdfn = _wdfn(wdf, doclen, self.c, stats.avg_doclen)
        return jnp.where(wdf > 0, tconst * wdfn / (wdfn + 1.0), 0.0)

    def max_sumpart(self, tconst, max_wdf, stats):
        wu = max_wdf * math.log2(
            1.0 + self.c * stats.avg_doclen / max(stats.doclen_lower, 1.0))
        return tconst * wu / (wu + 1.0) if wu > 0 else 0.0


class IfB2(WeightScheme):
    """Xapian::IfB2Weight (ifb2weight.cc): I(F)B2 —
    idf = log2((N+1)/(F+0.5)); B = (F+1)/(n*(wdfn+1)); w = idf * wdfn * B."""

    name = "ifb2"
    n_constants = 2

    def __init__(self, c: float = 1.0):
        if c <= 0:
            raise ValueError("Parameter c is invalid.")
        self.c = c

    def key(self):
        return f"{self.name}:{self.c}"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        n = max(int(termfreq), 1)
        F = max(int(collfreq), 1)
        idf = math.log2((stats.doc_count + 1.0) / (F + 0.5))
        return (wqf * factor * idf, (F + 1.0) / n)

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        wdfn = _wdfn(wdf, doclen, self.c, stats.avg_doclen)
        w = tconst[0] * wdfn * tconst[1] / (wdfn + 1.0)
        return jnp.where(wdf > 0, w, 0.0)

    def max_sumpart(self, tconst, max_wdf, stats):
        wu = max_wdf * math.log2(
            1.0 + self.c * stats.avg_doclen / max(stats.doclen_lower, 1.0))
        return tconst[0] * wu * tconst[1] / (wu + 1.0) if wu > 0 else 0.0


class IneB2(IfB2):
    """Xapian::IneB2Weight (ineb2weight.cc): I(n_e)B2 — idf uses the
    expected number of documents containing the term, ne = N*(1-e^{-F/N})."""

    name = "ineb2"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        n = max(int(termfreq), 1)
        F = max(int(collfreq), 1)
        N = max(stats.doc_count, 1)
        mean = F / N
        expected = N * (1.0 - math.exp(-mean))
        idf = math.log2((N + 1.0) / (expected + 0.5))
        return (wqf * factor * idf, (F + 1.0) / n)


class BB2(WeightScheme):
    """Xapian::BB2Weight (bb2weight.cc): Bose-Einstein stats with Stirling
    approximation; B2 first normalization."""

    name = "bb2"
    n_constants = 2

    def __init__(self, c: float = 1.0):
        if c <= 0:
            raise ValueError("Parameter c is invalid.")
        self.c = c

    def key(self):
        return f"{self.name}:{self.c}"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        n = max(int(termfreq), 1)
        F = max(int(collfreq), 1)
        return (wqf * factor * (F + 1.0) / n, float(F))

    @staticmethod
    def _stirling(difference, y, constant):
        # stirling_value(d, y, c) = (y+0.5)*(c - log2 y) + d*c
        return (y + 0.5) * (constant - jnp.log2(jnp.maximum(y, 1e-9))) \
            + difference * constant

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        F = tconst[1]
        wdfn = _wdfn(wdf, doclen, self.c, stats.avg_doclen)
        wdfn = jnp.minimum(wdfn, F - 1.0)     # clamp (bb2weight.cc)
        N = jnp.maximum(stats.doc_count, 2.0)
        wt = -1.0 / _LN2 - jnp.log2(N - 1.0)
        sc1 = jnp.log2(N + F - 1.0)
        sc2 = jnp.log2(F)
        y2 = F - wdfn
        y1 = (N - 2.0) + y2
        stirling = self._stirling(wdfn + 1.0, y1, sc1) - \
            self._stirling(wdfn, y2, sc2)
        w = tconst[0] / (wdfn + 1.0) * (wt + stirling)
        return jnp.where((wdf > 0) & (w > 0), w, 0.0)


class PL2(WeightScheme):
    """Xapian::PL2Weight (pl2weight.cc): Poisson + Laplace + normalization 2.
    P = P1 + (wdfn+0.5)*log2(wdfn) - P2*wdfn; w = P/(wdfn+1)."""

    name = "pl2"
    n_constants = 2

    def __init__(self, c: float = 1.0):
        if c <= 0:
            raise ValueError("Parameter c is invalid.")
        self.c = c

    def key(self):
        return f"{self.name}:{self.c}"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        F = max(int(collfreq), 1)
        return (wqf * factor, float(F))

    def _P(self, wdfn, F, stats):
        mean = F / jnp.maximum(stats.doc_count, 1.0)
        P1 = mean / _LN2 + 0.5 * _LOG2_2PI
        P2 = jnp.log2(mean) + 1.0 / _LN2
        return P1 + (wdfn + 0.5) * jnp.log2(jnp.maximum(wdfn, 1e-9)) \
            - P2 * wdfn

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        wdfn = _wdfn(wdf, doclen, self.c, stats.avg_doclen)
        P = self._P(wdfn, tconst[1], stats)
        w = tconst[0] * P / (wdfn + 1.0)
        return jnp.where((wdf > 0) & (P > 0), w, 0.0)


class PL2Plus(PL2):
    """Xapian::PL2PlusWeight (pl2plusweight.cc): PL2 + delta lower-bound
    correction; zero unless collection mean F/N >= 1."""

    name = "pl2plus"

    def __init__(self, c: float = 1.0, delta: float = 0.8):
        super().__init__(c)
        if delta <= 0:
            raise ValueError("Parameter delta is invalid.")
        self.delta = delta

    def key(self):
        return f"{self.name}:{self.c}:{self.delta}"

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        F = tconst[1]
        mean = F / jnp.maximum(stats.doc_count, 1.0)
        wdfn = _wdfn(wdf, doclen, self.c, stats.avg_doclen)
        P = self._P(wdfn, F, stats)
        dw = self._P(jnp.full_like(wdfn, self.delta), F, stats) \
            / (self.delta + 1.0)
        wt = P / (wdfn + 1.0) + dw
        w = tconst[0] * wt
        return jnp.where((wdf > 0) & (mean >= 1.0) & (wt > 0), w, 0.0)


class DLH(WeightScheme):
    """Xapian::DLHWeight (dlhweight.cc) — parameter-free DFR hypergeometric.

    wt = (wdf*log2(f * avg*N/F) + (len-wdf)*log2(1-f)
          + 0.5*log2(2*pi*wdf*(1-f))) / (wdf + 0.5), f = wdf/len.
    """

    name = "dlh"
    n_constants = 2

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        F = max(int(collfreq), 1)
        return (wqf * factor, float(F))

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        F = tconst[1]
        log_const = stats.avg_doclen * stats.doc_count / F
        doclen = jnp.maximum(doclen, 1.0)
        f = wdf / doclen
        omf = jnp.clip(1.0 - f, 1e-9, 1.0)
        wdfs = jnp.maximum(wdf, 1e-9)
        wt = wdf * jnp.log2(jnp.maximum(f * log_const, 1e-30)) \
            + (doclen - wdf) * jnp.log2(omf) \
            + 0.5 * jnp.log2(2.0 * math.pi * wdfs * omf)
        w = tconst[0] * wt / (wdfs + 0.5)
        return jnp.where((wdf > 0) & (wdf < doclen) & (wt > 0), w, 0.0)


class DPH(WeightScheme):
    """Xapian::DPHWeight (dphweight.cc) — parameter-free DFR.

    norm = (1-f)^2/(wdf+1);
    wt = norm * (wdf*log2(f * avg*N/F) + 0.5*log2(2*pi*wdf*(1-f))).
    """

    name = "dph"
    n_constants = 2

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        F = max(int(collfreq), 1)
        return (wqf * factor, float(F))

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        F = tconst[1]
        log_const = stats.avg_doclen * stats.doc_count / F
        doclen = jnp.maximum(doclen, 1.0)
        f = wdf / doclen
        omf = jnp.clip(1.0 - f, 1e-9, 1.0)
        wdfs = jnp.maximum(wdf, 1e-9)
        norm = omf * omf / (wdf + 1.0)
        wt = norm * (wdf * jnp.log2(jnp.maximum(f * log_const, 1e-30))
                     + 0.5 * jnp.log2(2.0 * math.pi * wdfs * omf))
        w = tconst[0] * wt
        return jnp.where((wdf > 0) & (wdf < doclen) & (wt > 0), w, 0.0)


class LM(WeightScheme):
    """Xapian::LMWeight (lmweight.cc): unigram language model with smoothing.

    smoothing in {"two_stage" (default), "jelinek_mercer", "dirichlet",
    "dirichlet_plus", "absolute_discount"}; defaults param_log=0 (-> doclen
    upper bound), s1=0.7, s2=2000. weight_collection = F / total collection
    length; score = log(weight_sum * param_log) when > 0.
    """

    name = "lm"
    n_constants = 2

    SMOOTHINGS = ("two_stage", "jelinek_mercer", "dirichlet",
                  "dirichlet_plus", "absolute_discount")

    def __init__(self, param_log: float = 0.0, smoothing: str = "two_stage",
                 s1: float = 0.7, s2: float = 2000.0):
        if smoothing not in self.SMOOTHINGS:
            raise ValueError(f"unknown LM smoothing {smoothing!r}")
        self.param_log = param_log
        self.smoothing = smoothing
        self.s1, self.s2 = s1, s2

    @property
    def needs_uniqterms(self):
        return self.smoothing == "absolute_discount"

    def key(self):
        return f"lm:{self.param_log}:{self.smoothing}:{self.s1}:{self.s2}"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0, collfreq=0):
        F = max(int(collfreq), 1)
        total = max(stats.total_len, 1.0)
        return (factor, F / total)   # (factor, weight_collection)

    def sumpart(self, wdf, doclen, tconst, stats, uniq=None):
        wc = tconst[1]
        s1, s2 = self.s1, self.s2
        ln = jnp.maximum(doclen, 1.0)
        if self.smoothing == "jelinek_mercer":
            ws = s1 * wc + (1.0 - s1) * wdf / ln
        elif self.smoothing == "dirichlet":
            ws = (wdf + s1 * wc) / (ln + s1)
        elif self.smoothing == "dirichlet_plus":
            ws = (1.0 + wdf / (s1 * wc)) * (1.0 + s2 / (s1 * wc))
        elif self.smoothing == "absolute_discount":
            u = uniq if uniq is not None else jnp.ones_like(wdf)
            ws = jnp.maximum(wdf - s1, 0.0) / ln + (s1 * wc * u) / ln
        else:  # two_stage
            ws = (1.0 - s1) * (wdf + s2 * wc) / (ln + s2) + s1 * wc
        pl = self.param_log if self.param_log > 0 else stats.doclen_upper
        product = ws * pl
        return jnp.where((wdf > 0) & (product > 1.0),
                         tconst[0] * jnp.log(jnp.maximum(product, 1.0)), 0.0)


_SCHEMES = {
    "bm25": BM25, "bm25plus": BM25Plus, "tfidf": TfIdf, "trad": Trad,
    "bool": Bool, "coord": Coord, "dicecoeff": DiceCoeff,
    "inl2": InL2, "ifb2": IfB2, "ineb2": IneB2, "bb2": BB2,
    "pl2": PL2, "pl2plus": PL2Plus, "dlh": DLH, "dph": DPH, "lm": LM,
}


def get_scheme(name: str = "bm25", **params) -> WeightScheme:
    cls = _SCHEMES.get(name.lower())
    if cls is None:
        raise ValueError(f"unknown weight scheme {name!r}")
    return cls(**params)
