"""Ranking weight schemes: host-side per-term constants + device per-posting
formulas.

Reference parity target: src/xapian/weight/ (bm25weight.cc, tfidfweight.cc,
tradweight.cc, boolweight.cc, coordweight.cc, bm25plusweight.cc). Each scheme
splits as the reference does: ``init()`` computes a per-term constant from
collection statistics host-side; ``get_sumpart(wdf, doclen)`` is evaluated
per posting - here vectorised on the VPU over [T, L] posting blocks.

Global statistics (collection_size N, average length, per-term termfreq)
come from the *whole index* across shards (the two-phase
prepare_mset/add_prepared_mset stat merge of the reference,
src/database/handler.cc:1532-1538, happens at plan time on host because the
coordinator's term dictionary already aggregates per-shard lens).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class CollectionStats:
    doc_count: int          # N
    avg_doclen: float       # collection average document length
    doclen_lower: float = 1.0
    query_length: int = 1


class WeightScheme:
    """Base: subclasses define term_constant() and sumpart()."""

    name = "base"

    def term_constant(self, stats: CollectionStats, termfreq: int,
                      wqf: int = 1, factor: float = 1.0) -> float:
        raise NotImplementedError

    def sumpart(self, wdf, doclen, tconst, stats: CollectionStats):
        """Vectorised device formula: [T, L] wdf/doclen, [T, 1] tconst."""
        raise NotImplementedError

    def max_sumpart(self, tconst: float, max_wdf: float,
                    stats: CollectionStats) -> float:
        """Upper bound (block-max pruning analog, bm25weight.cc:184)."""
        return abs(tconst) * 1e9

    def key(self) -> str:
        return self.name


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

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0):
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

    def sumpart(self, wdf, doclen, tconst, stats):
        # bm25weight.cc:171-181
        lf = self._len_factor(stats)
        normlen = jnp.maximum(doclen * lf, self.min_normlen)
        denom = self.k1 * (normlen * self.b + (1.0 - self.b)) + wdf
        return tconst * (wdf / jnp.maximum(denom, 1e-9))

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

    def sumpart(self, wdf, doclen, tconst, stats):
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

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0):
        n = max(int(termfreq), 1)
        return math.log(stats.doc_count / n) * factor * wqf

    def sumpart(self, wdf, doclen, tconst, stats):
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

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0):
        n = max(int(termfreq), 0)
        tw = (stats.doc_count - n + 0.5) / (n + 0.5)
        if tw < 2.0:
            tw = tw * 0.5 + 1.0
        return math.log(tw) * factor

    def sumpart(self, wdf, doclen, tconst, stats):
        if self.k == 0:
            return tconst * jnp.ones_like(wdf)
        normlen = doclen / jnp.maximum(stats.avg_doclen, 1e-9)
        denom = self.k * normlen + wdf
        return tconst * (wdf / jnp.maximum(denom, 1e-9))


class Bool(WeightScheme):
    """Xapian::BoolWeight: all weights zero."""

    name = "bool"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0):
        return 0.0

    def sumpart(self, wdf, doclen, tconst, stats):
        return jnp.zeros_like(wdf)

    def max_sumpart(self, tconst, max_wdf, stats):
        return 0.0


class Coord(WeightScheme):
    """Xapian::CoordWeight: 1 per matching term."""

    name = "coord"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0):
        return factor

    def sumpart(self, wdf, doclen, tconst, stats):
        return tconst * jnp.ones_like(wdf)

    def max_sumpart(self, tconst, max_wdf, stats):
        return tconst


class DLH(WeightScheme):
    """Xapian::DLHWeight (DFR, dlhweight.cc) - parameter-free.

    sumpart = (wdf*log2(wdf*avg_len/(doclen*F/N)) +
               (doclen-wdf)*log2(1-wdf/doclen) + 0.5*log2(2*pi*wdf*(1-wdf/doclen)))
              / (wdf + 0.5) * factor
    Requires collection frequency F; we pass it via term_constant as F/N.
    """

    name = "dlh"

    def term_constant(self, stats, termfreq, wqf=1, factor=1.0,
                      collfreq: int | None = None):
        F = collfreq if collfreq is not None else termfreq
        return (max(F, 1) / max(stats.doc_count, 1))  # F/N, factor folded below

    def sumpart(self, wdf, doclen, tconst, stats):
        wdf = jnp.maximum(wdf, 1e-9)
        doclen = jnp.maximum(doclen, wdf + 1e-6)
        f = wdf / doclen
        log2 = math.log(2.0)
        part = (wdf * jnp.log(wdf * stats.avg_doclen / (doclen * tconst)) / log2
                + (doclen - wdf) * jnp.log1p(-f) / log2
                + 0.5 * jnp.log(2 * math.pi * wdf * (1 - f)) / log2)
        return jnp.maximum(part, 0.0) / (wdf + 0.5)


_SCHEMES = {
    "bm25": BM25, "bm25plus": BM25Plus, "tfidf": TfIdf, "trad": Trad,
    "bool": Bool, "coord": Coord, "dlh": DLH,
}


def get_scheme(name: str = "bm25", **params) -> WeightScheme:
    cls = _SCHEMES.get(name.lower())
    if cls is None:
        raise ValueError(f"unknown weight scheme {name!r}")
    return cls(**params)
