"""Weight scheme parity: every registered scheme vs an independent numpy
oracle implementing the reference formulas (src/xapian/weight/*.cc).

The oracle recomputes each scheme's per-posting weight directly from the
formula definitions (not via the engine's WeightScheme classes), so these
tests catch plumbing errors (multi-constant term arrays, collfreq routing,
uniqterms gathers) as well as formula transcription errors.
"""

import math

import numpy as np
import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.models.weights import _SCHEMES, get_scheme

DOCS = [
    {"body": "the quick brown fox jumps over the lazy dog"},
    {"body": "the quick red fox runs fast over hills and the river"},
    {"body": "lazy summer days drift by the quiet river bank"},
    {"body": "quick thinking saves the day when the fox is quick"},
    {"body": "dogs and foxes are both canids of the wild wood"},
    {"body": "a slow brown bear sleeps in the deep dark wood"},
]


@pytest.fixture(scope="module")
def wdb():
    db = Database()
    for i, d in enumerate(DOCS):
        db.index_document(dict(d), doc_id=f"d{i}")
    db.commit()
    return db


def corpus_stats(db):
    seg = db._searchers[0].segment
    nd = seg.num_docs
    doclen = seg.doclen[:nd].astype(np.float64)
    total = float(doclen.sum())
    return seg, nd, doclen, total, total / nd, float(doclen.max())


def postings(seg, term):
    ti = seg.get_term(term)
    if ti is None:
        return np.zeros(0, np.int32), np.zeros(0, np.float64), 0, 0
    ids = seg.post_docids[ti.offset: ti.offset + ti.length]
    wdf = seg.post_wdf[ti.offset: ti.offset + ti.length].astype(np.float64)
    return ids, wdf, ti.length, ti.collfreq


def oracle_scores(db, terms, scheme_name):
    """Per-doc total score from the raw reference formulas."""
    seg, nd, doclen, total_len, avg, dl_upper = corpus_stats(db)
    N = nd
    scores = np.zeros(nd)
    uniq = seg.uniqterms[:nd].astype(np.float64)
    qlen = len(terms)
    LN2 = math.log(2.0)

    def wdfn(w, ln, c=1.0):
        return w * np.log2(1 + c * avg / ln)

    for term in terms:
        ids, wdf, n, F = postings(seg, term)
        if n == 0:
            continue
        ln = doclen[ids]
        if scheme_name in ("bm25", "bm25plus"):
            tw = (N - n + 0.5) / (n + 0.5)
            if tw < 2.0:
                tw = tw * 0.5 + 1.0
            t = math.log(tw) * 2.0 / 2.0 * 2.0  # k3 term (wqf=1) * (k1+1)
            normlen = np.maximum(ln / avg, 0.5)
            w = t * wdf / (1.0 * (normlen * 0.5 + 0.5) + wdf)
            if scheme_name == "bm25plus":
                w += t * 1.0 / 2.0
        elif scheme_name == "tfidf":
            w = wdf * math.log(N / n)
        elif scheme_name == "trad":
            tw = (N - n + 0.5) / (n + 0.5)
            if tw < 2.0:
                tw = tw * 0.5 + 1.0
            w = math.log(tw) * wdf / (ln / avg + wdf)
        elif scheme_name == "bool":
            w = np.zeros_like(wdf)
        elif scheme_name == "coord":
            w = np.ones_like(wdf)
        elif scheme_name == "dicecoeff":
            w = 2.0 / (qlen + uniq[ids])
        elif scheme_name == "inl2":
            idf = math.log2((N + 1) / (n + 0.5))
            x = wdfn(wdf, ln)
            w = idf * x / (x + 1)
        elif scheme_name == "ifb2":
            idf = math.log2((N + 1) / (F + 0.5))
            x = wdfn(wdf, ln)
            w = idf * x * (F + 1.0) / (n * (x + 1))
        elif scheme_name == "ineb2":
            ne = N * (1 - math.exp(-F / N))
            idf = math.log2((N + 1) / (ne + 0.5))
            x = wdfn(wdf, ln)
            w = idf * x * (F + 1.0) / (n * (x + 1))
        elif scheme_name == "bb2":
            x = np.minimum(wdfn(wdf, ln), F - 1.0)
            NN = max(N, 2)
            wt = -1.0 / LN2 - math.log2(NN - 1.0)
            sc1 = math.log2(NN + F - 1.0)
            sc2 = math.log2(F)
            y2 = F - x
            y1 = (NN - 2.0) + y2

            def stir(d, y, c):
                return (y + 0.5) * (c - np.log2(np.maximum(y, 1e-9))) + d * c
            stirling = stir(x + 1.0, y1, sc1) - stir(x, y2, sc2)
            w = (F + 1.0) / n / (x + 1.0) * (wt + stirling)
            w = np.maximum(w, 0.0)
        elif scheme_name in ("pl2", "pl2plus"):
            mean = F / N
            P1 = mean / LN2 + 0.5 * math.log2(2 * math.pi)
            P2 = math.log2(mean) + 1.0 / LN2
            x = wdfn(wdf, ln)
            P = P1 + (x + 0.5) * np.log2(np.maximum(x, 1e-9)) - P2 * x
            if scheme_name == "pl2":
                w = np.where(P > 0, P / (x + 1.0), 0.0)
            else:
                delta = 0.8
                dP = P1 + (delta + 0.5) * math.log2(delta) - P2 * delta
                dw = dP / (delta + 1.0)
                wt = P / (x + 1.0) + dw
                w = np.where((wt > 0) & (mean >= 1.0), wt, 0.0)
        elif scheme_name == "dlh":
            log_const = avg * N / F
            f = wdf / ln
            omf = 1 - f
            wt = (wdf * np.log2(f * log_const) + (ln - wdf) * np.log2(omf)
                  + 0.5 * np.log2(2 * math.pi * wdf * omf))
            w = np.where((wt > 0) & (wdf < ln), wt / (wdf + 0.5), 0.0)
        elif scheme_name == "dph":
            log_const = avg * N / F
            f = wdf / ln
            omf = 1 - f
            norm = omf * omf / (wdf + 1.0)
            wt = norm * (wdf * np.log2(f * log_const)
                         + 0.5 * np.log2(2 * math.pi * wdf * omf))
            w = np.where((wt > 0) & (wdf < ln), wt, 0.0)
        elif scheme_name == "lm":
            wc = F / total_len
            s1, s2 = 0.7, 2000.0
            ws = (1 - s1) * (wdf + s2 * wc) / (ln + s2) + s1 * wc
            product = ws * dl_upper
            w = np.where(product > 1.0, np.log(np.maximum(product, 1.0)), 0.0)
        else:
            raise AssertionError(f"no oracle for {scheme_name}")
        np.add.at(scores, ids, w)
    return scores


QUERY_WORDS = ["quick", "fox", "river"]


@pytest.mark.parametrize("name", sorted(_SCHEMES))
def test_scheme_matches_oracle(wdb, name):
    # resolve terms exactly as the engine's query compiler does (it may
    # pick stemmed Z-terms), so the oracle scores the same posting lists
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.query.plan import compile_ir

    seg = wdb._searchers[0].segment
    ir = QueryDSL(wdb.schema).parse(
        {"_or": [{"body": w} for w in QUERY_WORDS]})
    resolved = [pt.term for pt in compile_ir(ir).terms]
    assert len(resolved) == len(QUERY_WORDS)

    expected = oracle_scores(wdb, resolved, name)
    q = {"_or": [{"body": w} for w in QUERY_WORDS]}
    res = wdb.search(q, k=6, scheme=name)
    got = {h.id: h.score for h in res.hits}

    nd = seg.num_docs
    exp = {f"d{i}": expected[i] for i in range(nd) if expected[i] > 0}
    if name == "bool":
        # everything scores 0; just require the match set to be right
        assert res.total == int((expected >= 0).sum()) or res.total > 0
        return
    for did, sc in got.items():
        assert sc == pytest.approx(exp.get(did, 0.0), rel=2e-3, abs=2e-3), \
            f"{name}: doc {did} engine={sc} oracle={exp.get(did)}"
    # ranking order must match the oracle's up to score ties
    exp_rank = sorted(exp, key=lambda d: (-exp[d], d))
    got_rank = [h.id for h in res.hits if h.score > 1e-9]
    want_rank = [d for d in exp_rank if exp[d] > 1e-9][:len(got_rank)]
    for g, w in zip(got_rank, want_rank):
        assert g == w or exp[g] == pytest.approx(exp[w], rel=1e-4), \
            f"{name}: rank mismatch {got_rank} vs {want_rank}"


def test_scheme_registry_complete():
    # the reference registers 16 schemes (src/xapian/weight/)
    for name in ("bm25", "bm25plus", "tfidf", "trad", "bool", "coord",
                 "dicecoeff", "inl2", "ifb2", "ineb2", "bb2", "pl2",
                 "pl2plus", "dlh", "dph", "lm"):
        assert get_scheme(name) is not None


def test_lm_smoothing_variants(wdb):
    for sm in ("jelinek_mercer", "dirichlet", "dirichlet_plus",
               "absolute_discount", "two_stage"):
        res = wdb.search({"body": "quick"}, k=6,
                         scheme=get_scheme("lm", smoothing=sm))
        assert res.total >= 1
        assert all(np.isfinite(h.score) for h in res.hits)
