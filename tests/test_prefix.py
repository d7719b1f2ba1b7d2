"""Impact-prefix pruning (executor prefix mode): exactness certificate +
fallback must reproduce the exact path bit-for-bit on ranks.

Reference analog: maxweight pruning (matcher.cc:415, bm25weight.cc
get_maxpart) - the reference prunes with in-loop bound checks; here a
truncated impact-ordered read + device certificate + host exact re-run
give the same exact-top-k contract.
"""

import numpy as np

from xapiand_tpu.models.weights import CollectionStats, get_scheme
from xapiand_tpu.query.ir import Q
from xapiand_tpu.search import BatchSearcher, SegmentSearcher
from xapiand_tpu.utils.synth import build_synthetic_segment, sample_queries


def _irs(seg, queries):
    return [Q.or_terms(sorted(q, key=lambda t: -seg.terms[t].length))
            for q in queries]


def _doc_ranks(res):
    return [int(d) for d, s in zip(res["docids"], res["scores"])
            if np.isfinite(s)]


def test_impact_arrays_are_per_term_descending_permutations():
    seg = build_synthetic_segment(3000, 200, seed=3)
    scheme = get_scheme("bm25")
    stats = CollectionStats(doc_count=seg.doc_count,
                            avg_doclen=seg.avg_doclen, doclen_lower=1.0)
    imp_d, imp_w, imp_l = seg.impact_arrays(scheme, stats)
    g_main = scheme.impact_np(seg.post_wdf, seg.post_doclen, stats)
    g_imp = scheme.impact_np(imp_w, imp_l, stats)
    checked = 0
    for t, ti in seg.terms.items():
        o, ln = ti.offset, ti.length
        # same multiset of postings...
        a = sorted(zip(seg.post_docids[o:o + ln], seg.post_wdf[o:o + ln]))
        b = sorted(zip(imp_d[o:o + ln], imp_w[o:o + ln]))
        assert a == b, t
        # ...in descending-impact order (ties docid-ascending)
        gs = g_imp[o:o + ln]
        assert np.all(gs[:-1] >= gs[1:] - 1e-7), t
        ties = gs[:-1] == gs[1:]
        assert np.all(imp_d[o:o + ln][:-1][ties]
                      < imp_d[o:o + ln][1:][ties]), t
        # boundary value upper-bounds every deeper posting
        for P in (4, 16):
            if ln > P:
                assert gs[P] >= gs[P:].max() - 1e-7
                checked += 1
    assert checked  # the corpus actually exercised truncation depths
    _ = g_main  # (order source; equality is via the multiset check)


def test_prefix_rank_parity_zipf():
    """Zipf corpus: most queries certify; every rank must match exact."""
    seg = build_synthetic_segment(4000, 300, seed=3)
    assert max(ti.length for ti in seg.terms.values()) > 256
    queries = sample_queries(seg, 48, 3, seed=5)
    irs = _irs(seg, queries)
    s1 = SegmentSearcher(seg, get_scheme("bm25"))
    exact = BatchSearcher(s1, k=10).run(irs)
    bs = BatchSearcher(s1, k=10, prefix_cap=256)
    planned = bs.plan(irs)
    assert any(cfg.prefix and any(cfg.prefix) for cfg, _f, _b, _c in planned)
    pref = bs.run(irs)
    for qi, (e, p) in enumerate(zip(exact, pref)):
        assert _doc_ranks(e) == _doc_ranks(p), qi
        ke = min(len(_doc_ranks(e)), 10)
        np.testing.assert_allclose(np.asarray(p["scores"])[:ke],
                                   np.asarray(e["scores"])[:ke],
                                   rtol=1e-4)


def test_prefix_all_ties_falls_back_exact():
    """Uniform corpus (every posting the same weight): certificates must
    fail closed and the exact fallback must reproduce docid-tiebreak
    order."""
    seg = build_synthetic_segment(2000, 200, seed=1)
    n = seg.num_docs
    seg.post_wdf[:] = 1.0
    seg.doclen[:n] = 50.0
    seg.post_doclen[:] = 50.0
    seg.total_doclen = 50.0 * n
    queries = sample_queries(seg, 16, 3, seed=2, max_df_frac=1.0)
    irs = _irs(seg, queries)
    s1 = SegmentSearcher(seg, get_scheme("bm25"))
    exact = BatchSearcher(s1, k=10).run(irs)
    bs = BatchSearcher(s1, k=10, prefix_cap=128)
    planned = bs.plan(irs)
    # confirm truncation is active AND at least one launch is uncertified
    pref_groups = [(cfg, fn, b, c) for cfg, fn, b, c in planned
                   if cfg.prefix and any(cfg.prefix)]
    assert pref_groups
    import jax.numpy as jnp

    seg_arrays = s1.device_segment.arrays_pytree()
    stats_d = {"N": jnp.float32(seg.doc_count),
               "avg_doclen": jnp.float32(seg.avg_doclen),
               "doclen_lower": jnp.float32(1.0)}
    any_uncert = False
    for cfg, fn, b, _c in pref_groups:
        o = fn(seg_arrays, b, stats_d)
        any_uncert |= not bool(np.asarray(o["certified"]).all())
    assert any_uncert
    pref = bs.run(irs)
    for qi, (e, p) in enumerate(zip(exact, pref)):
        assert _doc_ranks(e) == _doc_ranks(p), qi


def test_prefix_short_query_in_truncated_group_certifies():
    """A query whose terms are all shorter than the cap but which lands in
    a truncated group (class unification) has zero unread mass -> it must
    certify and stay exact (U == 0 branch)."""
    seg = build_synthetic_segment(4000, 300, seed=7)
    lens = sorted(ti.length for ti in seg.terms.values())
    assert lens[-1] > 256
    queries = sample_queries(seg, 32, 3, seed=9)
    irs = _irs(seg, queries)
    s1 = SegmentSearcher(seg, get_scheme("bm25"))
    exact = BatchSearcher(s1, k=10).run(irs)
    pref = BatchSearcher(s1, k=10, prefix_cap=256).run(irs)
    for e, p in zip(exact, pref):
        assert _doc_ranks(e) == _doc_ranks(p)
