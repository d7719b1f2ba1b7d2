"""Mixed-shape batch search: the library owns query-shape bucketing.

Round-1 gap: ShardedIndex.search_batch raised on heterogeneous query
shapes and the benchmark hand-rolled its grouping. Now BatchSearcher
(single chip) and ShardedIndex.search_batch (mesh) bucket by plan
signature / size class and results are exact vs per-query execution.
"""

import numpy as np
import pytest

from test_engine import make_docs

from xapiand_tpu.database import Database
from xapiand_tpu.models.weights import CollectionStats, get_scheme
from xapiand_tpu.parallel import ShardedIndex, make_mesh
from xapiand_tpu.query.ir import Q
from xapiand_tpu.search import BatchSearcher, SegmentSearcher
from xapiand_tpu.utils.synth import build_synthetic_segment, sample_queries


@pytest.fixture(scope="module")
def seg():
    return build_synthetic_segment(4000, 3000, seed=2)


def test_batch_searcher_mixed_shapes_exact(seg):
    searcher = SegmentSearcher(seg, get_scheme("bm25"))
    bs = BatchSearcher(searcher, k=10, max_batch=32, min_batch=8)
    irs = [Q.or_terms(q) for q in sample_queries(seg, 10, 3, seed=1)] + \
          [Q.or_terms(q) for q in sample_queries(seg, 6, 2, seed=2)] + \
          [Q.or_terms(q) for q in sample_queries(seg, 3, 5, seed=3)]
    res = bs.run(irs)
    assert len(res) == len(irs) and all(r is not None for r in res)

    from xapiand_tpu.query.plan import bind, compile_ir

    stats = CollectionStats(doc_count=seg.doc_count,
                            avg_doclen=seg.avg_doclen, doclen_lower=1.0)
    stats_d = {"N": float(stats.doc_count),
               "avg_doclen": float(stats.avg_doclen), "doclen_lower": 1.0}
    for qi, ir in enumerate(irs):
        o = searcher.execute(
            bind(compile_ir(ir), seg, searcher.scheme, stats, k=10),
            stats_d)
        exp = [(int(d), round(float(s), 4))
               for d, s in zip(o["docids"], o["scores"]) if np.isfinite(s)]
        got = [(int(d), round(float(s), 4))
               for d, s in zip(res[qi]["docids"], res[qi]["scores"])
               if np.isfinite(s)]
        assert got == exp, qi
        assert res[qi]["count"] == int(o["count"])


def test_batch_searcher_equal_work_widths(seg):
    """Groups with wider unified sort shapes get narrower batch widths
    (bounded per-launch work -> bounded tail latency)."""
    searcher = SegmentSearcher(seg, get_scheme("bm25"))
    bs = BatchSearcher(searcher, k=10, max_batch=64, min_batch=8,
                       work_ratio=1.0)
    irs = [Q.or_terms(q) for q in sample_queries(seg, 60, 3, seed=4)]
    planned = bs.plan(irs)
    widths = {}
    for cfg_g, _fn, batch, _chunk in planned:
        widths[sum(cfg_g.classes)] = batch["offsets"].shape[0]
    if len(widths) > 1:
        works = sorted(widths)
        assert widths[works[0]] >= widths[works[-1]]
    # every query answered exactly once
    seen = set()
    for _cfg, _fn, _b, chunk in planned:
        seen.update(chunk)
    assert seen == set(range(len(irs)))


def test_sharded_mixed_shape_batch(eight_devices):
    mesh = make_mesh(n_shards=4, n_dp=2, devices=eight_devices)
    idx = ShardedIndex(mesh=mesh)
    for i, doc in enumerate(make_docs(150)):
        idx.index_document(doc, doc_id=str(i))
    idx.commit()
    single = Database()
    for i, doc in enumerate(make_docs(150)):
        single.index_document(doc, doc_id=str(i))
    single.commit()

    # 1-term, 2-term and ranged queries in ONE batch (different signatures)
    queries = [{"body": "fox"}, {"body": "quick brown"}, {"body": "dog"},
               {"body": "fox", "price": {"_from": 100, "_to": 800}},
               {"body": "river cat"}]
    outs = idx.search_batch(queries, k=8)
    assert len(outs) == len(queries)
    for q, got in zip(queries, outs):
        ref = single.search(q, k=8)
        assert got["total"] == ref.total, q
        assert [h["id"] for h in got["hits"]] == [h.id for h in ref.hits], q


def test_batch_with_shared_sort_and_aggs():
    """BatchSearcher binds a shared sort + aggregations into every query
    (faceted-serving pattern, BASELINE config 3)."""
    import numpy as np

    from xapiand_tpu import aggregations as aggs_mod
    from xapiand_tpu.database import Database
    from xapiand_tpu.query.dsl import QueryDSL, parse_sort
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher

    db = Database()
    docs = [{"body": f"w{i % 3} common", "cat": f"c{i % 2}",
             "price": float(100 - i)} for i in range(30)]
    for i, d in enumerate(docs):
        db.index_document(dict(d), doc_id=str(i))
    db.commit()
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    irs = [dsl.parse({"body": "common"}), dsl.parse({"body": "w1"})]
    sort = parse_sort(db.schema, [{"price": {"_order": "desc"}}])
    _, specs, arrays, _ = aggs_mod.compile_for_segment(
        db.schema, seg, {"cats": {"_terms": {"_field": "cat"}},
                         "st": {"_stats": {"_field": "price"}}})
    bs = BatchSearcher(SegmentSearcher(seg, db.scheme), k=5, sort=sort,
                       aggs=(specs, arrays))
    res = bs.run(irs)
    # query 0 matches all 30; top-5 by price desc = docids 0..4
    assert res[0]["count"] == 30
    assert [int(d) for d in res[0]["docids"][:5]] == [0, 1, 2, 3, 4]
    st = res[0]["aggs"][1]
    assert int(st["n"]) == 30
    assert float(st["s"]) == sum(d["price"] for d in docs)
    # query 1 matches docs with w1: i % 3 == 1 -> 10 docs
    assert res[1]["count"] == 10
    counts1 = np.asarray(res[1]["aggs"][0])
    assert int(counts1.sum()) == 10


def test_chunked_docid_range_exact():
    """Docid-range-chunked execution (BatchSearcher._chunkify /
    executor._execute_chunked) is bit-exact vs the unchunked pipeline,
    including score ties (docid-asc) and deleted docs. Needs a segment
    large enough that the 128-lane chunk-width floor doesn't trip the
    skew guard (on tiny corpora _chunkify correctly declines)."""
    seg2 = build_synthetic_segment(30000, 2000, seed=9)
    seg2.deleted[5:2000:7] = True
    searcher = SegmentSearcher(seg2, get_scheme("bm25"))
    irs = [Q.or_terms(sorted(q, key=lambda t: -seg2.terms[t].length))
           for q in sample_queries(seg2, 24, 3, seed=5)]
    ref = BatchSearcher(searcher, k=10, chunk_rows=0).run(irs)
    bs = BatchSearcher(searcher, k=10, chunk_rows=500)
    assert any(cfg.n_chunks > 1 for cfg, _fn, _b, _c in bs.plan(irs)), \
        "chunking never engaged - test is vacuous"
    got = bs.run(irs)
    for a, b in zip(ref, got):
        assert a["count"] == b["count"]
        assert [int(d) for d in a["docids"]] == [int(d) for d in b["docids"]]
        av, bv = np.asarray(a["scores"]), np.asarray(b["scores"])
        fin = np.isfinite(av)
        assert (fin == np.isfinite(bv)).all()
        assert np.allclose(av[fin], bv[fin], rtol=1e-5)


def test_variable_conjunct_sizes_batch_parity():
    """Compaction caps with VARIABLE-size or_terms conjuncts: req_groups
    positions differ per query within one signature bucket, so group caps
    must take each member's own bound (group_compact_cap / the len
    tightening) - a first-member-positions cap silently truncated true
    matches (caught by the config-4 geo oracle)."""
    import random

    from xapiand_tpu.database import Database
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    weights = [1 / (i + 1) for i in range(40)]
    db = Database()
    for i in range(8000):
        db.index_document({
            "body": " ".join(rng.choices(vocab, weights=weights, k=8)),
            "price": rng.randint(1, 1000),
        }, doc_id=str(i))
    db.commit()
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    qs = []
    for _ in range(16):
        n = rng.choice([2, 5, 9, 14])   # variable conjunct sizes
        terms = rng.sample(vocab, n)
        qs.append({"_and": [{"_or": [{"body": t} for t in terms]},
                            {"price": {"_from": 100, "_to": 600}}]})
    irs = [dsl.parse(q) for q in qs]
    bs = BatchSearcher(SegmentSearcher(seg, db.scheme), k=10)
    res = bs.run(irs)
    for qi, q in enumerate(qs):
        single = db.search(q, k=10)
        assert res[qi]["count"] == single.total, (qi, q)
        got = [int(d) for d, s in zip(res[qi]["docids"], res[qi]["scores"])
               if s != float("-inf")]
        assert got == [int(h.id) for h in single.hits], qi


def test_fullwidth_ab_parity_with_tie_plateaus(monkeypatch):
    """ADVICE r3: XT_FULLWIDTH on/off must produce identical ranked
    output, including deliberate sort-key tie plateaus that straddle the
    k+window boundary (certificate failure -> uncertified -> exact
    re-run)."""
    from xapiand_tpu.query.dsl import QueryDSL, parse_sort

    rng = np.random.default_rng(9)
    db = Database()
    # a value column with HUGE tie plateaus: only 3 distinct prices over
    # 600 docs, so any top-k window boundary lands inside a plateau
    for i in range(600):
        db.index_document({"body": "common w" + str(int(rng.integers(6))),
                           "price": int(rng.integers(3))}, doc_id=str(i))
    db.commit()
    seg = db._searchers[0].segment
    sort = parse_sort(db.schema, [{"price": {"_order": "desc"}}])
    dsl = QueryDSL(db.schema)
    irs = [dsl.parse({"body": f"common w{i % 6}"}) for i in range(12)]

    def run(flag):
        monkeypatch.setenv("XT_FULLWIDTH", flag)
        bs = BatchSearcher(SegmentSearcher(seg, db.scheme), k=8,
                           sort=sort, min_batch=4)
        return bs.run(irs)

    on, off = run("1"), run("0")
    for qi, (a, b) in enumerate(zip(on, off)):
        assert a["count"] == b["count"], qi
        da = [int(d) for d, s in zip(a["docids"], a["scores"])
              if np.isfinite(s)]
        dbb = [int(d) for d, s in zip(b["docids"], b["scores"])
               if np.isfinite(s)]
        assert da == dbb, (qi, da, dbb)


def test_fullwidth_uncertified_rerun_path(monkeypatch):
    """The certificate-failure path itself: plateaus at the window edge
    force uncertified rows, and run() must fall back to the exact path
    (asserted by instrumenting the fallback plan call)."""
    from xapiand_tpu.query.dsl import QueryDSL, parse_sort

    db = Database()
    for i in range(400):
        db.index_document({"body": "t", "price": 1}, doc_id=str(i))
    db.commit()
    seg = db._searchers[0].segment
    sort = parse_sort(db.schema, [{"price": {"_order": "asc"}}])
    monkeypatch.setenv("XT_FULLWIDTH", "1")
    bs = BatchSearcher(SegmentSearcher(seg, db.scheme), k=5,
                       sort=sort, min_batch=4)
    ir = QueryDSL(db.schema).parse({"body": "t"})
    planned = bs.plan([ir])
    if not any(cfg.fullwidth for cfg, _, _, _ in planned):
        pytest.skip("shape not fullwidth-eligible on this build")
    res = bs.run([ir])[0]
    # every price equal -> the window certificate cannot separate rank
    # k from k+1, so the result must have come from the exact re-run
    # and STILL be exact: ties order docid-ascending
    docids = [int(d) for d, s in zip(res["docids"], res["scores"])
              if np.isfinite(s)]
    assert docids == sorted(docids) == list(range(5))
    assert res["count"] == 400
