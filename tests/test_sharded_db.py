"""ShardedDatabase: full Database surface over mesh-sharded segments.

Exact-equality tests against the single-coordinator Database oracle (the
same bar as tests/test_sharded.py for ShardedIndex), plus persistence and
fallback behavior. Runs on the 8-virtual-device CPU mesh (conftest)."""

import random

import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.parallel.sharded_db import ShardedDatabase

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _corpus(n=80, seed=3):
    rng = random.Random(seed)
    return [{"body": " ".join(rng.choices(WORDS, k=8)),
             "price": rng.randint(1, 100),
             "cat": rng.choice(["a", "b", "c"])} for _ in range(n)]


@pytest.fixture(scope="module")
def pair():
    docs = _corpus()
    ref = Database()
    sdb = ShardedDatabase(n_shards=4)
    for i, doc in enumerate(docs):
        ref.index_document(dict(doc), doc_id=str(i))
        sdb.index_document(dict(doc), doc_id=str(i))
    ref.commit()
    sdb.commit()
    return ref, sdb


def test_mesh_is_active(pair):
    _, sdb = pair
    assert sdb.mesh is not None
    assert sdb.mesh.shape["shard"] == 4
    assert len(sdb._generations) == 1


def test_search_matches_single_node(pair):
    ref, sdb = pair
    for q in ({"body": "alpha"}, {"body": "alpha beta"},
              {"_and": [{"body": "gamma"}, {"body": "delta"}]},
              {"price": {"_from": 20, "_to": 70}},
              {"_match_all": {}}):
        r1 = ref.search(q, k=10)
        r2 = sdb.search(q, k=10)
        assert r2.total == r1.total, q
        assert [(h.id, round(h.score, 4)) for h in r2.hits] == \
            [(h.id, round(h.score, 4)) for h in r1.hits], q
    assert sdb._mesh_step_cache  # the SPMD path actually served these


def test_offset_pagination(pair):
    ref, sdb = pair
    full = [h.id for h in ref.search({"body": "alpha"}, k=20).hits]
    page = sdb.search({"body": "alpha"}, k=5, offset=5)
    assert [h.id for h in page.hits] == full[5:10]
    assert [h.rank for h in page.hits] == list(range(5, 10))


def test_aggs_match_single_node(pair):
    ref, sdb = pair
    aggs = {"avg_price": {"_avg": {"_field": "price"}},
            "stats": {"_stats": {"_field": "price"}},
            "cats": {"_terms": {"_field": "cat"}}}
    r1 = ref.search({"_match_all": {}}, k=0, aggs=aggs)
    r2 = sdb.search({"_match_all": {}}, k=0, aggs=aggs)
    assert r2.aggregations["avg_price"] == r1.aggregations["avg_price"]
    assert r2.aggregations["stats"] == r1.aggregations["stats"]
    c1 = {b["_key"]: b["_doc_count"] for b in r1.aggregations["cats"]}
    c2 = {b["_key"]: b["_doc_count"] for b in r2.aggregations["cats"]}
    assert c1 == c2


def test_sort_matches_single_node(pair):
    ref, sdb = pair
    sort = (("value", ref.schema.get_field("price").slot, True),)
    r1 = ref.search({"body": "beta"}, k=10, sort=sort)
    r2 = sdb.search({"body": "beta"}, k=10, sort=sort)
    assert [h.id for h in r2.hits] == [h.id for h in r1.hits]


def test_count_only(pair):
    ref, sdb = pair
    q = {"body": "sigma"}
    assert sdb.count(q) == ref.count(q)


def test_multi_generation_and_delete(pair):
    ref, sdb = pair
    extra = _corpus(30, seed=9)
    for i, doc in enumerate(extra):
        ref.index_document(dict(doc), doc_id=f"x{i}")
        sdb.index_document(dict(doc), doc_id=f"x{i}")
    ref.commit()
    sdb.commit()
    assert len(sdb._generations) == 2
    r1 = ref.search({"body": "alpha"}, k=15)
    r2 = sdb.search({"body": "alpha"}, k=15)
    assert r2.total == r1.total
    assert [h.id for h in r2.hits] == [h.id for h in r1.hits]
    # delete a matching doc from each generation; totals track the oracle
    victims = [r1.hits[0].id, next(h.id for h in r1.hits
                                   if h.id.startswith("x"))]
    for v in victims:
        ref.delete_document(v, commit=True)
        sdb.delete_document(v, commit=True)
    r1 = ref.search({"body": "alpha"}, k=15)
    r2 = sdb.search({"body": "alpha"}, k=15)
    assert r2.total == r1.total
    assert [h.id for h in r2.hits] == [h.id for h in r1.hits]


def test_mesh_fallback_features(pair):
    """Order-stat aggs ride the mesh; anything outside MESH_AGG_KINDS
    transparently falls back with identical results."""
    ref, sdb = pair
    slot = ref.schema.get_field("cat").slot
    r1 = ref.search({"body": "alpha"}, k=5, collapse_slot=slot)
    r2 = sdb.search({"body": "alpha"}, k=5, collapse_slot=slot)
    assert [h.id for h in r2.hits] == [h.id for h in r1.hits]
    aggs = {"pct": {"_percentiles": {"_field": "price"}}}
    r3 = ref.search({"_match_all": {}}, k=0, aggs=aggs)
    r4 = sdb.search({"_match_all": {}}, k=0, aggs=aggs)
    # order statistics ride the mesh now (psum'd fixed-grid histograms,
    # exact on integer data): sharded == single-node
    assert r4.aggregations == r3.aggregations
    med = {"m": {"_median": {"_field": "price"}},
           "mo": {"_mode": {"_field": "price"}}}
    r5 = ref.search({"_match_all": {}}, k=0, aggs=med)
    r6 = sdb.search({"_match_all": {}}, k=0, aggs=med)
    assert r6.aggregations == r5.aggregations


def test_persistence_roundtrip(tmp_path):
    path = str(tmp_path / "sdb")
    docs = _corpus(25, seed=5)
    db = ShardedDatabase(path=path, n_shards=4)
    for i, doc in enumerate(docs):
        db.index_document(doc, doc_id=str(i))
    db.commit()
    db.set_metadata("owner", "mesh-tests")
    before = db.search({"body": "alpha"}, k=10)
    db.close()

    db2 = ShardedDatabase(path=path, n_shards=4)
    assert db2.doc_count == 25
    assert db2.get_metadata("owner") == "mesh-tests"
    after = db2.search({"body": "alpha"}, k=10)
    assert after.total == before.total
    assert [h.id for h in after.hits] == [h.id for h in before.hits]
    db2.close()


def test_routing_parity_with_sharded_index():
    """Doc routing matches ShardedIndex (fnv1ah64 % n, handler.cc:2004)."""
    from xapiand_tpu.utils.hashing import fnv1ah64

    sdb = ShardedDatabase(n_shards=4)
    for did in ("1", "42", "user/7", "Ωmega"):
        assert sdb.route(did) == fnv1ah64("Q" + did) % 4


def test_compaction_rebuilds_one_generation():
    db = ShardedDatabase(n_shards=4)
    db.auto_merge_segments = 8  # 2 generations of 4 searchers
    for gen in range(3):
        for i in range(10):
            db.index_document({"body": f"word{i % 4} filler"},
                              doc_id=f"g{gen}d{i}")
        db.commit()
    assert len(db._searchers) <= 8
    r = db.search({"body": "word1"}, k=10)
    assert r.total > 0
    oracle = Database()
    for gen in range(3):
        for i in range(10):
            oracle.index_document({"body": f"word{i % 4} filler"},
                                  doc_id=f"g{gen}d{i}")
    oracle.commit()
    assert r.total == oracle.search({"body": "word1"}, k=10).total


def test_strmetric_sort_on_mesh(pair):
    """String-metric sort keys ride the mesh via one global category
    metric table + per-shard code remaps (round-1 raised here)."""
    from xapiand_tpu.query.dsl import parse_sort

    ref, sdb = pair
    sort = parse_sort(ref.schema, [{"cat": {"_order": "asc", "_value": "b",
                                            "_metric": "levenshtein"}}])
    r1 = ref.search({"body": "alpha"}, k=10, sort=sort)
    r2 = sdb.search({"body": "alpha"}, k=10, sort=sort)
    assert [h.id for h in r2.hits] == [h.id for h in r1.hits]
    assert sdb._mesh_step_cache  # served by the SPMD step, not fallback


def test_cardinality_matches_single_node(pair):
    # values repeat across shards: psum of exacts would say 12; the pmax-
    # merged HLL registers + [maxn, sum] clamp recover the true 3
    ref, sdb = pair
    aggs = {"c": {"_cardinality": {"_field": "cat"}}}
    r1 = ref.search({"_match_all": {}}, k=0, aggs=aggs)
    r2 = sdb.search({"_match_all": {}}, k=0, aggs=aggs)
    assert r1.aggregations["c"]["_cardinality"] == 3
    assert r2.aggregations["c"] == r1.aggregations["c"]


def test_generation_consolidation_data_merge():
    """Consolidation folds every generation into ONE via data merge (no
    re-analysis), keeps exact rank parity with the unsharded oracle incl.
    equal-score insertion-order tiebreaks, and bounds the per-query SPMD
    launch count regardless of commit history (VERDICT r2 weak #6)."""
    import random as _r
    rng = _r.Random(17)
    ref = Database()
    sdb = ShardedDatabase(n_shards=4)
    sdb.auto_merge_segments = 8      # consolidate when >2 generations
    n = 0
    for batch in range(6):
        for _ in range(15):
            # half the docs share an identical body: equal BM25 scores,
            # rank decided purely by global insertion order
            if n % 2:
                doc = {"body": "alpha beta tie", "price": n % 7}
            else:
                doc = {"body": " ".join(rng.choices(WORDS, k=6)),
                       "price": rng.randint(1, 50)}
            ref.index_document(dict(doc), doc_id=str(n))
            sdb.index_document(dict(doc), doc_id=str(n))
            n += 1
        ref.commit()
        sdb.commit()
    # 6 commits -> generations bounded by the consolidation trigger
    assert len(sdb._generations) <= 2
    calls = []
    from xapiand_tpu.parallel import sharded as _sh
    orig = _sh.MeshExecutor.run

    def counting_run(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    _sh.MeshExecutor.run = counting_run
    try:
        r2 = sdb.search({"body": "alpha"}, k=40)
    finally:
        _sh.MeshExecutor.run = orig
    assert len(calls) == len(sdb._generations) <= 2
    r1 = ref.search({"body": "alpha"}, k=40)
    assert r2.total == r1.total
    assert [(h.id, round(h.score, 4)) for h in r2.hits] == \
        [(h.id, round(h.score, 4)) for h in r1.hits]
    # schema.index must not run during consolidation: force one more
    seen = []
    orig_index = sdb.schema.index
    sdb.schema.index = lambda *a, **k: (seen.append(1),
                                        orig_index(*a, **k))[1]
    sdb._compact_tier()
    sdb.schema.index = orig_index
    assert not seen
    assert len(sdb._generations) == 1
    r3 = sdb.search({"body": "alpha"}, k=40)
    assert [(h.id, round(h.score, 4)) for h in r3.hits] == \
        [(h.id, round(h.score, 4)) for h in r1.hits]
    # deletes survive consolidation; post-compaction stats drop dead rows
    # (same semantic as the reference's compact), so compare against a
    # compacted oracle by id set
    gone = [r1.hits[0].id, r1.hits[3].id, "2"]
    for g in gone:
        ref.delete_document(g, missing_ok=True)
        sdb.delete_document(g, missing_ok=True)
    ref.commit()
    sdb.commit()
    sdb._compact_tier()
    assert len(sdb._generations) == 1
    r4 = sdb.search({"body": "alpha"}, k=60)
    r5 = ref.search({"body": "alpha"}, k=60)
    assert r4.total == r5.total
    assert sorted(h.id for h in r4.hits) == sorted(h.id for h in r5.hits)
    assert not set(gone) & {h.id for h in r4.hits}


def test_collapse_on_mesh(pair):
    """_collapse rides the mesh as two-level collapse: per-shard collapse
    inside the SPMD step + host re-collapse of the full gathered union
    (collapser.cc + handler.cc:1543-1549). Exact parity vs unsharded."""
    from xapiand_tpu.parallel import sharded as _sh

    ref, sdb = pair
    slot = ref.schema.get_field("cat").slot
    calls = []
    orig = _sh.MeshExecutor.run

    def spy(self, *a, **k):
        calls.append(k.get("collapse_slot"))
        return orig(self, *a, **k)

    _sh.MeshExecutor.run = spy
    try:
        for cmax in (1, 2):
            for q in ({"body": "alpha"}, {"_match_all": {}},
                      {"_or": [{"body": "beta"}, {"body": "gamma"}]}):
                r1 = ref.search(q, k=8, collapse_slot=slot,
                                collapse_max=cmax)
                r2 = sdb.search(q, k=8, collapse_slot=slot,
                                collapse_max=cmax)
                assert r2.total == r1.total, (q, cmax)
                assert [(h.id, round(h.score, 4)) for h in r2.hits] == \
                    [(h.id, round(h.score, 4)) for h in r1.hits], (q, cmax)
    finally:
        _sh.MeshExecutor.run = orig
    assert calls and all(c == slot for c in calls)


def test_scripted_metric_match_phase_on_mesh(pair):
    """_scripted_metric folds host-side, but its candidate match phase and
    any sibling device aggs ride the mesh (no more silent full fallback)."""
    from xapiand_tpu.parallel import sharded as _sh

    ref, sdb = pair
    aggs = {"tot": {"_scripted_metric": {
                "_init": {"t": 0, "n": 0},
                "_map": "state['t'] += doc.get('price', 0)\n"
                        "state['n'] += 1",
                "_reduce": "result = state['t'] / max(state['n'], 1)"}},
            "mx": {"_max": {"_field": "price"}}}
    calls = []
    orig = _sh.MeshExecutor.run

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    _sh.MeshExecutor.run = spy
    try:
        r1 = ref.search({"body": "alpha"}, k=5, aggs=dict(aggs))
        r2 = sdb.search({"body": "alpha"}, k=5, aggs=dict(aggs))
    finally:
        _sh.MeshExecutor.run = orig
    assert calls, "mesh step was never used for the scripted-metric query"
    assert r2.aggregations["tot"] == r1.aggregations["tot"]
    assert r2.aggregations["mx"] == r1.aggregations["mx"]
    assert [h.id for h in r2.hits] == [h.id for h in r1.hits]


def test_geo_filter_rides_the_mesh():
    """Geo leaves previously crashed the SPMD step (geo_queries never
    made it through shard_map); now the query's HTM ranges travel as
    replicated plan arrays and sharded == unsharded exactly."""
    from xapiand_tpu.database import Database
    from xapiand_tpu.parallel.sharded_db import ShardedDatabase

    docs = [
        ("1", {"area": {"_convex": {"_latitude": [40.0, 40.2],
                                    "_longitude": [-100.0, -100.0],
                                    "_radius": 150000}}}),
        ("2", {"area": {"_ewkt": "POINT(30 -10)"}}),
        ("3", {"area": {"_point": {"_latitude": 40.1,
                                   "_longitude": -100.0}}}),
        ("4", {"area": {"_circle": {"_latitude": 40.15,
                                    "_longitude": -100.05,
                                    "_radius": 20000}}}),
    ]
    sdb = ShardedDatabase(n_shards=2)
    pdb = Database()
    for did, d in docs:
        sdb.index_document(dict(d), doc_id=did)
        pdb.index_document(dict(d), doc_id=did)
    sdb.commit()
    pdb.commit()
    for q in (
        {"area": {"_circle": {"_lat": 40.1, "_lon": -100.0,
                              "_radius": 50000}}},
        {"area": {"_point": {"_latitude": -10.0, "_longitude": 30.0}}},
    ):
        a = pdb.search(q, k=10)
        b = sdb.search(q, k=10)
        assert b.total == a.total, q
        assert sorted(h.id for h in b.hits) == \
            sorted(h.id for h in a.hits), q


def test_operator_classes_match_unsharded():
    """Mesh-vs-plain equality sweep across operator families (phrase,
    near, fuzzy, synonym, elite-set, wildcard, and_maybe, max) - guards
    against mesh-only plan-threading holes like the geo one."""
    import random

    from xapiand_tpu.database import Database
    from xapiand_tpu.parallel.sharded_db import ShardedDatabase

    rng = random.Random(5)
    words = [f"w{i}" for i in range(40)]
    docs = [(str(i), {"body": " ".join(rng.choices(words, k=15))})
            for i in range(120)]
    sdb = ShardedDatabase(n_shards=2)
    pdb = Database()
    for did, d in docs:
        sdb.index_document(dict(d), doc_id=did)
        pdb.index_document(dict(d), doc_id=did)
    sdb.commit()
    pdb.commit()
    pair = docs[7][1]["body"].split()[:2]
    queries = [
        {"body": {"_phrase": f"{pair[0]} {pair[1]}"}},
        {"body": {"_near": f"{pair[0]} {pair[1]}", "_window": 5}},
        {"body": {"_edit_distance": "w1x", "_edits": 2}},
        {"body": {"_synonym": "w1 w2"}},
        {"body": {"_elite_set": "w1 w2 w3 w4 w5", "_n": 3}},
        {"body": {"_wildcard": "w1"}},
        {"_and_maybe": [{"body": "w1"}, {"body": "w2"}]},
        {"_max": [{"body": "w1"}, {"body": "w2"}]},
    ]
    for q in queries:
        a = pdb.search(q, k=10)
        b = sdb.search(q, k=10)
        assert b.total == a.total, q
        assert [h.id for h in b.hits] == [h.id for h in a.hits], q
