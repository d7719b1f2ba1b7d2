"""Mesh-plane tests: 8 virtual CPU devices, (dp=2, shard=4) mesh.

Validates the SPMD scatter-gather against the single-segment engine:
same global stats -> identical scores -> identical ranking (the
two-phase-match exactness requirement, SURVEY.md §2.4)."""

import numpy as np
import pytest

from test_engine import make_docs

from xapiand_tpu.database import Database
from xapiand_tpu.parallel import ShardedIndex, make_mesh


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh(n_shards=4, n_dp=2, devices=eight_devices)


@pytest.fixture(scope="module")
def sharded(mesh):
    idx = ShardedIndex(mesh=mesh)
    for i, doc in enumerate(make_docs(200)):
        idx.index_document(doc, doc_id=str(i))
    idx.commit()
    return idx


@pytest.fixture(scope="module")
def single():
    db = Database()
    for i, doc in enumerate(make_docs(200)):
        db.index_document(doc, doc_id=str(i))
    db.commit()
    return db


def test_routing_parity(sharded):
    # fnv1ah64("Q7") % 4 must route deterministically
    from xapiand_tpu.utils.hashing import fnv1ah64

    assert sharded.route("7") == fnv1ah64("Q7") % 4


def test_sharded_matches_single(sharded, single):
    for q in ({"body": "fox"}, {"body": "search engine"},
              {"body": "quick brown dog"}):
        got = sharded.search(q, k=10)
        ref = single.search(q, k=10)
        assert got["total"] == ref.total, q
        assert [h["id"] for h in got["hits"]] == [h.id for h in ref.hits], q
        np.testing.assert_allclose(
            [h["score"] for h in got["hits"]],
            [h.score for h in ref.hits], rtol=1e-4)


def test_sharded_batch(sharded, single):
    queries = [{"body": "fox"}, {"body": "dog"}, {"body": "river"},
               {"body": "cat"}]
    outs = sharded.search_batch(queries, k=5)
    for q, got in zip(queries, outs):
        ref = single.search(q, k=5)
        assert got["total"] == ref.total
        assert [h["id"] for h in got["hits"]] == [h.id for h in ref.hits]


def test_sharded_range_filter(sharded, single):
    q = {"body": "fox", "price": {"_from": 100, "_to": 800}}
    got = sharded.search(q, k=20)
    ref = single.search(q, k=20)
    assert got["total"] == ref.total
    assert [h["id"] for h in got["hits"]] == [h.id for h in ref.hits]


def test_mesh_aggregations_psum_merge(eight_devices):
    """Agg sufficient stats merge across shards via psum/pmin/pmax over
    the mesh (collective merge_results)."""
    from xapiand_tpu.parallel.sharded import ShardedIndex

    idx = ShardedIndex()
    for i in range(40):
        idx.index_document({"body": "widget common words",
                            "price": float(i)}, doc_id=f"d{i}")
    idx.commit()
    out = idx.search({"body": "widget"}, k=5, aggs={
        "st": {"_stats": {"_field": "price"}},
        "hist": {"_histogram": {"_field": "price", "_interval": 10,
                                "_buckets": 8}},
        "rng": {"_range": {"_field": "price",
                           "_ranges": [{"_key": "lo", "_to": 20},
                                       {"_key": "hi", "_from": 20}]},
                "_aggs": {"mx": {"_max": {"_field": "price"}}}}})
    assert out["total"] == 40
    st = out["aggregations"]["st"]
    assert st["_count"] == 40
    assert st["_min"] == 0.0 and st["_max"] == 39.0
    assert st["_sum"] == sum(range(40))
    hist = {b["_key"]: b["_doc_count"]
            for b in out["aggregations"]["hist"]}
    assert hist == {0.0: 10, 10.0: 10, 20.0: 10, 30.0: 10}
    rng = {b["_key"]: b for b in out["aggregations"]["rng"]}
    assert rng["lo"]["_doc_count"] == 20
    assert rng["hi"]["mx"]["_max"] == 39.0
    # order statistics ride the mesh as psum'd fixed-grid histograms
    out_p = idx.search({"body": "widget"}, aggs={
        "p": {"_percentiles": {"_field": "price",
                               "_percentiles": [0, 50, 100]}},
        "m": {"_median": {"_field": "price"}}})
    pcts = out_p["aggregations"]["p"]["_percentiles"]
    assert pcts["0"] == 0.0 and pcts["100"] == 39.0
    assert pcts["50"] == sorted(range(40))[int(0.5 * 39)]
    assert out_p["aggregations"]["m"]["_median"] == 19.5


def test_mesh_terms_agg_global_categories(eight_devices):
    """Terms buckets across shards: per-shard category codes remap to one
    global table before the psum merge."""
    from xapiand_tpu.parallel.sharded import ShardedIndex

    idx = ShardedIndex()
    cats = ["red", "green", "blue"]
    want = {}
    for i in range(30):
        c = cats[i % 3]
        want[c] = want.get(c, 0) + 1
        idx.index_document({"body": "thing stuff", "color": c},
                           doc_id=f"d{i}")
    idx.commit()
    out = idx.search({"body": "thing"}, k=5, aggs={
        "colors": {"_terms": {"_field": "color"},
                   "_aggs": {"n": {"_count": {}}}}})
    got = {b["_key"]: b["_doc_count"] for b in
           out["aggregations"]["colors"]}
    assert got == want
    for b in out["aggregations"]["colors"]:
        assert b["n"]["_count"] == b["_doc_count"]


def test_mesh_value_sort_merge(eight_devices):
    """Value-ordered top-k merged across shards by gathered sort keys."""
    from xapiand_tpu.parallel.sharded import ShardedIndex

    idx = ShardedIndex()
    import random
    rng = random.Random(3)
    prices = {}
    for i in range(32):
        p = rng.randrange(0, 10_000)
        prices[f"d{i}"] = p
        idx.index_document({"body": "gadget item", "price": p},
                           doc_id=f"d{i}")
    idx.commit()
    out = idx.search({"body": "gadget"}, k=8,
                     sort=[{"price": {"_order": "asc"}}])
    got = [h["id"] for h in out["hits"]]
    want = sorted(prices, key=lambda d: (prices[d], d))[:8]
    assert [prices[g] for g in got] == [prices[w] for w in want]
    # desc
    out = idx.search({"body": "gadget"}, k=8,
                     sort=[{"price": {"_order": "desc"}}])
    got = [prices[h["id"]] for h in out["hits"]]
    assert got == sorted(prices.values(), reverse=True)[:8]
    # distance sort on mesh
    out = idx.search({"body": "gadget"}, k=5,
                     sort=[{"price": {"_order": "asc", "_value": 5000}}])
    got = [prices[h["id"]] for h in out["hits"]]
    want = sorted(prices.values(), key=lambda p: abs(p - 5000))[:5]
    assert [abs(g - 5000) for g in got] == [abs(w - 5000) for w in want]


def test_sharded_wal_persistence_and_delete(eight_devices, tmp_path):
    """Per-shard WAL durability + delete bitmaps on the mesh."""
    from xapiand_tpu.parallel.sharded import ShardedIndex

    path = str(tmp_path / "mesh-idx")
    idx = ShardedIndex(path=path)
    for i in range(12):
        idx.index_document({"body": "durable words here"}, doc_id=f"d{i}")
    idx.commit()
    assert idx.search({"body": "durable"}, k=20)["total"] == 12
    idx.delete_document("d3")
    assert idx.search({"body": "durable"}, k=20)["total"] == 11
    idx.close()

    # reopen: WAL replay restores docs AND the delete
    idx2 = ShardedIndex(path=path)
    out = idx2.search({"body": "durable"}, k=20)
    assert out["total"] == 11
    assert "d3" not in {h["id"] for h in out["hits"]}
    idx2.close()
