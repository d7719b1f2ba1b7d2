"""Host-plan cache on the serving fast path (database.try_search_host).

The cached plan (resolved+compiled query, term constants, per-segment
offset/length matrices) must return bit-identical results to the fresh
path and invalidate on every index mutation class: uncommitted deletes
(_host_epoch), commits (revision), and segment-list changes.
≙ reference: the matcher re-resolves per enquire (xapian/matcher/), so
caching is our own contract - these tests pin its correctness.
"""

import random

from xapiand_tpu.database import Database
from xapiand_tpu.query.dsl import QueryDSL


def _mkdb(n=1500, seed=3):
    db = Database()
    rng = random.Random(seed)
    words = [f"w{j}" for j in range(150)]
    for i in range(n):
        db.index_document({"body": " ".join(rng.choices(words, k=10))},
                          doc_id=str(i))
    db.commit()
    return db


def test_plan_cache_parity_and_reuse():
    db = _mkdb()
    dsl = QueryDSL(db.schema)
    ir = dsl.parse({"_or": [{"body": "w3"}, {"body": "w17"}]})
    r1 = db.try_search_host(ir, k=10)
    assert r1 is not None
    ent = db._host_plan_cache.get(id(ir))
    assert ent is not None and ent[0] is ir and ent[2] is not None
    r2 = db.try_search_host(ir, k=10)
    assert [(h.id, h.score) for h in r1.hits] == \
        [(h.id, h.score) for h in r2.hits]
    assert r1.total == r2.total
    full = db.search(ir, k=10)
    assert [h.id for h in r1.hits] == [h.id for h in full.hits]
    assert r1.total == full.total


def test_plan_cache_invalidates_on_delete_and_commit():
    db = _mkdb()
    dsl = QueryDSL(db.schema)
    ir = dsl.parse({"_or": [{"body": "w3"}, {"body": "w17"}]})
    r1 = db.try_search_host(ir, k=10)
    top = r1.hits[0].id
    db.delete_document(top)           # uncommitted delete: _host_epoch
    r2 = db.try_search_host(ir, k=10)
    assert top not in [h.id for h in r2.hits]
    oracle = db.search(ir, k=10)
    assert [h.id for h in r2.hits] == [h.id for h in oracle.hits]
    assert r2.total == oracle.total
    for i in range(2000, 2100):      # commit: revision + new segment
        db.index_document({"body": "w3 w17"}, doc_id=str(i))
    db.commit()
    r3 = db.try_search_host(ir, k=10)
    oracle3 = db.search(ir, k=10)
    assert [h.id for h in r3.hits] == [h.id for h in oracle3.hits]
    assert r3.total == oracle3.total == r2.total + 100


def test_plan_cache_remembers_ineligible():
    db = _mkdb()
    dsl = QueryDSL(db.schema)
    ir = dsl.parse({"body": {"_phrase": "w3 w17"}})
    assert db.try_search_host(ir, k=10) is None
    ent = db._host_plan_cache.get(id(ir))
    assert ent is not None and ent[2] is None
    assert db.try_search_host(ir, k=10) is None     # cached decline


def test_stats_cache_tracks_mutations():
    db = _mkdb(n=300)
    s1 = db.stats()
    assert db.stats() is s1                     # cached object
    db.delete_document("0")
    s2 = db.stats()
    assert s2.doc_count == s1.doc_count - 1
    db.index_document({"body": "w1"}, doc_id="n1")
    db.commit()
    assert db.stats().doc_count == s2.doc_count + 1


def test_search_plan_cache_facets_parity_and_invalidation():
    """Pool-path plan cache (Database.search): facet queries with sort +
    aggs reuse the per-segment prepared plans and invalidate on every
    mutation class; a different aggs/sort shape on the SAME IR never
    reuses a stale plan."""
    from xapiand_tpu.query.dsl import parse_sort

    db = Database()
    rng = random.Random(7)
    for i in range(4000):
        db.index_document(
            {"body": " ".join(rng.choices([f"w{j}" for j in range(100)],
                                          k=8)),
             "cat": f"c{rng.randrange(8)}",
             "price": rng.uniform(1, 100)}, doc_id=str(i))
    db.commit()
    dsl = QueryDSL(db.schema)
    ir = dsl.parse({"_and": [{"cat": "c3"}, {"body": "w5"}]})
    sort = parse_sort(db.schema, [{"price": {"_order": "desc"}}])
    aggs = {"cats": {"_terms": {"_field": "cat", "_size": 8}},
            "ps": {"_stats": {"_field": "price"}}}
    r1 = db.search(ir, k=10, sort=sort, aggs=aggs)
    r2 = db.search(ir, k=10, sort=sort, aggs=aggs)
    assert [h.id for h in r1.hits] == [h.id for h in r2.hits]
    assert r1.total == r2.total
    assert repr(r1.aggregations) == repr(r2.aggregations)
    assert db._search_plan_cache.get(id(ir))[0] is ir
    if r1.hits:
        db.delete_document(r1.hits[0].id)
        r3 = db.search(ir, k=10, sort=sort, aggs=aggs)
        assert r3.total == r1.total - 1
        assert r1.hits[0].id not in [h.id for h in r3.hits]
    for i in range(9000, 9050):
        db.index_document({"body": "w5", "cat": "c3", "price": 999.0},
                          doc_id=str(i))
    db.commit()
    r4 = db.search(ir, k=10, sort=sort, aggs=aggs)
    assert r4.hits[0].data.get("price") == 999.0
    r5 = db.search(ir, k=10, sort=sort)        # same IR, no aggs
    assert r5.aggregations is None and r5.total == r4.total
