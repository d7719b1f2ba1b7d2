"""Exact per-value multi-value range semantics.

The reference's MultipleValueRange unpacks the StringList and requires an
ACTUAL value inside [lo, hi] (src/multivalue/range.cc:352-366; class at
range.h:35-110) - interval overlap on the doc's [min,max] is not enough.
Regression for the round-2 confirmed divergence: a doc with values {1,10}
must NOT match _from:4,_to:6.
"""

import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.parallel.sharded_db import ShardedDatabase

DOCS = [
    {"body": "alpha one", "price": [1, 10]},       # 0: straddles, no value in
    {"body": "alpha two", "price": [1, 5]},        # 1: 5 in [4,6]
    {"body": "alpha three", "price": 5},           # 2: single value in
    {"body": "alpha four", "price": [4, 6]},       # 3: endpoints inclusive
    {"body": "alpha five", "price": 7},            # 4: single value out
    {"body": "alpha six", "price": [2, 3, 9, 11]}, # 5: none in [4,6]
    {"body": "alpha seven", "price": [0, 6, 20]},  # 6: 6 in [4,6]
    {"body": "alpha eight"},                       # 7: no value at all
]


def _expect(lo, hi):
    out = []
    for i, d in enumerate(DOCS):
        vals = d.get("price")
        if vals is None:
            continue
        if not isinstance(vals, list):
            vals = [vals]
        if any(lo <= v <= hi for v in vals):
            out.append(str(i))
    return sorted(out)


@pytest.fixture(scope="module")
def db():
    db = Database()
    for i, doc in enumerate(DOCS):
        db.index_document(dict(doc), doc_id=str(i))
    db.commit()
    return db


def test_straddling_doc_does_not_match(db):
    res = db.search({"price": {"_from": 4, "_to": 6}}, k=20)
    got = sorted(h.id for h in res.hits)
    assert got == _expect(4, 6)
    assert "0" not in got          # the confirmed round-2 false positive
    assert "5" not in got


@pytest.mark.parametrize("lo,hi", [(4, 6), (0, 0), (10, 10), (1, 1),
                                   (2, 9), (11, 50), (-5, 0)])
def test_per_value_containment_grid(db, lo, hi):
    res = db.search({"price": {"_from": lo, "_to": hi}}, k=20)
    assert sorted(h.id for h in res.hits) == _expect(lo, hi)


def test_open_ended_ranges(db):
    res = db.search({"price": {"_from": 10}}, k=20)
    assert sorted(h.id for h in res.hits) == \
        _expect(10, float("inf"))
    res = db.search({"price": {"_to": 1}}, k=20)
    assert sorted(h.id for h in res.hits) == _expect(float("-inf"), 1)


def test_range_and_term_conjunction(db):
    res = db.search({"_and": [{"body": "alpha"},
                              {"price": {"_from": 4, "_to": 6}}]}, k=20)
    assert sorted(h.id for h in res.hits) == _expect(4, 6)


def test_sharded_matches_single_node():
    ref = Database()
    sdb = ShardedDatabase(n_shards=4)
    for i, doc in enumerate(DOCS):
        ref.index_document(dict(doc), doc_id=str(i))
        sdb.index_document(dict(doc), doc_id=str(i))
    ref.commit()
    sdb.commit()
    for q in ({"price": {"_from": 4, "_to": 6}},
              {"price": {"_from": 2, "_to": 9}},
              {"_and": [{"body": "alpha"}, {"price": {"_from": 4,
                                                      "_to": 6}}]}):
        r1 = ref.search(q, k=20)
        r2 = sdb.search(q, k=20)
        assert sorted(h.id for h in r2.hits) == \
            sorted(h.id for h in r1.hits), q
        assert r2.total == r1.total
    assert sorted(h.id for h in
                  sdb.search({"price": {"_from": 4, "_to": 6}}, k=20).hits) \
        == _expect(4, 6)


def test_ip_range_agg_per_value():
    db = Database()
    db.index_document({"ip": {"_type": "ip",
                              "_value": ["1.2.3.4", "9.9.9.9"]}},
                      doc_id="0")
    db.index_document({"ip": {"_type": "ip", "_value": "5.5.5.5"}},
                      doc_id="1")
    db.commit()
    aggs = {"nets": {"_ip_range": {"_field": "ip", "_ranges": [
        {"_key": "mid", "_from": "5.0.0.0", "_to": "9.0.0.0"},
        {"_key": "low", "_from": "1.0.0.0", "_to": "2.0.0.0"},
    ]}}}
    res = db.search({"_match_all": {}}, k=0, aggs=aggs)
    buckets = {b["_key"]: b["_doc_count"] for b in res.aggregations["nets"]}
    # doc 0's [min,max] = [1.2.3.4, 9.9.9.9] straddles "mid" but has no
    # actual address inside it
    assert buckets["mid"] == 1
    assert buckets["low"] == 1


def test_slot_missing_from_older_segment():
    """A field first indexed in a later commit: older segments lack the
    value column entirely. Range filters, sorts, and aggs on that slot
    must treat those segments as all-absent, not crash (executor
    _get_value_col)."""
    from xapiand_tpu.query.dsl import parse_sort

    db = Database()
    db.index_document({"body": "red widget"}, doc_id="a")
    db.commit()                     # segment 0: no 'price' slot
    db.index_document({"body": "blue widget", "price": 5}, doc_id="b")
    db.index_document({"body": "grey widget", "price": 3}, doc_id="c")
    db.commit()
    res = db.search({"price": {"_from": 1, "_to": 10}}, k=10)
    assert sorted(h.id for h in res.hits) == ["b", "c"]
    res = db.search({"body": "widget"}, k=10,
                    sort=parse_sort(db.schema, ["price"]))
    assert [h.id for h in res.hits] == ["c", "b", "a"]   # missing last
    res = db.search({"body": "widget"}, k=0,
                    aggs={"p": {"_avg": {"_field": "price"}}})
    assert res.aggregations["p"]["_avg"] == 4.0
