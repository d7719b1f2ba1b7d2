"""Conjunctive host query executor (ops/host_query.py + native.cpp
xt_query_exec): exact parity with the device path for AND trees with
predicate leaves, value sorts, and flat aggregations.

The device pipeline pays ~30 serialized cycles per gathered element
(CLAUDE.md chip measurements); conjunctive faceted/geo queries route to
the native executor, which must be indistinguishable: same counts, same
ranked ids (score desc / value key / docid ties), same agg partials.
~ matcher.cc:179-560 + queryoptimiser AND ordering.
"""

import os
import random

import numpy as np
import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.query.dsl import parse_sort


@pytest.fixture(scope="module")
def db():
    rng = random.Random(5)
    cats = [f"c{i}" for i in range(6)]
    words = [f"w{i}" for i in range(40)]
    d = Database()
    for i in range(1200):
        d.index_document({"body": " ".join(rng.choices(words, k=12)),
                          "cat": rng.choice(cats),
                          "price": rng.randint(1, 100),
                          "tags": rng.sample(words[:10],
                                             rng.randint(1, 3))},
                         doc_id=str(i))
        if i == 600:
            d.commit()
    d.commit()
    return d


QUERIES = None


@pytest.fixture(scope="module")
def queries():
    rng = random.Random(7)
    cats = [f"c{i}" for i in range(6)]
    words = [f"w{i}" for i in range(40)]
    qs = [{"_and": [{"cat": rng.choice(cats)}, {"body": rng.choice(words)}]}
          for _ in range(10)]
    qs += [{"_and": [{"body": rng.choice(words)},
                     {"body": rng.choice(words)},
                     {"body": rng.choice(words)}]} for _ in range(4)]
    qs.append({"_and": [{"body": "w1"}, {"_not": {"body": "w2"}}]})
    qs.append({"_and": [{"cat": "c1"},
                        {"price": {"_from": 20, "_to": 70}}]})
    return qs


def _ab(db, q, monkeypatch, **kw):
    monkeypatch.setenv("XT_HOST_PATH", "1")
    h = db.search(q, k=10, **kw)
    monkeypatch.setenv("XT_HOST_PATH", "0")
    d = db.search(q, k=10, **kw)
    return h, d


def test_conjunctive_parity(db, queries, monkeypatch):
    for i, q in enumerate(queries):
        h, d = _ab(db, q, monkeypatch)
        assert h.total == d.total, (i, h.total, d.total)
        assert [x.id for x in h.hits] == [x.id for x in d.hits], i
        for hh, dd in zip(h.hits, d.hits):
            assert abs(hh.score - dd.score) < 1e-3


def test_disjunctive_conjunct_parity(db, monkeypatch):
    """OR leaves inside the AND tree marshal as one native group (hit =
    any term present, every matching scoring term adds) - the device
    tree's OR semantics. Covers the cfg2 'not' shape AND_NOT(OR(a,b),c)
    and nested ORs."""
    qs = [
        {"_and_not": [{"_or": [{"body": "w1"}, {"body": "w2"}]},
                      {"body": "w3"}]},
        {"_and": [{"_or": [{"body": "w1"}, {"body": "w4"}]},
                  {"body": "w2"}]},
        {"_and": [{"_or": [{"body": "w0"},
                           {"_or": [{"body": "w5"}, {"body": "w6"}]}]},
                  {"cat": "c2"}]},
        {"_and": [{"_or": [{"body": "w1"}, {"body": "w2"}]},
                  {"_or": [{"body": "w3"}, {"body": "w4"}]}]},
        {"_and_not": [{"_or": [{"body": "w1"}, {"body": "w1"}]},
                      {"_or": [{"body": "w2"}, {"body": "w5"}]}]},
    ]
    for i, q in enumerate(qs):
        h, d = _ab(db, q, monkeypatch)
        assert h.total == d.total, (i, h.total, d.total)
        assert [x.id for x in h.hits] == [x.id for x in d.hits], i
        for hh, dd in zip(h.hits, d.hits):
            assert abs(hh.score - dd.score) < 1e-3


def test_conjunctive_aggs_parity(db, queries, monkeypatch):
    aggs = {"cats": {"_terms": {"_field": "cat"}},
            "ps": {"_stats": {"_field": "price"}},
            "n": {"_count": {}},
            "avg": {"_avg": {"_field": "price"}}}
    for i, q in enumerate(queries[:8]):
        h, d = _ab(db, q, monkeypatch, aggs=aggs)
        assert h.total == d.total, i
        ha, da = h.aggregations, d.aggregations
        assert ha["n"] == da["n"], i
        hc = {b["_key"]: b["_doc_count"] for b in ha["cats"]}
        dc = {b["_key"]: b["_doc_count"] for b in da["cats"]}
        assert hc == dc, i
        for f in ("_count", "_min", "_max"):
            assert ha["ps"][f] == da["ps"][f], (i, f)
        if da["avg"]["_avg"] is None:
            assert ha["avg"]["_avg"] is None
        else:
            assert abs(ha["avg"]["_avg"] - da["avg"]["_avg"]) < 1e-3


def test_conjunctive_value_sort_parity(db, queries, monkeypatch):
    for order in ("asc", "desc"):
        sort = parse_sort(db.schema, [{"price": {"_order": order}}])
        for i, q in enumerate(queries[:8]):
            h, d = _ab(db, q, monkeypatch, sort=sort)
            assert h.total == d.total, (order, i)
            assert [x.id for x in h.hits] == [x.id for x in d.hits], \
                (order, i)


def test_conjunctive_count_only(db, queries, monkeypatch):
    for q in queries[:6]:
        h, d = _ab(db, q, monkeypatch, count_only=True)
        assert h.total == d.total


def test_multivalue_filter_parity(db, monkeypatch):
    """tags is multi-value: per-value containment must hold (the [1,10]
    vs [4,6] interval-overlap false-positive class)."""
    q = {"_and": [{"body": "w3"}, {"tags": "w2"}]}
    h, d = _ab(db, q, monkeypatch)
    assert h.total == d.total
    assert [x.id for x in h.hits] == [x.id for x in d.hits]


def test_geo_time_parity(monkeypatch):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from config_bench import build_corpus4, queries4

    docs = build_corpus4(1500)
    db4 = Database()
    for i, doc in enumerate(docs):
        db4.index_document(dict(doc), doc_id=str(i))
    db4.commit()
    for i, q in enumerate(queries4(6)):
        h, d = _ab(db4, q, monkeypatch)
        assert h.total == d.total, i
        assert [x.id for x in h.hits] == [x.id for x in d.hits], i


def test_batchsearcher_routes_host(db, queries, monkeypatch):
    """BatchSearcher.run host-routes conjunctive queries and results
    match the device plan path."""
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher

    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    irs = [dsl.parse(q) for q in queries[:8]]
    monkeypatch.setenv("XT_HOST_PATH", "1")
    bs = BatchSearcher(SegmentSearcher(seg, db.scheme), k=10, min_batch=4)
    host_res, rem = bs._route_host(irs)
    assert host_res and len(rem) < len(irs)
    on = bs.run(irs)
    monkeypatch.setenv("XT_HOST_PATH", "0")
    off = BatchSearcher(SegmentSearcher(seg, db.scheme), k=10,
                        min_batch=4).run(irs)
    for i, (a, b) in enumerate(zip(on, off)):
        assert a["count"] == b["count"], i
        da = [int(x) for x, s in zip(a["docids"], a["scores"])
              if np.isfinite(s)]
        dbb = [int(x) for x, s in zip(b["docids"], b["scores"])
               if np.isfinite(s)]
        assert da == dbb, i


def test_deletes_respected(monkeypatch):
    rng = random.Random(3)
    words = [f"w{i}" for i in range(20)]
    d = Database()
    for i in range(400):
        d.index_document({"body": " ".join(rng.choices(words, k=8)),
                          "cat": f"c{i % 3}"}, doc_id=str(i))
    d.commit()
    for i in range(0, 400, 3):
        d.delete_document(str(i), missing_ok=True)
    q = {"_and": [{"cat": "c1"}, {"body": "w4"}]}
    h, dd = _ab(d, q, monkeypatch)
    assert h.total == dd.total
    assert [x.id for x in h.hits] == [x.id for x in dd.hits]


def test_phrase_near_parity(monkeypatch):
    """Positional leaves route host too: PHRASE adjacency + NEAR anchor
    windows verified from the flat position spans, exactly (no pmax /
    cand caps on the host)."""
    rng = random.Random(3)
    words = [f"w{i}" for i in range(25)]
    d = Database()
    for i in range(600):
        d.index_document({"body": " ".join(rng.choices(words, k=15))},
                         doc_id=str(i))
        if i == 300:
            d.commit()
    d.commit()
    qs = []
    for _ in range(8):
        a, b = rng.sample(words, 2)
        qs.append({"body": {"_phrase": f"{a} {b}"}})
        qs.append({"body": {"_near": f"{a} {b}"}})
        qs.append({"_and": [{"body": rng.choice(words)},
                            {"body": {"_phrase": f"{a} {b}"}}]})
    for i, q in enumerate(qs):
        h, dd = _ab(d, q, monkeypatch)
        assert h.total == dd.total, (i, q)
        assert [x.id for x in h.hits] == [x.id for x in dd.hits], (i, q)
