"""Host latency-path scorer (ops/host_scorer.py): exact parity with the
device path and correct routing.

The serving plane routes lone plain-BM25 queries through the native TAAT
scorer (native.cpp xt_score_topk) because a single device readback costs
~9ms through the host<->TPU tunnel (scripts/tunnel_probe.py); results must
be indistinguishable from the device executor's (score desc, docid asc,
same counts, deletes excluded). ~ matcher.cc:179-560 hot loop semantics.
"""

import numpy as np
import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.models.weights import get_scheme
from xapiand_tpu.ops import host_scorer


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(42)
    words = [f"w{i}" for i in range(200)]
    d = Database()
    for i in range(2500):
        toks = rng.choice(words, size=int(rng.integers(3, 25)))
        d.index_document({"body": " ".join(toks)}, doc_id=str(i))
        if i % 600 == 599:
            d.commit()
    d.commit()
    assert len(d._searchers) > 1   # multi-segment merge is exercised
    return d


@pytest.fixture(scope="module")
def queries():
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(200)]
    qs = [{"_or": [{"body": w}
                   for w in rng.choice(words, size=int(n), replace=False)]}
          for n in rng.integers(1, 6, size=24)]
    qs.append({"body": "w3"})                       # single term
    qs.append({"_or": [{"body": "nosuchterm"}, {"body": "w5"}]})
    return qs


def _ids_scores(res):
    return [(h.id, round(h.score, 5)) for h in res.hits]


def test_host_vs_device_parity(db, queries, monkeypatch):
    monkeypatch.setenv("XT_HOST_PATH", "1")
    host = [db.search(q, k=10) for q in queries]
    assert db._use_host_path(
        __import__("xapiand_tpu.query.plan", fromlist=["compile_ir"])
        .compile_ir(__import__("xapiand_tpu.query.dsl",
                               fromlist=["QueryDSL"])
                    .QueryDSL(db.schema).parse(queries[0])), db.scheme)
    monkeypatch.setenv("XT_HOST_PATH", "0")
    dev = [db.search(q, k=10) for q in queries]
    for i, (h, d) in enumerate(zip(host, dev)):
        assert h.total == d.total, i
        assert [x.id for x in h.hits] == [x.id for x in d.hits], i
        for hh, dd in zip(h.hits, d.hits):
            assert abs(hh.score - dd.score) < 1e-3


def test_host_search_many_parity(db, queries, monkeypatch):
    monkeypatch.setenv("XT_HOST_PATH", "1")
    hm = db.search_many(queries, k=10)
    monkeypatch.setenv("XT_HOST_PATH", "0")
    dm = db.search_many(queries, k=10)
    for i, (h, d) in enumerate(zip(hm, dm)):
        assert h.total == d.total, i
        assert [x.id for x in h.hits] == [x.id for x in d.hits], i


def test_host_delete_parity(queries, monkeypatch):
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(200)]
    d = Database()
    for i in range(1200):
        toks = rng.choice(words, size=int(rng.integers(3, 25)))
        d.index_document({"body": " ".join(toks)}, doc_id=str(i))
    d.commit()
    for i in range(0, 1200, 5):
        d.delete_document(str(i), missing_ok=True)
    monkeypatch.setenv("XT_HOST_PATH", "1")
    host = [d.search(q, k=10) for q in queries[:8]]
    monkeypatch.setenv("XT_HOST_PATH", "0")
    dev = [d.search(q, k=10) for q in queries[:8]]
    for i, (h, dd) in enumerate(zip(host, dev)):
        assert h.total == dd.total, i
        assert [x.id for x in h.hits] == [x.id for x in dd.hits], i


def test_routing_gates(db):
    """Heavier operators must NOT take the host path."""
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.query.plan import compile_ir

    dsl = QueryDSL(db.schema)
    plain = compile_ir(dsl.parse({"_or": [{"body": "w1"}, {"body": "w2"}]}))
    assert host_scorer.host_eligible(plain, db.scheme)
    assert not host_scorer.host_eligible(plain, db.scheme,
                                         sort=(("value", 0, False),))
    assert not host_scorer.host_eligible(plain, db.scheme,
                                         aggs={"a": {"_count": {}}})
    assert not host_scorer.host_eligible(plain, db.scheme, collapse_slot=0)
    assert not host_scorer.host_eligible(plain, get_scheme("pl2"))
    boolean = compile_ir(dsl.parse(
        {"_and": [{"body": "w1"}, {"body": "w2"}]}))
    assert not host_scorer.host_eligible(boolean, db.scheme)
    phrase = compile_ir(dsl.parse({"body": {"_phrase": "w1 w2"}}))
    assert not host_scorer.host_eligible(phrase, db.scheme)


def test_work_threshold(db, monkeypatch):
    """Above HOST_MAX_WORK the router keeps the device path."""
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.query.plan import compile_ir

    cq = compile_ir(QueryDSL(db.schema).parse({"body": "w1"}))
    monkeypatch.setattr(Database, "HOST_MAX_WORK", 0)
    assert not db._use_host_path(cq, db.scheme)


def test_numpy_fallback_parity(db, queries, monkeypatch):
    """lib=None exercises the pure-numpy bincount fallback."""
    monkeypatch.setattr("xapiand_tpu.native.lib", None)
    monkeypatch.setenv("XT_HOST_PATH", "1")
    for s in db._searchers:   # drop pointer caches built with lib
        if hasattr(s, "_host_scorer"):
            del s._host_scorer
    host = [db.search(q, k=10) for q in queries[:6]]
    monkeypatch.setenv("XT_HOST_PATH", "0")
    dev = [db.search(q, k=10) for q in queries[:6]]
    for i, (h, d) in enumerate(zip(host, dev)):
        assert h.total == d.total, i
        assert [x.id for x in h.hits] == [x.id for x in d.hits], i
    for s in db._searchers:
        if hasattr(s, "_host_scorer"):
            del s._host_scorer
