"""End-to-end engine tests: index -> device execution -> ranked results,
with BM25 rank parity against the double-precision oracle (BASELINE.md
recall-parity gate, SURVEY.md §7 stage 4)."""

import random

import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.query.dsl import parse_sort
from xapiand_tpu.query.ir import Q

from oracle import OracleIndex

WORDS = ("quick brown fox jumps over lazy dog cat bird fish red blue green "
         "big small fast slow happy sad city town river mountain code search "
         "engine data index query tensor device mesh shard").split()


def make_docs(n, seed=42):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        body = " ".join(rng.choices(WORDS, k=rng.randint(5, 40)))
        docs.append({
            "title": " ".join(rng.choices(WORDS, k=3)),
            "body": body,
            "price": rng.randint(1, 1000),
            "category": rng.choice(["alpha", "beta", "gamma", "delta"]),
            "stars": rng.random() * 5,
        })
    return docs


@pytest.fixture(scope="module")
def db():
    db = Database()
    for i, doc in enumerate(make_docs(300)):
        db.index_document(doc, doc_id=str(i))
    db.commit()
    return db


@pytest.fixture(scope="module")
def oracle(db):
    oi = OracleIndex()
    from xapiand_tpu.schema import Schema

    # replay the same analysis through a fresh schema copy
    schema = Schema.from_dict(db.schema.to_dict())
    for i, doc in enumerate(make_docs(300)):
        idoc = schema.index(doc, doc_id=str(i))
        oi.add(str(i), {t: e.wdf for t, e in idoc.terms.items()})
    return oi


def _field_terms(db, field, words):
    spec = db.schema.get_field(field)
    from xapiand_tpu.analysis.termgen import TermGenerator

    tg = TermGenerator("english")
    out = []
    for w in words:
        out.append("Z" + spec.prefix + tg.stem(w))
    return out


def test_single_term_bm25_parity(db, oracle):
    terms = _field_terms(db, "body", ["fox"])
    res = db.search(Q.or_terms(terms), k=10)
    expect = oracle.bm25_or(terms, k=10)
    assert [h.id for h in res.hits] == [oracle.keys[d] for d, _ in expect]
    for h, (_, sc) in zip(res.hits, expect):
        assert h.score == pytest.approx(sc, rel=1e-4)
    assert res.total == len(oracle.match_or(terms))


def test_multi_term_or_bm25_parity(db, oracle):
    for words in (["quick", "fox"], ["search", "engine", "data"],
                  ["red", "blue", "green", "cat"]):
        terms = _field_terms(db, "body", words)
        res = db.search(Q.or_terms(terms), k=10)
        expect = oracle.bm25_or(terms, k=10)
        assert [h.id for h in res.hits] == \
            [oracle.keys[d] for d, _ in expect], words
        assert res.total == len(oracle.match_or(terms))


def test_and_query(db, oracle):
    t1 = _field_terms(db, "body", ["fox"])
    t2 = _field_terms(db, "body", ["dog"])
    res = db.search(Q.and_(Q.or_terms(t1), Q.or_terms(t2)), k=300)
    expect = oracle.match_and([t1, t2])
    assert sorted(int(h.id) for h in res.hits) == \
        [int(oracle.keys[d]) for d in expect]
    assert res.total == len(expect)


def test_and_not_query(db, oracle):
    t1 = _field_terms(db, "body", ["fox"])
    t2 = _field_terms(db, "body", ["dog"])
    res = db.search(Q.and_not(Q.or_terms(t1), Q.or_terms(t2)), k=300)
    a = set(oracle.match_or(t1))
    b = set(oracle.match_or(t2))
    assert sorted(int(h.id) for h in res.hits) == \
        sorted(int(oracle.keys[d]) for d in a - b)


def test_and_maybe_scores(db, oracle):
    t1 = _field_terms(db, "body", ["fox"])
    t2 = _field_terms(db, "body", ["dog"])
    res = db.search(Q.and_maybe(Q.or_terms(t1), Q.or_terms(t2)), k=300)
    # match set == A
    assert res.total == len(oracle.match_or(t1))
    # docs also matching B have score > their A-only score
    both = set(oracle.match_or(t1)) & set(oracle.match_or(t2))
    scores = {int(h.id): h.score for h in res.hits}
    only_a = db.search(Q.or_terms(t1), k=300)
    a_scores = {int(h.id): h.score for h in only_a.hits}
    for d in both:
        key = int(oracle.keys[d])
        assert scores[key] > a_scores[key]


def test_value_range_filter(db):
    q = {"price": {"_from": 100, "_to": 300}}
    res = db.search(q, k=300)
    docs = make_docs(300)
    expect = sorted(i for i, d in enumerate(docs)
                    if 100 <= d["price"] <= 300)
    assert sorted(int(h.id) for h in res.hits) == expect
    assert res.total == len(expect)


def test_range_and_term(db):
    docs = make_docs(300)
    q = {"body": "fox", "price": {"_from": 0, "_to": 500}}
    res = db.search(q, k=300)
    for h in res.hits:
        assert docs[int(h.id)]["price"] <= 500
        assert "fox" in (docs[int(h.id)]["body"] + " ")


def test_keyword_field_query(db):
    docs = make_docs(300)
    res = db.search({"category": "alpha"}, k=300)
    expect = sorted(i for i, d in enumerate(docs) if d["category"] == "alpha")
    got = sorted(int(h.id) for h in res.hits)
    assert got == expect


def test_sort_by_value(db):
    docs = make_docs(300)
    sort = parse_sort(db.schema, [{"price": {"_order": "asc"}}])
    res = db.search({"category": "beta"}, k=5, sort=sort)
    beta = sorted((d["price"], i) for i, d in enumerate(docs)
                  if d["category"] == "beta")
    assert [int(h.id) for h in res.hits] == [i for _, i in beta[:5]]
    sort_d = parse_sort(db.schema, [{"price": {"_order": "desc"}}])
    res_d = db.search({"category": "beta"}, k=5, sort=sort_d)
    beta_d = sorted(((-d["price"], i) for i, d in enumerate(docs)
                     if d["category"] == "beta"))
    assert [int(h.id) for h in res_d.hits] == [i for _, i in beta_d[:5]]


def test_count_only(db, oracle):
    terms = _field_terms(db, "body", ["river"])
    assert db.count(Q.or_terms(terms)) == len(oracle.match_or(terms))


def test_delete_and_replace(db):
    db2 = Database()
    for i, doc in enumerate(make_docs(50)):
        db2.index_document(doc, doc_id=str(i))
    db2.commit()
    assert db2.doc_count == 50
    db2.delete_document("7", commit=True)
    assert db2.doc_count == 49
    res = db2.search({"_id": "7"}, k=10)
    assert res.total == 0
    # replace
    db2.index_document({"body": "zebra unicorn"}, doc_id="8", commit=True)
    res = db2.search({"body": "zebra"}, k=10)
    assert [h.id for h in res.hits] == ["8"]
    assert db2.doc_count == 49


def test_aggregations(db):
    docs = make_docs(300)
    res = db.search({"_match_all": {}}, k=1, aggs={
        "avg_price": {"_avg": {"_field": "price"}},
        "cats": {"_terms": {"_field": "category", "_size": 10}},
        "price_hist": {"_histogram": {"_field": "price", "_interval": 250,
                                      "_buckets": 4}},
        "stats": {"_extended_stats": {"_field": "stars"}},
    })
    prices = [d["price"] for d in docs]
    avg = res.aggregations["avg_price"]["_avg"]
    assert avg == pytest.approx(sum(prices) / len(prices), rel=1e-5)
    from collections import Counter

    cnt = Counter(d["category"] for d in docs)
    got = {b["_key"]: b["_doc_count"] for b in res.aggregations["cats"]}
    assert got == dict(cnt)
    hist = {b["_key"]: b["_doc_count"] for b in res.aggregations["price_hist"]}
    expect_hist = Counter((p // 250) * 250 for p in prices)
    assert hist == {float(k): v for k, v in expect_hist.items()}
    st = res.aggregations["stats"]
    stars = [d["stars"] for d in docs]
    assert st["_count"] == 300
    assert st["_avg"] == pytest.approx(sum(stars) / 300, rel=1e-4)


def test_phrase_query(db):
    db3 = Database()
    db3.index_document({"body": "the quick brown fox"}, doc_id="a")
    db3.index_document({"body": "brown quick the fox"}, doc_id="b")
    db3.index_document({"body": "quick brown dogs"}, doc_id="c")
    db3.commit()
    res = db3.search({"body": {"_phrase": "quick brown"}}, k=10)
    assert sorted(h.id for h in res.hits) == ["a", "c"]
    res = db3.search({"body": {"_near": "fox the", "_window": 4}}, k=10)
    assert sorted(h.id for h in res.hits) == ["a", "b"]


def test_geo_query_e2e(db):
    db4 = Database()
    db4.index_document({"loc": {"_point": {"_longitude": -74.0,
                                           "_latitude": 40.7}}}, doc_id="ny")
    db4.index_document({"loc": {"_point": {"_longitude": 151.2,
                                           "_latitude": -33.9}}}, doc_id="syd")
    db4.commit()
    res = db4.search({"loc": {"_circle": {"_longitude": -74.0,
                                          "_latitude": 40.7,
                                          "_radius": 50000}}}, k=10)
    assert [h.id for h in res.hits] == ["ny"]


def test_multiple_uncommitted_replacements_survive_commit():
    """Regression: replacing a PENDING doc left its id in _pending_deletes,
    so commit's delete pass killed the FINAL version too (>=2 uncommitted
    replacements lost the doc; delete-then-readd in one batch likewise)."""
    from xapiand_tpu.database import Database

    db = Database()
    db.index_document({"a": 1}, doc_id="1")
    db.index_document({"a": 2}, doc_id="1")
    db.index_document({"a": 3}, doc_id="1")
    db.commit()
    assert db.get_document("1") == {"a": 3}
    assert db.search({"_match_all": {}}, k=5).total == 1

    # delete then re-add within the same uncommitted batch
    db.index_document({"b": 1}, doc_id="2")
    db.delete_document("2")
    db.index_document({"b": 2}, doc_id="2")
    db.commit()
    assert db.get_document("2") == {"b": 2}
    assert db.search({"_match_all": {}}, k=5).total == 2

    # ...and a delete that STAYS deleted still works
    db.index_document({"c": 1}, doc_id="3")
    db.delete_document("3")
    db.commit()
    assert db.search({"_match_all": {}}, k=5).total == 2
