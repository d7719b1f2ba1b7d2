"""Derived bigram (nextword) index (native.cpp xt_qseg_build_bigrams +
xt_query_exec bigram resolution): 2-term exact phrases answered from a
plain docid list with zero positional verification.

The table is built from the SAME position arrays the positional checker
reads, so adjacency semantics match by construction; parity here is
asserted three ways - bigram host path vs positional host path vs the
device batch - including exact totals, deletes, impossible pairs, and
the fallback shapes (NEAR, 3-term phrases, minlen-gated light terms).
~ nextword indexes (Williams & Zobel); the reference has no analog and
re-verifies positions per candidate
(/root/reference/src/xapian/matcher/phrasepostlist.cc).
"""

import os
import random

import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.query.dsl import QueryDSL


def _build_db(n_docs=2500, vocab=50, k=16, seed=3, deletes=True):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    weights = [1.0 / (i + 1) for i in range(vocab)]
    db = Database()
    docs = []
    for i in range(n_docs):
        d = " ".join(rng.choices(words, weights=weights, k=k))
        docs.append(d)
        db.index_document({"body": d}, doc_id=str(i))
    db.commit()
    if deletes:
        for i in range(0, n_docs, 13):
            db.delete_document(str(i))
        db.commit()
    return db, docs


def _phrase_queries(docs, n=24, seed=11):
    rng = random.Random(seed)
    qs, seen = [], set()
    while len(qs) < n:
        toks = docs[rng.randrange(len(docs))].split()
        i = rng.randrange(len(toks) - 1)
        p = (toks[i], toks[i + 1])
        if p[0] != p[1] and p not in seen:
            seen.add(p)
            qs.append({"body": {"_phrase": f"{p[0]} {p[1]}"}})
    toks = docs[5].split()
    qs += [
        {"body": {"_phrase": "w49 w48"}},              # likely impossible
        {"body": {"_phrase": "w0 nosuchterm"}},        # missing term
        {"_and": [{"body": {"_phrase": "w0 w1"}}, {"body": "w4"}]},
        {"_and_not": [{"body": {"_phrase": "w0 w1"}}, {"body": "w2"}]},
        {"body": {"_near": "w0 w2"}},                  # NEAR: positional
        {"body": {"_phrase": " ".join(toks[3:6])}},    # 3-term: positional
    ]
    return qs


def _run_all(db, queries, k=10):
    dsl = QueryDSL(db.schema)
    out = []
    for q in queries:
        r = db.search(dsl.parse(q), k=k)
        out.append((r.total,
                    [(h.id, round(h.score, 5)) for h in r.hits]))
    return out


def _drop_host_executors(db):
    for s in db._searchers:
        s.__dict__.pop("_host_query", None)


@pytest.fixture(scope="module")
def corpus():
    return _build_db()


def test_bigram_parity_three_ways(corpus, monkeypatch_module=None):
    db, docs = corpus
    queries = _phrase_queries(docs)
    os.environ["XT_BIGRAM"] = "1"
    got = _run_all(db, queries)
    _drop_host_executors(db)
    os.environ["XT_BIGRAM"] = "0"
    os.environ["XT_HOST_PHRASE_MAX"] = "999999999"   # host positional
    try:
        positional = _run_all(db, queries)
    finally:
        os.environ.pop("XT_HOST_PHRASE_MAX", None)
        os.environ["XT_BIGRAM"] = "1"
        _drop_host_executors(db)
    os.environ["XT_HOST_PATH"] = "0"
    try:
        device = _run_all(db, queries)
    finally:
        os.environ["XT_HOST_PATH"] = "1"
    for qi, (g, p, d) in enumerate(zip(got, positional, device)):
        assert g == p, (qi, queries[qi], g, p)
        # device scores are f32 sumparts: compare ranks + loose scores
        assert g[0] == d[0], (qi, queries[qi], g[0], d[0])
        assert [h[0] for h in g[1]] == [h[0] for h in d[1]], \
            (qi, queries[qi], g[1], d[1])
        for (_, gs), (_, ds) in zip(g[1], d[1]):
            assert abs(gs - ds) < 5e-4


def test_impossible_pair_zero_matches(corpus):
    db, docs = corpus
    # a pair of real terms that are never adjacent: find one by scanning
    tok_docs = [d.split() for d in docs]
    adjacent = {(t[i], t[i + 1]) for t in tok_docs
                for i in range(len(t) - 1)}
    pair = None
    for a in ("w0", "w1", "w2"):
        for b in ("w47", "w48", "w49"):
            if (a, b) not in adjacent:
                pair = (a, b)
                break
        if pair:
            break
    if pair is None:
        pytest.skip("corpus saturates all probe pairs")
    dsl = QueryDSL(db.schema)
    r = db.search(dsl.parse({"body": {"_phrase": f"{pair[0]} {pair[1]}"}}),
                  k=10)
    assert r.total == 0 and not r.hits


def test_bigram_exact_totals_vs_oracle(corpus):
    """Totals are EXACT (not estimates): brute-force adjacency oracle."""
    db, docs = corpus
    tok_docs = [d.split() for d in docs]
    deleted = {i for i in range(len(docs)) if i % 13 == 0}
    dsl = QueryDSL(db.schema)
    rng = random.Random(23)
    for _ in range(8):
        toks = docs[rng.randrange(len(docs))].split()
        i = rng.randrange(len(toks) - 1)
        a, b = toks[i], toks[i + 1]
        if a == b:
            continue
        expect = sum(
            1 for di, t in enumerate(tok_docs)
            if di not in deleted
            and any(t[j] == a and t[j + 1] == b
                    for j in range(len(t) - 1)))
        r = db.search(dsl.parse({"body": {"_phrase": f"{a} {b}"}}), k=5)
        assert r.total == expect, (a, b, r.total, expect)


def test_minlen_gating_falls_back_positional():
    """With a tiny occurrence cap only heavy terms are bigram-indexed;
    light phrases must still answer exactly via the positional path."""
    os.environ["XT_BIGRAM_MAX_OCC"] = "200"
    try:
        db, docs = _build_db(n_docs=400, seed=9, deletes=False)
        queries = _phrase_queries(docs, n=12, seed=29)
        got = _run_all(db, queries)
        _drop_host_executors(db)
        os.environ["XT_BIGRAM"] = "0"
        os.environ["XT_HOST_PHRASE_MAX"] = "999999999"
        try:
            positional = _run_all(db, queries)
        finally:
            os.environ.pop("XT_HOST_PHRASE_MAX", None)
            os.environ["XT_BIGRAM"] = "1"
        assert got == positional
    finally:
        os.environ.pop("XT_BIGRAM_MAX_OCC", None)
