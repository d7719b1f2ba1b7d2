"""Compound query operators: _max, _synonym, _elite_set, _scale_weight,
_edit_distance/_fuzzy, _partial (reference: src/reserved/query_dsl.h:27-59,
xapian OP_MAX/OP_SYNONYM/OP_ELITE_SET/OP_SCALE_WEIGHT/OP_EDIT_DISTANCE).
"""

import math

import numpy as np
import pytest

from xapiand_tpu.database import Database

DOCS = [
    {"body": "cat sat on the mat"},                 # d0: cat
    {"body": "dog ran in the park"},                # d1: dog
    {"body": "cat and dog play together cat"},      # d2: both, cat x2
    {"body": "bird sings at dawn"},                 # d3: neither
    {"body": "the quick brown fox"},                # d4: quick
]


@pytest.fixture(scope="module")
def qdb():
    db = Database()
    for i, d in enumerate(DOCS):
        db.index_document(dict(d), doc_id=f"d{i}")
    db.commit()
    return db


def scores_of(db, query):
    res = db.search(query, k=10)
    return {h.id: h.score for h in res.hits}, res.total


def test_max_operator(qdb):
    s_cat, _ = scores_of(qdb, {"body": "cat"})
    s_dog, _ = scores_of(qdb, {"body": "dog"})
    s_max, total = scores_of(qdb, {"_max": [{"body": "cat"},
                                            {"body": "dog"}]})
    # matches the same docs as OR
    assert total == 3
    for did in ("d0", "d1", "d2"):
        want = max(s_cat.get(did, 0.0), s_dog.get(did, 0.0))
        assert s_max[did] == pytest.approx(want, rel=1e-4), did
    # and differs from OR on the doc matching both branches
    s_or, _ = scores_of(qdb, {"_or": [{"body": "cat"}, {"body": "dog"}]})
    assert s_or["d2"] > s_max["d2"]


def test_synonym_operator(qdb):
    s_syn, total = scores_of(qdb, {"_synonym": [{"body": "cat"},
                                                {"body": "dog"}]})
    assert total == 3
    # d2 (cat wdf=2 + dog wdf=1) must outrank d0/d1 (wdf 1) — one merged
    # pseudo-term with summed wdf, weighted once
    assert s_syn["d2"] > s_syn["d0"]
    assert s_syn["d2"] > s_syn["d1"]
    # synonym weight uses combined stats: d0's synonym score differs from
    # its plain single-term score (tf estimate = docs matching either term)
    s_cat, _ = scores_of(qdb, {"body": "cat"})
    assert s_syn["d0"] != pytest.approx(s_cat["d0"], rel=1e-6)


def test_synonym_field_text_form(qdb):
    s1, t1 = scores_of(qdb, {"body": {"_synonym": "cat dog"}})
    s2, t2 = scores_of(qdb, {"_synonym": [{"body": "cat"}, {"body": "dog"}]})
    assert t1 == t2 == 3
    for d in s1:
        assert s1[d] == pytest.approx(s2[d], rel=1e-5)


def test_elite_set(qdb):
    # "cat" (tf 2) and "dog" (tf 2) are rarer than "the" (tf 3) -> with
    # n=2, the elite set keeps the two highest-idf terms
    full = {"_elite_set": {"_n": 2, "_value": [
        {"body": "the"}, {"body": "cat"}, {"body": "dog"}]}}
    s_el, _ = scores_of(qdb, full)
    s_or, _ = scores_of(qdb, {"_or": [{"body": "cat"}, {"body": "dog"}]})
    assert s_el == pytest.approx(s_or)
    # n >= children: identical to OR
    s_all, _ = scores_of(qdb, {"_elite_set": [
        {"body": "cat"}, {"body": "dog"}]})
    assert s_all == pytest.approx(s_or)


def test_scale_weight(qdb):
    s1, _ = scores_of(qdb, {"body": "cat"})
    s2, total = scores_of(qdb, {"_scale_weight": {"_factor": 2.5,
                                                  "_query": {"body": "cat"}}})
    assert total == 2
    for d in s1:
        assert s2[d] == pytest.approx(2.5 * s1[d], rel=1e-4)
    # inline subquery form (keys other than _factor)
    s3, _ = scores_of(qdb, {"_scale_weight": {"_factor": 2.5,
                                              "body": "cat"}})
    assert s3 == pytest.approx(s2)


def test_edit_distance_fuzzy(qdb):
    s, total = scores_of(qdb, {"body": {"_edit_distance": "quik"}})
    assert total >= 1 and "d4" in s          # quick ~ quik (1 edit)
    s2, total2 = scores_of(qdb, {"body": {"_fuzzy": "dat"}})   # cat/mat...
    assert total2 >= 1
    # 0 edits finds nothing for a non-word
    s3, total3 = scores_of(qdb, {"body": {"_edit_distance": "zzzzz",
                                          "_edits": 1}})
    assert total3 == 0


def test_partial_prefix(qdb):
    s, total = scores_of(qdb, {"body": {"_partial": "qui"}})
    assert "d4" in s
    s2, total2 = scores_of(qdb, {"body": {"_wildcard": "qui"}})
    assert s.keys() == s2.keys()


def test_max_nested_in_bool(qdb):
    # _max composes inside a filter context
    s, total = scores_of(qdb, {"_and": [
        {"_max": [{"body": "cat"}, {"body": "dog"}]},
        {"body": "play"}]})
    assert total == 1 and "d2" in s


def test_semijoin_matches_sort_pipeline_exactly():
    """Asymmetric-AND semijoin (executor._execute_semijoin, cfg.drive):
    shortest-postlist-drives + binary-search probes must reproduce the
    sort pipeline bit-for-bit - ids, scores, counts - including nested
    OR legs and FILTER roots (queryoptimiser.h semantics)."""
    import random

    import numpy as np

    from xapiand_tpu.database import Database
    from xapiand_tpu.query import plan as plan_mod

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    weights = [1 / (i + 1) for i in range(50)]
    db = Database()
    for i in range(4000):
        db.index_document({
            "cat": f"cat{rng.randint(0, 40)}",
            "body": " ".join(rng.choices(vocab, weights=weights, k=10)),
        }, doc_id=str(i))
    db.commit()
    queries = [{"_and": [{"cat": f"cat{rng.randint(0, 40)}"},
                         {"body": f"w{rng.randint(0, 6)}"}]}
               for _ in range(6)]
    queries += [{"_and": [{"cat": "cat3"}, {"body": "w0"}, {"body": "w1"}]},
                {"_filter": [{"body": "w2"}, {"cat": "cat5"}]},
                {"_and": [{"cat": "cat1"},
                          {"_or": [{"body": "w0"}, {"body": "w3"}]}]}]
    saved = plan_mod.SEMIJOIN_RATIO
    engaged = 0
    try:
        for q in queries:
            plan_mod.SEMIJOIN_RATIO = 1   # force semijoin whenever legal
            a = db.search(q, k=10)
            plan_mod.SEMIJOIN_RATIO = 10 ** 9   # force sort pipeline
            b = db.search(q, k=10)
            assert a.total == b.total, q
            assert [h.id for h in a.hits] == [h.id for h in b.hits], q
            assert np.allclose([h.score for h in a.hits],
                               [h.score for h in b.hits], rtol=1e-5), q
            engaged += 1
    finally:
        plan_mod.SEMIJOIN_RATIO = saved
    assert engaged == len(queries)


def test_compaction_matches_uncompacted_exactly():
    """Eligible-row compaction before value-sort/agg/collapse gathers
    (ExecConfig.compact_cap, plan.compact_cap_for): results must be
    bit-identical with and without it - ids, order, totals, aggregation
    payloads - across sort/aggs/collapse on AND-rooted queries."""
    import random

    from xapiand_tpu.database import Database
    from xapiand_tpu.query import plan as plan_mod
    from xapiand_tpu.query.dsl import parse_sort

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    weights = [1 / (i + 1) for i in range(60)]
    db = Database()
    for i in range(6000):
        db.index_document({
            "cat": f"cat{rng.randint(0, 30)}",
            "price": rng.randint(1, 500),
            "body": " ".join(rng.choices(vocab, weights=weights, k=10)),
        }, doc_id=str(i))
    db.commit()
    sort = parse_sort(db.schema, [{"price": {"_order": "desc"}}])
    cat_slot = db.schema.get_field("cat").slot
    aggs = {"st": {"_stats": {"_field": "price"}},
            "cats": {"_terms": {"_field": "cat"}}}
    queries = [{"_and": [{"cat": f"cat{rng.randint(0, 30)}"},
                         {"body": f"w{rng.randint(0, 5)}"}]}
               for _ in range(6)]

    def run_all():
        out = []
        for q in queries:
            out.append(db.search(q, k=10, sort=sort, aggs=aggs))
            out.append(db.search(q, k=10, collapse_slot=cat_slot))
        return out

    a = run_all()
    saved = plan_mod.compact_cap_for
    plan_mod.compact_cap_for = lambda classes, rg: 0
    try:
        b = run_all()
    finally:
        plan_mod.compact_cap_for = saved
    for x, y in zip(a, b):
        assert x.total == y.total
        assert [h.id for h in x.hits] == [h.id for h in y.hits]
        assert str(getattr(x, "aggregations", None)) == \
            str(getattr(y, "aggregations", None))
