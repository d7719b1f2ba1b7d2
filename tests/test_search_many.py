"""Database.search_many == [Database.search(q) for q] on the plain
relevance path - multi-segment merge, deletes, global stats, DSL parsing
(the engine under the REST request micro-batcher)."""

import numpy as np  # noqa: F401

from xapiand_tpu.database import Database


def _mk_db():
    import random
    rng = random.Random(5)
    words = [f"w{i}" for i in range(120)]
    db = Database()
    n = 0
    for gen in range(3):              # three segment generations
        for _ in range(400):
            db.index_document(
                {"body": " ".join(rng.choices(words, k=25)),
                 "n": rng.randrange(100)}, doc_id=str(n))
            n += 1
        db.commit()
    for d in ("3", "7", "401", "802"):   # deletes across generations
        db.delete_document(d)
    db.commit()
    return db


def test_search_many_matches_search():
    db = _mk_db()
    queries = [
        {"body": "w1 w2 w3"},
        {"_or": [{"body": "w5"}, {"body": "w9"}, {"body": "w17"}]},
        {"body": "w40"},
        {"_and": [{"body": "w3"}, {"body": "w8"}]},
        {"_or": [{"body": "w110"}, {"body": "w111"}]},   # rare terms
    ]
    singles = [db.search(q, k=10) for q in queries]
    many = db.search_many(queries, k=10)
    assert len(many) == len(singles)
    for q, a, b in zip(queries, singles, many):
        assert b.total == a.total, q
        assert [h.id for h in b.hits] == [h.id for h in a.hits], q
        for ha, hb in zip(a.hits, b.hits):
            assert abs(ha.score - hb.score) < 1e-4 * max(abs(ha.score), 1)


def test_search_many_offset_and_scheme():
    db = _mk_db()
    queries = [{"body": "w1 w2"}, {"body": "w4 w6"}]
    singles = [db.search(q, k=5, offset=3, scheme="pl2") for q in queries]
    many = db.search_many(queries, k=5, offset=3, scheme="pl2")
    for a, b in zip(singles, many):
        assert [h.id for h in b.hits] == [h.id for h in a.hits]
        assert [h.rank for h in b.hits] == [h.rank for h in a.hits]


def test_search_many_stat_hungry_schemes():
    """LM needs total_len, DFR schemes doclen_upper - the batched path
    must feed the FULL stat set (regression: truncated stats silently
    zeroed LM scores)."""
    db = _mk_db()
    queries = [{"body": "w1 w2"}, {"body": "w9"}]
    for scheme in ("lm", "pl2", "dph"):
        singles = [db.search(q, k=8, scheme=scheme) for q in queries]
        many = db.search_many(queries, k=8, scheme=scheme)
        for q, a, b in zip(queries, singles, many):
            assert [h.id for h in b.hits] == [h.id for h in a.hits], \
                (scheme, q)
            assert all(abs(x.score - y.score) <
                       1e-4 * max(abs(x.score), 1)
                       for x, y in zip(a.hits, b.hits)), scheme


def test_search_many_on_sharded_database():
    """ShardedDatabase inherits search_many (per-segment coordinator
    path); results must match its mesh-backed search() exactly."""
    import random

    from xapiand_tpu.parallel.sharded_db import ShardedDatabase

    rng = random.Random(3)
    words = [f"w{i}" for i in range(80)]
    db = ShardedDatabase(n_shards=2)
    for i in range(300):
        db.index_document({"body": " ".join(rng.choices(words, k=20))},
                          doc_id=str(i))
    db.commit()
    # mixed signatures: two groups, each one SPMD launch per generation
    queries = [{"body": "w1 w2"}, {"body": "w9 w4 w6"},
               {"body": "w3 w5"}, {"_or": [{"body": "w2"},
                                           {"body": "w7"}]}]
    singles = [db.search(q, k=10) for q in queries]
    many = db.search_many(queries, k=10)
    for q, a, b in zip(queries, singles, many):
        assert b.total == a.total, q
        assert [h.id for h in b.hits] == [h.id for h in a.hits], q
    # offset pagination through the mesh batch path
    singles = [db.search(q, k=4, offset=3) for q in queries[:2]]
    many = db.search_many(queries[:2], k=4, offset=3)
    for a, b in zip(singles, many):
        assert [h.id for h in b.hits] == [h.id for h in a.hits]
        assert [h.rank for h in b.hits] == [h.rank for h in a.hits]
