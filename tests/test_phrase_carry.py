"""Phrase positional-carry (cfg.phrase_carry): positional channels ride
the main docid sort instead of per-term sort-joins - results must be
bit-identical to the join path (ops/phrase.py docstring; reference
semantics from phrasepostlist.cc / nearpostlist.cc)."""

import os
import random

import numpy as np

from xapiand_tpu.database import Database
from xapiand_tpu.query.dsl import QueryDSL
from xapiand_tpu.search import BatchSearcher, SegmentSearcher


def _mk(n_docs=800, seed=3):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(60)]
    docs = [" ".join(rng.choices(words, k=30)) for _ in range(n_docs)]
    db = Database()
    for i, d in enumerate(docs):
        db.index_document({"body": d}, doc_id=str(i))
    db.commit()
    return db, docs


def _res_sets(results):
    return [([int(d) for d, s in zip(r["docids"], r["scores"])
              if np.isfinite(s)], r["count"]) for r in results]


def test_phrase_carry_matches_join_path():
    db, docs = _mk()
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    rng = random.Random(9)
    irs = []
    expected_pairs = []
    for _ in range(12):                      # sampled real adjacent pairs
        toks = docs[rng.randrange(len(docs))].split()
        i = rng.randrange(len(toks) - 1)
        irs.append(dsl.parse({"body": {"_phrase": f"{toks[i]} {toks[i+1]}"}}))
        expected_pairs.append((toks[i], toks[i + 1]))
    for _ in range(4):                       # 3-word phrases + NEAR
        toks = docs[rng.randrange(len(docs))].split()
        i = rng.randrange(len(toks) - 2)
        irs.append(dsl.parse({"body": {"_phrase":
                                       " ".join(toks[i:i + 3])}}))
        irs.append(dsl.parse({"body": {"_near": f"{toks[i]} {toks[i+2]}",
                                       "_window": 4}}))

    os.environ["XT_PHRASE_CARRY"] = "0"
    base = BatchSearcher(SegmentSearcher(seg, db.scheme), k=10).run(irs)
    os.environ["XT_PHRASE_CARRY"] = "1"
    try:
        bs = BatchSearcher(SegmentSearcher(seg, db.scheme), k=10)
        planned = bs.plan(irs)
        assert any(cfg.phrase_carry for cfg, _f, _b, _c in planned)
        carry = bs.run(irs)
    finally:
        os.environ["XT_PHRASE_CARRY"] = "0"
    for qi, (a, b) in enumerate(zip(_res_sets(base), _res_sets(carry))):
        assert a == b, (qi, a, b)

    # the phrase hits really are adjacent (independent text oracle)
    tok_docs = [d.split() for d in docs]
    for qi, (a, bword) in enumerate(expected_pairs):
        got = [int(d) for d, s in zip(carry[qi]["docids"],
                                      carry[qi]["scores"])
               if np.isfinite(s)]
        for d in got:
            toks = tok_docs[d]
            assert any(toks[j] == a and toks[j + 1] == bword
                       for j in range(len(toks) - 1)), (qi, d)
