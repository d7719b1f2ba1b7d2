"""Host-side segment data merge (models/merge.py): N segments -> one with
NO re-analysis, exact result parity with a fresh re-index.

The oracle is a second Database built by re-indexing the same live docs in
the same (segment, docid) order the merge keeps - the behavior the old
compaction path had (glass_compact.cc streams tables; honey rebuilds
read-optimised; neither re-tokenizes).
"""

import random

import numpy as np
import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.models.merge import merge_segments_data
from xapiand_tpu.search import SegmentSearcher

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _doc(rng):
    return {
        "body": " ".join(rng.choices(WORDS, k=10)),
        "price": rng.randint(1, 100),
        "tags": sorted(rng.sample(range(20), k=rng.randint(1, 4))),
        "cat": rng.choice(["red", "green", "blue"]),
        "loc": {"_point": {"_latitude": rng.uniform(5, 15),
                           "_longitude": rng.uniform(15, 25)}},
    }


QUERIES = [
    {"body": "alpha"},
    {"body": "alpha beta"},
    {"body": {"_phrase": "alpha beta"}},
    {"_and": [{"body": "gamma"}, {"price": {"_from": 20, "_to": 80}}]},
    {"tags": {"_from": 3, "_to": 7}},
    {"cat": "red"},
    {"_match_all": {}},
]

AGGS = {"avg": {"_avg": {"_field": "price"}},
        "stats": {"_stats": {"_field": "price"}},
        "cats": {"_terms": {"_field": "cat"}},
        "med": {"_median": {"_field": "price"}}}


@pytest.fixture(scope="module")
def merged_and_oracle():
    rng = random.Random(7)
    db = Database()
    n = 0
    for batch in range(3):
        for _ in range(40):
            db.index_document(_doc(rng), doc_id=str(n))
            n += 1
        # replace some earlier docs and delete a few
        if batch:
            for _ in range(6):
                db.index_document(_doc(rng), doc_id=str(rng.randrange(n)))
            for _ in range(3):
                db.delete_document(str(rng.randrange(n)), missing_ok=True)
        db.commit()
    assert len(db._searchers) == 3

    segs = [s.segment for s in db._searchers]
    merged, remaps = merge_segments_data(segs)

    # oracle: fresh re-index of the SAME live rows in the SAME order
    oracle = Database()
    for seg_idx, (seg, rm) in enumerate(zip(segs, remaps)):
        for docid in np.nonzero(rm >= 0)[0]:
            key = seg.doc_keys[docid]
            assert db._locate.get(key) == (seg_idx, int(docid))
            oracle.index_document(dict(db._docs_store[key]), doc_id=key)
    oracle.commit()
    assert len(oracle._searchers) == 1

    # wrap merged into a searchable Database sharing schema + doc store
    mdb = Database()
    mdb.schema = db.schema
    mdb._docs_store = db._docs_store
    mdb._searchers = [SegmentSearcher(merged, mdb.scheme)]
    mdb._locate = {key: (0, did) for did, key in enumerate(merged.doc_keys)
                   if not merged.deleted[did]}
    return db, mdb, oracle, merged, remaps


def test_remap_shape_and_counts(merged_and_oracle):
    db, mdb, oracle, merged, remaps = merged_and_oracle
    live = sum(s.segment.doc_count for s in db._searchers)
    assert merged.num_docs == live
    assert merged.doc_count == live
    kept = sum(int((rm >= 0).sum()) for rm in remaps)
    assert kept == live
    # docids are renumbered contiguously in (seg, docid) order
    seen = np.concatenate([rm[rm >= 0] for rm in remaps])
    assert (seen == np.arange(live)).all()


def test_postings_sorted_within_terms(merged_and_oracle):
    _, _, _, merged, _ = merged_and_oracle
    for term in list(merged.terms.keys())[:200]:
        ti = merged.terms[term]
        ids = merged.post_docids[ti.offset: ti.offset + ti.length]
        assert (ids[1:] > ids[:-1]).all(), term


def test_term_stats_match_fresh_index(merged_and_oracle):
    _, mdb, oracle, merged, _ = merged_and_oracle
    oseg = oracle._searchers[0].segment
    assert set(merged.terms.keys()) == set(oseg.terms.keys())
    for term in oseg.terms.keys():
        a, b = merged.terms[term], oseg.terms[term]
        assert a.length == b.length, term
        assert a.collfreq == b.collfreq, term
        assert a.max_poslen == b.max_poslen, term
        assert abs(a.max_wdf - b.max_wdf) < 1e-6, term
    assert abs(merged.total_doclen - oseg.total_doclen) < 1e-3


def test_search_parity_with_fresh_index(merged_and_oracle):
    _, mdb, oracle, _, _ = merged_and_oracle
    for q in QUERIES:
        r1 = oracle.search(q, k=20)
        r2 = mdb.search(q, k=20)
        assert r2.total == r1.total, q
        assert [(h.id, round(h.score, 4)) for h in r2.hits] == \
            [(h.id, round(h.score, 4)) for h in r1.hits], q


def test_sorted_and_agg_parity(merged_and_oracle):
    _, mdb, oracle, _, _ = merged_and_oracle
    r1 = oracle.search({"_match_all": {}}, k=15, sort=("price", "-cat"))
    r2 = mdb.search({"_match_all": {}}, k=15, sort=("price", "-cat"))
    assert [h.id for h in r2.hits] == [h.id for h in r1.hits]
    a1 = oracle.search({"body": "alpha"}, k=0, aggs=AGGS).aggregations
    a2 = mdb.search({"body": "alpha"}, k=0, aggs=AGGS).aggregations
    assert a1 == a2


def test_geo_query_parity(merged_and_oracle):
    _, mdb, oracle, _, _ = merged_and_oracle
    q = {"loc": {"_circle": {"_latitude": 10.0, "_longitude": 20.0,
                             "_radius": 400_000}}}
    r1 = oracle.search(q, k=50)
    r2 = mdb.search(q, k=50)
    assert r2.total == r1.total
    assert sorted(h.id for h in r2.hits) == sorted(h.id for h in r1.hits)


def test_multivalue_containment_survives_merge(merged_and_oracle):
    """Per-value containment arrays (mv_*) must survive the merge: a doc
    with tags {1, 10} must NOT match tags:[4..6] (range.cc:352-366)."""
    db = Database()
    db.index_document({"tags": [1, 10]}, doc_id="a")
    db.commit()
    db.index_document({"tags": [4, 9]}, doc_id="b")
    db.commit()
    segs = [s.segment for s in db._searchers]
    merged, _ = merge_segments_data(segs)
    mdb = Database()
    mdb.schema = db.schema
    mdb._docs_store = db._docs_store
    mdb._searchers = [SegmentSearcher(merged, mdb.scheme)]
    mdb._locate = {key: (0, did) for did, key in enumerate(merged.doc_keys)}
    r = mdb.search({"tags": {"_from": 4, "_to": 6}}, k=10)
    assert [h.id for h in r.hits] == ["b"]


def test_compact_tier_uses_data_merge(merged_and_oracle):
    """Database._compact_tier must produce identical results WITHOUT
    re-running analysis (schema.index must not be called)."""
    rng = random.Random(11)
    db = Database()
    db.auto_merge_segments = 4
    n = 0
    for batch in range(4):
        for _ in range(15):
            db.index_document(_doc(rng), doc_id=str(n))
            n += 1
        db.commit()
    # compaction renumbers segments, so equal-score tiebreak order may
    # legitimately change - compare full result SETS (scores included)
    before = {}
    for i, q in enumerate(QUERIES):
        r = db.search(q, k=100)
        before[i] = (r.total,
                     sorted((h.id, round(h.score, 4)) for h in r.hits))
    calls = []
    orig = db.schema.index
    db.schema.index = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    db._compact_tier()
    db.schema.index = orig
    assert not calls, "compaction re-ran document analysis"
    assert len(db._searchers) < 4
    for i, q in enumerate(QUERIES):
        r = db.search(q, k=100)
        assert (r.total,
                sorted((h.id, round(h.score, 4))
                       for h in r.hits)) == before[i], q
