"""Clustering / diversification / extended aggregation tests."""

import numpy as np
import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.ops.cluster import diversify_mmr, kmeans_cosine, tfidf_vectors


@pytest.fixture(scope="module")
def db():
    db = Database()
    docs = {
        "m1": "machine learning tensor models training",
        "m2": "tensor training machine learning devices",
        "m3": "deep learning model tensors",
        "c1": "pasta tomato basil cooking dinner",
        "c2": "cooking pasta sauce tomato recipe",
        "g1": "hiking mountain trail camping",
        "g2": "mountain camping gear trails",
    }
    for did, body in docs.items():
        db.index_document({"body": body, "cat": did[0],
                           "price": ord(did[0]) * 10 + int(did[1])},
                          doc_id=did)
    db.commit()
    return db


def test_kmeans_groups_topics(db):
    ids = ["m1", "m2", "m3", "c1", "c2", "g1", "g2"]
    labels = db.cluster_hits(ids, k=3)
    by_topic = {}
    for did, lab in zip(ids, labels):
        by_topic.setdefault(did[0], set()).add(lab)
    # docs of one topic share a label, different topics differ
    assert all(len(s) == 1 for s in by_topic.values())
    assert len({next(iter(s)) for s in by_topic.values()}) == 3


def test_diversify_interleaves_topics(db):
    res = db.search({"body": "machine pasta mountain learning cooking"},
                    k=7)
    assert len(res.hits) >= 5
    div = db.diversify(res, lam=0.3)
    first3 = {h.id[0] for h in div.hits[:3]}
    assert len(first3) == 3  # one from each topic up front


def test_mmr_direct():
    X = np.asarray([[1, 0], [1, 0.01], [0, 1]], np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    order = diversify_mmr(np.asarray([1.0, 0.9, 0.5]), X, 3, lam=0.3)
    assert order[0] == 0 and order[1] == 2  # near-duplicate demoted


def test_tfidf_and_kmeans_shapes():
    tl = [{"a": 2, "b": 1}, {"a": 1, "c": 3}, {"d": 1}]
    X, vocab = tfidf_vectors(tl, 10, {"a": 5, "b": 1, "c": 2, "d": 1})
    assert X.shape == (3, len(vocab))
    labels, C = kmeans_cosine(X, 2, iters=5)
    assert len(labels) == 3 and C.shape[0] == 2


def test_cardinality_and_percentiles(db):
    res = db.search({"_match_all": {}}, k=1, aggs={
        "cats": {"_cardinality": {"_field": "cat"}},
        "price_pcts": {"_percentiles": {"_field": "price",
                                        "_percentiles": [0, 50, 100]}},
    })
    assert res.aggregations["cats"]["_cardinality"] == 3
    pcts = res.aggregations["price_pcts"]["_percentiles"]
    prices = sorted(ord(d[0]) * 10 + int(d[1])
                    for d in ["m1", "m2", "m3", "c1", "c2", "g1", "g2"])
    assert pcts["0"] == prices[0]
    assert pcts["100"] == prices[-1]
    assert pcts["50"] == prices[len(prices) // 2]
