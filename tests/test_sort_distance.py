"""Distance sort keys: numeric nearest-to-value, geo haversine, string
metrics (≙ Multi_MultiValueKeyMaker, src/multivalue/keymaker.h:64-366;
DSL _sort {"field": {"_order", "_value", "_metric"}} per query_dsl.cc
RESERVED_QUERYDSL_METRIC handling)."""

import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.query.dsl import parse_sort


@pytest.fixture(scope="module")
def ddb():
    db = Database()
    docs = [
        {"name": "alpha", "price": 10, "loc": {"_point": {
            "_latitude": 40.7, "_longitude": -74.0}}},      # NYC
        {"name": "beta", "price": 95, "loc": {"_point": {
            "_latitude": 51.5, "_longitude": -0.1}}},       # London
        {"name": "gamma", "price": 52, "loc": {"_point": {
            "_latitude": 35.7, "_longitude": 139.7}}},      # Tokyo
        {"name": "delta", "price": 48, "loc": {"_point": {
            "_latitude": 48.9, "_longitude": 2.35}}},       # Paris
    ]
    for i, d in enumerate(docs):
        db.index_document(d, doc_id=f"d{i}")
    db.commit()
    return db


def ids_sorted(db, sort_spec):
    sort = parse_sort(db.schema, sort_spec)
    res = db.search({"_match_all": {}}, k=10, sort=sort)
    return [h.id for h in res.hits]


def test_numeric_distance_sort(ddb):
    # nearest to 50: gamma(52), delta(48) tie-ish -> |2| both, then others
    ids = ids_sorted(ddb, [{"price": {"_order": "asc", "_value": 50}}])
    assert set(ids[:2]) == {"d2", "d3"}
    assert ids[2] == "d0" and ids[3] == "d1"
    # farthest first
    ids = ids_sorted(ddb, [{"price": {"_order": "desc", "_value": 50}}])
    assert ids[0] == "d1"


def test_geo_distance_sort(ddb):
    # nearest to London: London, Paris, NYC, Tokyo
    ids = ids_sorted(ddb, [{"loc": {"_order": "asc", "_value": {
        "_point": {"_latitude": 51.5, "_longitude": -0.1}}}}])
    assert ids == ["d1", "d3", "d0", "d2"]


def test_string_metric_sort(ddb):
    # levenshtein distance to "alphaz": alpha closest
    ids = ids_sorted(ddb, [{"name": {"_order": "asc", "_value": "alphaz",
                                     "_metric": "levenshtein"}}])
    assert ids[0] == "d0"
    # jaro-winkler alias parses too
    ids = ids_sorted(ddb, [{"name": {"_order": "asc", "_value": "bet",
                                     "_metric": "jarowinkler"}}])
    assert ids[0] == "d1"


def test_distance_sort_parse_shapes(ddb):
    s = parse_sort(ddb.schema, [{"price": {"_value": 50}}])
    assert s[0][0] == "dist" and s[0][3] == 50.0
    s = parse_sort(ddb.schema, [{"name": {"_value": "x"}}])
    assert s[0][0] == "strmetric"   # defaults to levenshtein
