"""IP field type, _ip_range / _geo_ip / _geo_trixels aggregations.

These three aggregation names are reserved-but-disabled in the reference
(src/aggregations/aggregations.cc:82-87 commented out); the semantics here
are this build's (documented in xapiand_tpu/aggregations.py).
"""

import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.geo import htm
from xapiand_tpu.utils import iputils

IPDOCS = [
    {"addr": {"_type": "ip", "_value": "10.0.0.5"}, "bytes": 100.0},
    {"addr": {"_type": "ip", "_value": "10.0.1.7"}, "bytes": 200.0},
    {"addr": {"_type": "ip", "_value": "192.168.1.1"}, "bytes": 300.0},
    {"addr": {"_type": "ip", "_value": "192.168.1.2"}, "bytes": 400.0},
    {"addr": {"_type": "ip", "_value": "8.8.8.8"}, "bytes": 500.0},
    {"bytes": 999.0},                                  # no addr
]


@pytest.fixture(scope="module")
def ipdb():
    db = Database()
    for i, d in enumerate(IPDOCS):
        db.index_document(dict(d), doc_id=f"d{i}")
    db.commit()
    return db


def test_ip_parse():
    assert iputils.parse_ip("1.2.3.4") == float((1 << 24) + (2 << 16)
                                                + (3 << 8) + 4)
    lo, hi = iputils.parse_ip_interval("10.0.0.0/24")
    assert hi - lo == 256
    lo6, hi6 = iputils.parse_ip_interval("2001:db8::/32")
    assert hi6 > lo6


def test_ip_exact_term_query(ipdb):
    res = ipdb.search({"addr": "192.168.1.1"}, k=10)
    assert len(res.hits) == 1
    assert res.hits[0].data["bytes"] == 300.0


def test_ip_cidr_query(ipdb):
    res = ipdb.search({"addr": "10.0.0.0/16"}, k=10)
    assert len(res.hits) == 2
    res = ipdb.search({"addr": "192.168.0.0/16"}, k=10)
    assert len(res.hits) == 2
    res = ipdb.search({"addr": "8.0.0.0/8"}, k=10)
    assert len(res.hits) == 1


def test_ip_range_query(ipdb):
    res = ipdb.search({"addr": {"_range": {"_from": "10.0.0.0",
                                           "_to": "10.255.255.255"}}}, k=10)
    assert len(res.hits) == 2


def test_ip_range_agg(ipdb):
    res = ipdb.search({"_match_all": {}}, k=0, aggs={"nets": {
        "_ip_range": {"_field": "addr", "_ranges": [
            {"_key": "ten", "_cidr": "10.0.0.0/8"},
            {"_key": "private192", "_from": "192.168.0.0",
             "_to": "192.169.0.0"},
            {"_key": "all4", "_from": "0.0.0.0"},
        ]}}})
    buckets = {b["_key"]: b["_doc_count"] for b in res.aggregations["nets"]}
    assert buckets == {"ten": 2, "private192": 2, "all4": 5}


def test_ip_range_agg_with_subs(ipdb):
    res = ipdb.search({"_match_all": {}}, k=0, aggs={"nets": {
        "_ip_range": {"_field": "addr", "_ranges": [
            {"_key": "ten", "_cidr": "10.0.0.0/8"}]},
        "_aggs": {"total": {"_sum": {"_field": "bytes"}}}}})
    b = res.aggregations["nets"][0]
    assert b["_doc_count"] == 2
    assert b["total"]["_sum"] == pytest.approx(300.0)


def test_geo_ip_agg(ipdb):
    res = ipdb.search({"_match_all": {}}, k=0, aggs={"locs": {
        "_geo_ip": {"_field": "addr", "_networks": [
            {"_key": "dc-a", "_cidrs": ["10.0.0.0/8", "8.8.8.0/24"]},
            {"_key": "office", "_cidrs": ["192.168.0.0/16"]},
        ]},
        "_aggs": {"total": {"_sum": {"_field": "bytes"}}}}})
    buckets = {b["_key"]: b for b in res.aggregations["locs"]}
    assert buckets["dc-a"]["_doc_count"] == 3
    assert buckets["dc-a"]["total"]["_sum"] == pytest.approx(800.0)
    assert buckets["office"]["_doc_count"] == 2
    assert buckets["office"]["total"]["_sum"] == pytest.approx(700.0)


def test_ipv6_ordering_and_cidr():
    db = Database()
    db.index_document({"a": {"_type": "ip", "_value": "2001:db8::1"}},
                      doc_id="a")
    db.index_document({"a": {"_type": "ip", "_value": "2001:db9::1"}},
                      doc_id="b")
    db.commit()
    res = db.search({"a": "2001:db8::/32"}, k=10)
    assert [h.id for h in res.hits] == ["a"]


GEODOCS = [
    {"name": "nyc1", "loc": {"_point": {"_latitude": 40.7128,
                                        "_longitude": -74.0060}}},
    {"name": "nyc2", "loc": {"_point": {"_latitude": 40.7130,
                                        "_longitude": -74.0062}}},
    {"name": "sydney", "loc": {"_point": {"_latitude": -33.87,
                                          "_longitude": 151.21}}},
    {"name": "nowhere"},                               # no loc
]


@pytest.fixture(scope="module")
def geodb():
    db = Database()
    for i, d in enumerate(GEODOCS):
        db.index_document(dict(d), doc_id=f"g{i}")
    db.commit()
    return db


def _expected_trixel(lat, lon, level):
    # buckets key on the FIRST indexed level-13 range's start trixel
    # (point covers span a few level-13 trixels around the point, so at
    # levels coarser than the cover this equals the point's own trixel)
    from xapiand_tpu.geo import geospatial

    ranges, _ = geospatial.extract(
        {"_point": {"_latitude": lat, "_longitude": lon}})
    tid = ranges[0][0] >> (2 * (htm.MAX_LEVEL - level))
    return htm.trixel_name(tid, level)


def test_geo_trixels_agg(geodb):
    res = geodb.search({"_match_all": {}}, k=0, aggs={"tiles": {
        "_geo_trixels": {"_field": "loc", "_level": 5}}})
    buckets = {b["_key"]: b["_doc_count"] for b in res.aggregations["tiles"]}
    nyc = _expected_trixel(40.7128, -74.0060, 5)
    syd = _expected_trixel(-33.87, 151.21, 5)
    assert buckets[nyc] == 2
    assert buckets[syd] == 1
    assert sum(buckets.values()) == 3                  # "nowhere" excluded


def test_geo_trixels_device_level(geodb):
    # at device level (13, ~1km trixels) the two nyc points (~25m apart)
    # still share a trixel; keys must match point_to_trixel exactly
    res = geodb.search({"_match_all": {}}, k=0, aggs={"tiles": {
        "_geo_trixels": {"_field": "loc", "_level": 13}}})
    buckets = {b["_key"]: b["_doc_count"] for b in res.aggregations["tiles"]}
    assert buckets[_expected_trixel(40.7128, -74.0060, 13)] == 2
    assert buckets[_expected_trixel(-33.87, 151.21, 13)] == 1


def test_geo_trixels_respects_query(geodb):
    res = geodb.search({"name": "sydney"}, k=0, aggs={"tiles": {
        "_geo_trixels": {"_field": "loc", "_level": 5}}})
    buckets = {b["_key"]: b["_doc_count"] for b in res.aggregations["tiles"]}
    assert buckets == {_expected_trixel(-33.87, 151.21, 5): 1}


# --- cardinality HLL merge across segments/shards --------------------------

def test_cardinality_multi_segment_small_exact():
    # values repeat across two segments: the sum (old upper bound) would
    # be 6; the HLL-merged, bound-clamped result is the true 4
    db = Database()
    for i, v in enumerate([1, 2, 3]):
        db.index_document({"v": v}, doc_id=f"a{i}")
    db.commit()
    for i, v in enumerate([2, 3, 4]):
        db.index_document({"v": v}, doc_id=f"b{i}")
    db.commit()
    res = db.search({"_match_all": {}}, k=0,
                    aggs={"c": {"_cardinality": {"_field": "v"}}})
    assert res.aggregations["c"]["_cardinality"] == 4


def test_cardinality_multi_segment_accuracy():
    # 1500 distinct ints, half shared between the two segments: estimate
    # must land within HLL(m=1024) error (~3.2% -> allow 10%)
    db = Database()
    for i in range(1000):
        db.index_document({"v": i}, doc_id=f"a{i}")
    db.commit()
    for i in range(500, 1500):
        db.index_document({"v": i}, doc_id=f"b{i}")
    db.commit()
    res = db.search({"_match_all": {}}, k=0,
                    aggs={"c": {"_cardinality": {"_field": "v"}}})
    est = res.aggregations["c"]["_cardinality"]
    assert abs(est - 1500) / 1500 < 0.10
    # rigorous bounds always hold
    assert 1000 <= est <= 2000


def test_ipv6_cidr_finer_than_float53_matches_bucket():
    # ADVICE r2 (medium): '2001:db8::/64' used to parse to an INVERTED key
    # range (float64 ulp at 2^125 is 2^72 > 2^64 addresses) and silently
    # matched nothing. ip_interval_keys clamps to the enclosing float-
    # resolution bucket instead.
    db = Database()
    db.index_document({"addr": {"_type": "ip", "_value": "2001:db8::1"}},
                      doc_id="v6")
    db.index_document({"addr": {"_type": "ip", "_value": "10.0.0.1"}},
                      doc_id="v4")
    db.commit()
    res = db.search({"addr": "2001:db8::/64"}, k=10)
    assert [h.id for h in res.hits] == ["v6"]
    # the clamped agg bucket counts it too
    res = db.search({"_match_all": {}}, k=0, aggs={"nets": {
        "_ip_range": {"_field": "addr", "_ranges": [
            {"_key": "db8", "_cidr": "2001:db8::/64"}]}}})
    assert res.aggregations["nets"][0]["_doc_count"] == 1


def test_extended_stats_sigma_bounds():
    """_extended_stats returns _std_deviation_bounds at mean +- _sigma*std
    (metrics.h:752 RESERVED_AGGS_SIGMA, default 2)."""
    import math
    db = Database()
    vals = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]   # mean 5, std 2
    for i, v in enumerate(vals):
        db.index_document({"v": v, "g": "a"}, doc_id=str(i))
    db.commit()
    res = db.search({"_match_all": {}}, k=0, aggs={
        "st": {"_extended_stats": {"_field": "v"}},
        "st3": {"_extended_stats": {"_field": "v", "_sigma": 3}}})
    st = res.aggregations["st"]
    assert math.isclose(st["_avg"], 5.0)
    assert math.isclose(st["_std_deviation"], 2.0)
    b = st["_std_deviation_bounds"]
    assert math.isclose(b["_upper"], 9.0) and math.isclose(b["_lower"], 1.0)
    b3 = res.aggregations["st3"]["_std_deviation_bounds"]
    assert math.isclose(b3["_upper"], 11.0) and math.isclose(b3["_lower"],
                                                             -1.0)
    # as a bucket sub-aggregation too
    res = db.search({"_match_all": {}}, k=0, aggs={
        "byg": {"_terms": {"_field": "g"},
                "_aggs": {"st": {"_extended_stats": {"_field": "v",
                                                     "_sigma": 1}}}}})
    sub = res.aggregations["byg"][0]["st"]["_std_deviation_bounds"]
    assert math.isclose(sub["_upper"], 7.0)
    with pytest.raises(Exception):
        db.search({"_match_all": {}}, k=0, aggs={
            "bad": {"_extended_stats": {"_field": "v", "_sigma": -1}}})


def test_bucket_sort_order_object_form():
    """_sort accepts both {"_doc_count": "desc"} and the object form
    {"_doc_count": {"_order": "desc"}} (bucket.h:244)."""
    db = Database()
    for i in range(6):
        db.index_document({"g": "x" if i < 4 else "y"}, doc_id=str(i))
    db.commit()
    res = db.search({"_match_all": {}}, k=0, aggs={
        "t": {"_terms": {"_field": "g",
                         "_sort": {"_doc_count": {"_order": "asc"}}}}})
    assert [b["_key"] for b in res.aggregations["t"]] == ["y", "x"]
