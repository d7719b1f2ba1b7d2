"""Geospatial tests (mirrors oldtests/test_geospatial.cc intent: HTM ids,
covers, EWKT parsing, containment)."""

import math

import pytest

from xapiand_tpu.geo import cartesian as C
from xapiand_tpu.geo import ewkt, geospatial, htm


def test_cartesian_roundtrip():
    for lat, lon in [(0, 0), (40.7, -74.0), (-33.9, 151.2), (89.0, 10.0)]:
        v = C.toCartesian(lat, lon)
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-12)
        lat2, lon2 = C.toLatLon(v)
        assert math.isclose(lat, lat2, abs_tol=1e-9)
        assert math.isclose(lon, lon2, abs_tol=1e-9)


def test_point_to_trixel_is_stable_and_in_range():
    tid = htm.point_to_trixel(40.7128, -74.0060)
    assert 8 * 4 ** htm.MAX_LEVEL <= tid < 16 * 4 ** htm.MAX_LEVEL
    assert tid < 2 ** 31  # fits int32 (device requirement)
    assert htm.point_to_trixel(40.7128, -74.0060) == tid


def test_nearby_points_share_coarse_ancestor():
    a = htm.point_to_trixel(40.7128, -74.0060)
    b = htm.point_to_trixel(40.7129, -74.0061)
    assert htm.ancestor(a, htm.MAX_LEVEL, 5) == htm.ancestor(b, htm.MAX_LEVEL, 5)
    far = htm.point_to_trixel(-33.9, 151.2)
    assert htm.ancestor(a, htm.MAX_LEVEL, 2) != htm.ancestor(far, htm.MAX_LEVEL, 2)


def test_cap_cover_contains_point():
    cap = htm.Cap(40.0, -100.0, C.metres_to_radians(50000))
    ranges = htm.cover(cap, level=10)
    assert ranges
    tid = htm.point_to_trixel(40.0, -100.0)
    assert any(s <= tid <= e for s, e in ranges)
    # point 500km away must not be covered
    far = htm.point_to_trixel(44.5, -100.0)
    assert not any(s <= far <= e for s, e in ranges)


def test_polygon_cover():
    poly = htm.ConvexPolygon([(40.0, -100.0), (40.0, -99.0),
                              (41.0, -99.0), (41.0, -100.0)])
    ranges = htm.cover(poly, level=8)
    inside = htm.point_to_trixel(40.5, -99.5)
    assert any(s <= inside <= e for s, e in ranges)
    outside = htm.point_to_trixel(45.0, -99.5)
    assert not any(s <= outside <= e for s, e in ranges)


def test_ranges_intersect():
    assert htm.ranges_intersect([(1, 5), (10, 20)], [(6, 12)])
    assert not htm.ranges_intersect([(1, 5)], [(6, 12)])


def test_ewkt_point_circle():
    assert ewkt.is_ewkt("POINT (-74.0 40.7)")
    assert ewkt.is_ewkt("SRID=4326;CIRCLE (-100 40, 1000)")
    assert not ewkt.is_ewkt("hello world")
    r = ewkt.parse("CIRCLE (-100 40, 10000)")
    assert isinstance(r, htm.Cap)
    lat, lon = r.centroid_latlon()
    assert (lat, lon) == (40.0, -100.0)


def test_ewkt_polygon_and_collection():
    r = ewkt.parse("POLYGON ((-100 40, -99 40, -99 41, -100 41, -100 40))")
    assert isinstance(r, htm.ConvexPolygon)
    r = ewkt.parse("GEOMETRYCOLLECTION (POINT (-100 40), CIRCLE (-99 41, 500))")
    assert isinstance(r, htm.MultiRegion) and len(r.regions) == 2


def test_extract_forms():
    for v in (
        "POINT (-74.0060 40.7128)",
        {"_point": {"_longitude": -74.0060, "_latitude": 40.7128}},
        {"type": "Point", "coordinates": [-74.0060, 40.7128]},
        [-74.0060, 40.7128],
    ):
        ranges, (lat, lon) = geospatial.extract(v)
        assert ranges
        assert lat == pytest.approx(40.7128, abs=1e-6)
        assert lon == pytest.approx(-74.0060, abs=1e-6)


def test_extract_circle_covers_interior_point():
    ranges, _ = geospatial.extract(
        {"_circle": {"_longitude": -100.0, "_latitude": 40.0, "_radius": 20000}})
    tid = htm.point_to_trixel(40.05, -100.05)
    assert any(s <= tid <= e for s, e in ranges)
