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


# --- datum transforms (cartesian.cc:66-153 map_datums; toWGS84 :299) ---------

def test_datum_roundtrip_geocentric():
    from xapiand_tpu.geo import datum as D

    for lat, lon, h in [(51.5, -0.1, 0.0), (-33.9, 151.2, 45.0),
                        (89.9, 10.0, 0.0), (0.0, 0.0, 0.0),
                        (-0.001, 179.999, -30.0)]:
        x, y, z = D.geodetic_to_geocentric(lat, lon, h, "WE")
        la, lo, hh = D.geocentric_to_geodetic(x, y, z, "WE")
        assert abs(la - lat) < 1e-9 and abs(lo - lon) < 1e-9
        assert abs(hh - h) < 1e-4


def test_datum_shift_magnitudes():
    """Helmert shifts land in the publicly-known ranges: OSGB36→WGS84
    ~120 m in southern England, NAD27→WGS84 tens of metres in CONUS,
    TOYA→WGS84 hundreds of metres in Japan."""
    import math

    from xapiand_tpu.geo import datum as D

    def shift_m(srid, lat, lon):
        la, lo, _ = D.to_wgs84(lat, lon, 0.0, srid)
        dlat = (la - lat) * 111320.0
        dlon = (lo - lon) * 111320.0 * math.cos(math.radians(lat))
        return math.hypot(dlat, dlon)

    assert 80 < shift_m(4277, 51.0, -1.0) < 200      # OSGB36
    assert 10 < shift_m(4267, 40.0, -100.0) < 300    # NAD27
    assert 300 < shift_m(4301, 35.7, 139.7) < 900    # Tokyo
    assert shift_m(4326, 40.0, -100.0) == 0.0        # WGS84 passthrough
    # every SRID in the table converts without error
    for srid in D.DATUMS:
        D.to_wgs84(45.0, 9.0, 0.0, srid)


def test_ewkt_srid_datum_transform():
    import math

    from xapiand_tpu.geo import datum as D
    from xapiand_tpu.geo import ewkt

    base = ewkt.parse("SRID=4326;POINT (-1.0 51.0)")
    shifted = ewkt.parse("SRID=4277;POINT (-1.0 51.0)")
    la, lo, _ = D.to_wgs84(51.0, -1.0, 0.0, 4277)
    assert abs(shifted._lat - la) < 1e-12
    assert abs(shifted._lon - lo) < 1e-12
    assert (abs(shifted._lat - base._lat) > 1e-5
            or abs(shifted._lon - base._lon) > 1e-5)
    # SRID prefix propagates into GEOMETRYCOLLECTION members
    coll = ewkt.parse(
        "SRID=4277;GEOMETRYCOLLECTION (POINT (-1.0 51.0))")
    assert abs(coll.regions[0]._lat - la) < 1e-12
    # polygons transform every vertex
    poly4326 = ewkt.parse("POLYGON ((-1 51, -1 52, -2 52, -2 51))")
    poly4277 = ewkt.parse("SRID=4277;POLYGON ((-1 51, -1 52, -2 52, -2 51))")
    assert type(poly4326) is type(poly4277)
    # unknown SRID still rejected
    try:
        ewkt.parse("SRID=9999;POINT (0 0)")
        assert False, "unknown SRID must raise"
    except ewkt.EWKTError:
        pass
