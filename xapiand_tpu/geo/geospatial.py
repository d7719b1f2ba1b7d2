"""GeoSpatial extraction: MsgPack/GeoJSON-ish values -> HTM ranges + centroid.

Reference parity target: src/geospatial/geospatial.{h,cc} (GeoSpatial class
extracting _point/_circle/_polygon/... objects from document values).

Accepted forms:
  EWKT string                          "CIRCLE (-100 40, 1000)"
  {"_point": {"_longitude": .., "_latitude": ..}}
  {"_circle": {"_longitude": .., "_latitude": .., "_radius": metres}}
  {"_polygon": {"_longitude": [..], "_latitude": [..]}}
  {"_multipoint": ...}, {"_multicircle": ...}
  GeoJSON: {"type": "Point", "coordinates": [lon, lat]}, Polygon, MultiPoint
  [lon, lat] bare pair
"""

from __future__ import annotations

from xapiand_tpu.geo import cartesian as C
from xapiand_tpu.geo import ewkt, htm


class GeoError(ValueError):
    pass


def to_region(value) -> htm.Region:
    if isinstance(value, str):
        return ewkt.parse(value)
    if isinstance(value, (list, tuple)) and len(value) == 2 and all(
            isinstance(v, (int, float)) for v in value):
        lon, lat = value
        return htm.Cap(lat, lon, ewkt._point_radius())
    if isinstance(value, dict):
        if "_point" in value:
            p = value["_point"]
            return htm.Cap(p["_latitude"], p["_longitude"], ewkt._point_radius())
        if "_circle" in value:
            p = value["_circle"]
            return htm.Cap(p["_latitude"], p["_longitude"],
                           C.metres_to_radians(float(p["_radius"])))
        if "_polygon" in value or "_chull" in value:
            p = value.get("_polygon") or value.get("_chull")
            lats, lons = p["_latitude"], p["_longitude"]
            return htm.ConvexPolygon(list(zip(lats, lons)))
        if "_multipoint" in value:
            p = value["_multipoint"]
            return htm.MultiRegion([
                htm.Cap(lat, lon, ewkt._point_radius())
                for lat, lon in zip(p["_latitude"], p["_longitude"])])
        if "_multicircle" in value:
            p = value["_multicircle"]
            return htm.MultiRegion([
                htm.Cap(lat, lon, C.metres_to_radians(float(p["_radius"])))
                for lat, lon in zip(p["_latitude"], p["_longitude"])])
        t = str(value.get("type", "")).lower()
        coords = value.get("coordinates")
        if t == "point" and coords:
            return htm.Cap(coords[1], coords[0], ewkt._point_radius())
        if t == "polygon" and coords:
            ring = coords[0]
            pts = [(lat, lon) for lon, lat in ring]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            return htm.ConvexPolygon(pts)
        if t == "multipoint" and coords:
            return htm.MultiRegion([
                htm.Cap(lat, lon, ewkt._point_radius()) for lon, lat in coords])
        if t == "circle" and coords:
            return htm.Cap(coords[1], coords[0],
                           C.metres_to_radians(float(value.get("radius", 1.0))))
    raise GeoError(f"cannot interpret geo value: {value!r}")


def extract(value, error: float = 0.3) -> tuple[list[tuple[int, int]],
                                                tuple[float, float]]:
    """value -> (level-MAX HTM id ranges, centroid (lat, lon)).

    ``error`` mirrors the reference's HTM error knob (htm.h:39-51); smaller
    error -> deeper cover level. We map it onto a level cap."""
    region = to_region(value)
    level = htm.MAX_LEVEL
    if error >= 0.5:
        level = max(6, htm.MAX_LEVEL - 4)
    elif error >= 0.2:
        level = max(8, htm.MAX_LEVEL - 2)
    ranges = htm.cover(region, level=level)
    return ranges, region.centroid_latlon()
