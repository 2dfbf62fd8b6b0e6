"""Geo filter functions (reference: types/geofilter.go — near/within/
contains/intersects backed by S2 cell indexes, types/s2index.go).

Spark-first: geometries are GeoJSON strings; points are parsed with
from_json (JVM-side); haversine distance is a pure column expression, so
`near` runs fully inside codegen. Polygon point-in-poly (within/
contains) is an Arrow-batched pandas UDF (ray casting over numpy) — the
one genuinely non-relational kernel. No S2 prefilter is needed for
correctness (Spark evaluates exactly; SURVEY.md §4 lossy-index row);
at 100 TB one would add a geohash bucketing column as a pre-join key.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EARTH_RADIUS_M = 6_371_000.0

_POINT_SCHEMA = "type string, coordinates array<double>"


def point_coords(col: Column) -> Column:
    """GeoJSON point string -> struct(lon, lat)."""
    parsed = F.from_json(col, _POINT_SCHEMA)
    return F.struct(
        parsed["coordinates"][0].alias("lon"), parsed["coordinates"][1].alias("lat")
    )


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters, pure column expression."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = rl2 - rl1
    dlon = F.radians(lon2) - F.radians(lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlon / 2) ** 2
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def _hav_m(lon1, lat1, lon2, lat2) -> float:
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat, dlon = rl2 - rl1, math.radians(lon2) - math.radians(lon1)
    a = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(min(1.0, math.sqrt(a)))


def _pt_seg_m(lon, lat, a, b) -> float:
    """Point-to-segment distance in meters (local equirectangular
    projection — exact enough at the scales the filter compares)."""
    kx = 111_320.0 * math.cos(math.radians(lat))
    ky = 110_540.0
    px, py = lon * kx, lat * ky
    ax, ay = a[0] * kx, a[1] * ky
    bx, by = b[0] * kx, b[1] * ky
    dx, dy = bx - ax, by - ay
    if dx == dy == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def near(col: Column, lon: float, lat: float, max_meters: float) -> Column:
    """near(geo, [lon,lat], dist) (types/geofilter.go:33,75,187): stored
    points within distance; stored polygons match when the point is
    inside OR within distance of the boundary (the reference builds a
    circle ("cap") and tests intersection)."""

    @pandas_udf("boolean")
    def _near(vals: pd.Series) -> pd.Series:
        out = []
        for v in vals:
            if v is None:
                out.append(False)
                continue
            g = json.loads(v)
            t = g.get("type")
            if t == "Point":
                c = g["coordinates"]
                out.append(_hav_m(lon, lat, c[0], c[1]) <= max_meters)
                continue
            rings = _geom_rings(g)
            hit = any(_ray_cast(lon, lat, r) for r in _outer_rings(g))
            if not hit:
                for r in rings:
                    n = len(r)
                    if any(_pt_seg_m(lon, lat, r[i], r[(i + 1) % n]) <= max_meters
                           for i in range(n)):
                        hit = True
                        break
            out.append(hit)
        return pd.Series(out)

    return _near(col)


def _ray_cast(lon: float, lat: float, ring: list) -> bool:
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        if (y1 > lat) != (y2 > lat):
            xin = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < xin:
                inside = not inside
    return inside


def _geom_points(geom: dict) -> list:
    t = geom.get("type")
    if t == "Point":
        return [geom["coordinates"]]
    if t == "Polygon":
        return [pt for ring in geom["coordinates"] for pt in ring]
    if t == "MultiPolygon":
        return [pt for poly in geom["coordinates"] for ring in poly for pt in ring]
    return []


def _outer_rings(g: dict) -> list:
    """Outer ring(s) of a polygon/multipolygon geometry."""
    t = g.get("type")
    if t == "Polygon":
        return [g["coordinates"][0]]
    if t == "MultiPolygon":
        return [p[0] for p in g["coordinates"]]
    return []


def _on_ring(lon: float, lat: float, ring: list) -> bool:
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        if (_orient(a[0], a[1], b[0], b[1], lon, lat) == 0
                and _on_seg(a[0], a[1], b[0], b[1], lon, lat)):
            return True
    return False


def _in_any(lon: float, lat: float, rings: list) -> bool:
    # boundary counts as inside (s2 loops include their boundary)
    return any(_ray_cast(lon, lat, r) or _on_ring(lon, lat, r) for r in rings)


def within(col: Column, query_geojson: str) -> Column:
    """within(geo, poly): stored geometry fully inside the query
    polygon/multipolygon (types/geofilter.go:27,85,173). Points: inside
    test; polygons: every vertex inside (the reference's loop-contains
    check on s2 loops)."""
    qrings = _outer_rings(json.loads(query_geojson))

    @pandas_udf("boolean")
    def _within(vals: pd.Series) -> pd.Series:
        out = []
        for v in vals:
            if v is None:
                out.append(False)
                continue
            pts = _geom_points(json.loads(v))
            out.append(bool(pts) and all(_in_any(p[0], p[1], qrings) for p in pts))
        return pd.Series(out)

    return _within(col)


def geo_contains(col: Column, query_geojson: str) -> Column:
    """contains(geo, arg): stored polygon contains the query point or
    every vertex of the query polygon (types/geofilter.go:29,95,182)."""
    q = json.loads(query_geojson)
    if q.get("type") == "Point":
        qpts = [q["coordinates"]]
    else:
        qpts = [p for r in _outer_rings(q) for p in r]

    @pandas_udf("boolean")
    def _contains(vals: pd.Series) -> pd.Series:
        out = []
        for v in vals:
            if v is None:
                out.append(False)
                continue
            rings = _outer_rings(json.loads(v))
            out.append(bool(rings) and bool(qpts)
                       and all(_in_any(p[0], p[1], rings) for p in qpts))
        return pd.Series(out)

    return _contains(col)


def _orient(ax, ay, bx, by, cx, cy) -> int:
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return 0 if v == 0 else (1 if v > 0 else -1)


def _on_seg(ax, ay, bx, by, px, py) -> bool:
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _seg_cross(a1, a2, b1, b2) -> bool:
    """Proper or degenerate segment-segment intersection (orientation
    test, the standard CCW predicate)."""
    o1 = _orient(a1[0], a1[1], a2[0], a2[1], b1[0], b1[1])
    o2 = _orient(a1[0], a1[1], a2[0], a2[1], b2[0], b2[1])
    o3 = _orient(b1[0], b1[1], b2[0], b2[1], a1[0], a1[1])
    o4 = _orient(b1[0], b1[1], b2[0], b2[1], a2[0], a2[1])
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and _on_seg(a1[0], a1[1], a2[0], a2[1], b1[0], b1[1]):
        return True
    if o2 == 0 and _on_seg(a1[0], a1[1], a2[0], a2[1], b2[0], b2[1]):
        return True
    if o3 == 0 and _on_seg(b1[0], b1[1], b2[0], b2[1], a1[0], a1[1]):
        return True
    return o4 == 0 and _on_seg(b1[0], b1[1], b2[0], b2[1], a2[0], a2[1])


def _rings_cross(ring_a: list, ring_b: list) -> bool:
    na, nb = len(ring_a), len(ring_b)
    for i in range(na):
        a1, a2 = ring_a[i], ring_a[(i + 1) % na]
        for j in range(nb):
            if _seg_cross(a1, a2, ring_b[j], ring_b[(j + 1) % nb]):
                return True
    return False


def _geom_rings(g: dict) -> list:
    if g.get("type") == "Polygon":
        return list(g["coordinates"])
    if g.get("type") == "MultiPolygon":
        return [r for p in g["coordinates"] for r in p]
    return []


def intersects(col: Column, polygon_geojson: str) -> Column:
    """intersects(geo, poly) (types/geofilter.go:31,105,194): true when
    any vertex of either geometry lies inside the other, OR any boundary
    segments cross — the full polygon-intersection predicate (catches
    crossing polygons whose vertices are all mutually outside)."""
    qrings = _outer_rings(json.loads(polygon_geojson))

    @pandas_udf("boolean")
    def _intersects(vals: pd.Series) -> pd.Series:
        out = []
        for v in vals:
            if v is None:
                out.append(False)
                continue
            g = json.loads(v)
            pts = _geom_points(g)
            hit = any(_in_any(p[0], p[1], qrings) for p in pts)
            rings = _geom_rings(g)
            if not hit and rings:
                hit = any(_in_any(q[0], q[1], rings)
                          for qr in qrings for q in qr)
            if not hit:
                hit = any(_rings_cross(r, qr) for r in rings for qr in qrings)
            out.append(hit)
        return pd.Series(out)

    return _intersects(col)
