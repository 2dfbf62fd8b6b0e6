"""Geo filter functions (reference: types/geofilter.go — near/within/
contains/intersects backed by S2 cell indexes, types/s2index.go).

Spark-first: geometries are GeoJSON strings; points are parsed with
from_json (JVM-side); haversine distance is a pure column expression, so
`near` on points runs fully inside codegen. Polygon predicates are
Arrow-batched pandas UDFs whose kernels are numpy array ops — the whole
batch's vertices/segments are flattened into arrays and tested against
the (constant) query geometry in a handful of vectorized expressions, no
per-row Python loops over edges. No S2 prefilter is needed for
correctness (Spark evaluates exactly; SURVEY.md §4 lossy-index row); at
100 TB one would add a geohash bucketing column as a pre-join key.
"""

from __future__ import annotations

import json
import math

import numpy as np
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


# --------------------------------------------------------- geometry access
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


def _geom_rings(g: dict) -> list:
    if g.get("type") == "Polygon":
        return list(g["coordinates"])
    if g.get("type") == "MultiPolygon":
        return [r for p in g["coordinates"] for r in p]
    return []


# -------------------------------------------------------- numpy kernels
def _ring_edges(ring: list) -> tuple:
    """Closed ring -> per-edge endpoint arrays (x1, y1, x2, y2)."""
    r = np.asarray(ring, dtype=np.float64)
    x1, y1 = r[:, 0], r[:, 1]
    return x1, y1, np.roll(x1, -1), np.roll(y1, -1)


def _np_in_rings(px: np.ndarray, py: np.ndarray, rings: list) -> np.ndarray:
    """Boundary-inclusive point-in-any-ring for N points at once:
    ray cast (odd crossing parity) OR collinear-on-edge, each an
    (N, edges) broadcast — no per-point Python loop."""
    inside = np.zeros(px.shape[0], dtype=bool)
    PX, PY = px[:, None], py[:, None]
    for ring in rings:
        if len(ring) < 3:
            continue
        x1, y1, x2, y2 = _ring_edges(ring)
        cross = (y1 > PY) != (y2 > PY)
        dy = y2 - y1
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = (x2 - x1) * (PY - y1) / np.where(dy == 0, 1.0, dy) + x1
        odd = (cross & (PX < xin)).sum(axis=1) % 2 == 1
        # boundary counts as inside (s2 loops include their boundary)
        v = (x2 - x1) * (PY - y1) - (y2 - y1) * (PX - x1)
        onb = (
            (v == 0)
            & (PX >= np.minimum(x1, x2)) & (PX <= np.maximum(x1, x2))
            & (PY >= np.minimum(y1, y2)) & (PY <= np.maximum(y1, y2))
        ).any(axis=1)
        inside |= odd | onb
    return inside


def _np_min_seg_dist_m(lon: float, lat: float, rings: list) -> float:
    """Min point-to-segment distance in meters over every edge of every
    ring (local equirectangular projection, one vectorized pass)."""
    kx = 111_320.0 * math.cos(math.radians(lat))
    ky = 110_540.0
    best = math.inf
    px, py = lon * kx, lat * ky
    for ring in rings:
        if len(ring) < 2:
            continue
        x1, y1, x2, y2 = _ring_edges(ring)
        ax, ay, bx, by = x1 * kx, y1 * ky, x2 * kx, y2 * ky
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        t = np.clip(
            ((px - ax) * dx + (py - ay) * dy) / np.where(l2 == 0, 1.0, l2), 0.0, 1.0
        )
        t = np.where(l2 == 0, 0.0, t)
        d = np.hypot(px - (ax + t * dx), py - (ay + t * dy))
        if d.size:
            best = min(best, float(d.min()))
    return best


def _segments_of(rings: list) -> tuple:
    """All rings -> flat per-edge arrays (x1, y1, x2, y2)."""
    xs1, ys1, xs2, ys2 = [], [], [], []
    for ring in rings:
        if len(ring) < 2:
            continue
        x1, y1, x2, y2 = _ring_edges(ring)
        xs1.append(x1); ys1.append(y1); xs2.append(x2); ys2.append(y2)
    if not xs1:
        z = np.empty(0, dtype=np.float64)
        return z, z, z, z
    return (np.concatenate(xs1), np.concatenate(ys1),
            np.concatenate(xs2), np.concatenate(ys2))


def _np_any_seg_cross(a_rings: list, qx1, qy1, qx2, qy2) -> bool:
    """Any proper/degenerate segment intersection between the edges of
    ``a_rings`` (S edges) and the query edges (Q) — one (S, Q) broadcast
    of the standard CCW orientation predicate."""
    ax1, ay1, ax2, ay2 = _segments_of(a_rings)
    if ax1.size == 0 or qx1.size == 0:
        return False
    A1x, A1y = ax1[:, None], ay1[:, None]
    A2x, A2y = ax2[:, None], ay2[:, None]
    B1x, B1y = qx1[None, :], qy1[None, :]
    B2x, B2y = qx2[None, :], qy2[None, :]

    def orient(ax, ay, bx, by, cx, cy):
        return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))

    def on_seg(ax, ay, bx, by, px, py):
        return (
            (px >= np.minimum(ax, bx)) & (px <= np.maximum(ax, bx))
            & (py >= np.minimum(ay, by)) & (py <= np.maximum(ay, by))
        )

    o1 = orient(A1x, A1y, A2x, A2y, B1x, B1y)
    o2 = orient(A1x, A1y, A2x, A2y, B2x, B2y)
    o3 = orient(B1x, B1y, B2x, B2y, A1x, A1y)
    o4 = orient(B1x, B1y, B2x, B2y, A2x, A2y)
    hit = ((o1 != o2) & (o3 != o4))
    hit |= (o1 == 0) & on_seg(A1x, A1y, A2x, A2y, B1x, B1y)
    hit |= (o2 == 0) & on_seg(A1x, A1y, A2x, A2y, B2x, B2y)
    hit |= (o3 == 0) & on_seg(B1x, B1y, B2x, B2y, A1x, A1y)
    hit |= (o4 == 0) & on_seg(B1x, B1y, B2x, B2y, A2x, A2y)
    return bool(hit.any())


def _flatten_points(geoms: list) -> tuple:
    """Parsed geometries -> (row_idx, px, py) arrays over every vertex."""
    idx, px, py = [], [], []
    for i, g in enumerate(geoms):
        if g is None:
            continue
        for p in _geom_points(g):
            idx.append(i); px.append(p[0]); py.append(p[1])
    return (np.asarray(idx, dtype=np.int64),
            np.asarray(px, dtype=np.float64),
            np.asarray(py, dtype=np.float64))


# ---------------------------------------------------------- filter columns
def near(col: Column, lon: float, lat: float, max_meters: float) -> Column:
    """near(geo, [lon,lat], dist) (types/geofilter.go:33,75,187): stored
    points within distance; stored polygons match when the point is
    inside OR within distance of the boundary (the reference builds a
    circle ("cap") and tests intersection)."""

    @pandas_udf("boolean")
    def _near(vals: pd.Series) -> pd.Series:
        geoms = [None if v is None else json.loads(v) for v in vals]
        out = np.zeros(len(geoms), dtype=bool)
        # vectorize the (common) point rows in one haversine pass
        pt_idx = [i for i, g in enumerate(geoms) if g and g.get("type") == "Point"]
        if pt_idx:
            c = np.asarray([geoms[i]["coordinates"][:2] for i in pt_idx], dtype=np.float64)
            rl1 = math.radians(lat)
            rl2 = np.radians(c[:, 1])
            dlat, dlon = rl2 - rl1, np.radians(c[:, 0]) - math.radians(lon)
            a = np.sin(dlat / 2) ** 2 + math.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2) ** 2
            d = 2 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))
            out[pt_idx] = d <= max_meters
        p = np.asarray([lon], dtype=np.float64)
        q = np.asarray([lat], dtype=np.float64)
        for i, g in enumerate(geoms):
            if g is None or g.get("type") == "Point":
                continue
            if bool(_np_in_rings(p, q, _outer_rings(g))[0]):
                out[i] = True
            else:
                out[i] = _np_min_seg_dist_m(lon, lat, _geom_rings(g)) <= max_meters
        return pd.Series(out)

    return _near(col)


def within(col: Column, query_geojson: str) -> Column:
    """within(geo, poly): stored geometry fully inside the query
    polygon/multipolygon (types/geofilter.go:27,85,173). Points: inside
    test; polygons: every vertex inside (the reference's loop-contains
    check on s2 loops). One vectorized pass over ALL vertices of the
    batch against the constant query rings."""
    qrings = _outer_rings(json.loads(query_geojson))

    @pandas_udf("boolean")
    def _within(vals: pd.Series) -> pd.Series:
        geoms = [None if v is None else json.loads(v) for v in vals]
        idx, px, py = _flatten_points(geoms)
        has_pts = np.zeros(len(geoms), dtype=bool)
        if idx.size:
            has_pts[idx] = True
            ins = _np_in_rings(px, py, qrings)
            bad = np.zeros(len(geoms), dtype=bool)
            bad[idx[~ins]] = True
            return pd.Series(has_pts & ~bad)
        return pd.Series(has_pts)

    return _within(col)


def geo_contains(col: Column, query_geojson: str) -> Column:
    """contains(geo, arg): stored polygon contains the query point or
    every vertex of the query polygon (types/geofilter.go:29,95,182)."""
    q = json.loads(query_geojson)
    if q.get("type") == "Point":
        qpts = [q["coordinates"]]
    else:
        qpts = [p for r in _outer_rings(q) for p in r]
    qx = np.asarray([p[0] for p in qpts], dtype=np.float64)
    qy = np.asarray([p[1] for p in qpts], dtype=np.float64)

    @pandas_udf("boolean")
    def _contains(vals: pd.Series) -> pd.Series:
        out = np.zeros(len(vals), dtype=bool)
        if qx.size:
            for i, v in enumerate(vals):
                if v is None:
                    continue
                rings = _outer_rings(json.loads(v))
                if rings:
                    out[i] = bool(_np_in_rings(qx, qy, rings).all())
        return pd.Series(out)

    return _contains(col)


def intersects(col: Column, polygon_geojson: str) -> Column:
    """intersects(geo, poly) (types/geofilter.go:31,105,194): true when
    any vertex of either geometry lies inside the other, OR any boundary
    segments cross — the full polygon-intersection predicate (catches
    crossing polygons whose vertices are all mutually outside). Vertex-in-
    query is one batch-wide broadcast; the segment test is an (S, Q)
    orientation broadcast per remaining row."""
    qg = json.loads(polygon_geojson)
    qrings = _outer_rings(qg)
    qvx = np.asarray([p[0] for r in qrings for p in r], dtype=np.float64)
    qvy = np.asarray([p[1] for r in qrings for p in r], dtype=np.float64)
    qx1, qy1, qx2, qy2 = _segments_of(qrings)

    @pandas_udf("boolean")
    def _intersects(vals: pd.Series) -> pd.Series:
        geoms = [None if v is None else json.loads(v) for v in vals]
        out = np.zeros(len(geoms), dtype=bool)
        # (1) any stored vertex inside the query rings — whole batch at once
        idx, px, py = _flatten_points(geoms)
        if idx.size:
            ins = _np_in_rings(px, py, qrings)
            out[idx[ins]] = True
        # (2) any query vertex inside stored rings / (3) segment crossings
        for i, g in enumerate(geoms):
            if g is None or out[i]:
                continue
            rings = _geom_rings(g)
            if not rings:
                continue
            if qvx.size and bool(_np_in_rings(qvx, qvy, rings).any()):
                out[i] = True
            elif _np_any_seg_cross(rings, qx1, qy1, qx2, qy2):
                out[i] = True
        return pd.Series(out)

    return _intersects(col)
