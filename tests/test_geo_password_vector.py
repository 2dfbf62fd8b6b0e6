"""Geo filters, checkpwd, and DQL similar_to (reference surfaces:
types/geofilter.go, types/password.go, worker/task.go:359 vector fn)."""

import json

import pytest
from pyspark.sql import functions as F

from dgraph_spark.functions.password import hash_password
from dgraph_spark.model import Graph
from dgraph_spark.plans import Executor
from dgraph_spark.schema import Predicate, SchemaRegistry


@pytest.fixture(scope="module")
def geo_graph(spark):
    """Tiny city graph: SF (point), a CA polygon, an NV polygon."""
    pts = [
        (1, json.dumps({"type": "Point", "coordinates": [-122.42, 37.77]})),  # SF
        (2, json.dumps({"type": "Point", "coordinates": [-121.89, 37.33]})),  # San Jose
        (3, json.dumps({"type": "Point", "coordinates": [-73.97, 40.78]})),   # NYC
    ]
    polys = [
        (10, json.dumps({"type": "Polygon", "coordinates": [[
            [-125, 35], [-118, 35], [-118, 42], [-125, 42], [-125, 35]]]})),  # CA-ish
    ]
    names = [(1, "SF"), (2, "San Jose"), (3, "NYC"), (10, "CAbox")]
    pw = [(1, hash_password("s3cret")), (2, hash_password("other"))]
    emb = [(i, [float(i), float(i * i), 1.0]) for i in range(1, 6)]

    reg = SchemaRegistry.parse(
        "loc: geo @index(geo) .\nname: string @index(exact) .\n"
        "password: password .\nvec: float32vector @index(hnsw(metric:\"euclidean\")) ."
    )
    preds = {
        "loc": spark.createDataFrame(pts + polys, "subject long, value string"),
        "name": spark.createDataFrame(names, "subject long, value string"),
        "password": spark.createDataFrame(pw, "subject long, value string"),
        "vec": spark.createDataFrame(emb, "subject long, value array<float>"),
    }
    return Graph(spark=spark, preds=preds, schema=reg)


def test_near(geo_graph):
    r = Executor(geo_graph).execute(
        "{ q(func: near(loc, [-122.40, 37.78], 10000)) { name } }"
    )
    # polygons match near() when the query point is inside or within
    # distance of the boundary (reference cap-intersection semantics)
    assert {n["name"] for n in r["q"]} == {"SF", "CAbox"}
    r2 = Executor(geo_graph).execute(
        "{ q(func: near(loc, [-122.40, 37.78], 100000)) { name } }"
    )
    assert {n["name"] for n in r2["q"]} == {"SF", "San Jose", "CAbox"}


def test_within(geo_graph):
    r = Executor(geo_graph).execute(
        "{ q(func: within(loc, [[-126, 34], [-117, 34], [-117, 43], [-126, 43], [-126, 34]])) { name } }"
    )
    assert {n["name"] for n in r["q"]} == {"SF", "San Jose", "CAbox"}


def test_contains(geo_graph):
    r = Executor(geo_graph).execute(
        "{ q(func: contains(loc, [-122.0, 37.0])) { name } }"
    )
    assert {n["name"] for n in r["q"]} == {"CAbox"}


def test_intersects(geo_graph):
    r = Executor(geo_graph).execute(
        "{ q(func: intersects(loc, [[-124, 36], [-120, 36], [-120, 41], [-124, 41], [-124, 36]])) { name } }"
    )
    assert "CAbox" in {n["name"] for n in r["q"]}


def test_checkpwd(geo_graph):
    r = Executor(geo_graph).execute('{ q(func: checkpwd(password, "s3cret")) { name } }')
    assert {n["name"] for n in r["q"]} == {"SF"}
    r2 = Executor(geo_graph).execute('{ q(func: checkpwd(password, "wrong")) { name } }')
    assert r2["q"] == []


def test_similar_to_dql(geo_graph):
    r = Executor(geo_graph).execute(
        "{ q(func: similar_to(vec, 2, [2.0, 4.0, 1.0])) { name uid } }"
    )
    uids = [n["uid"] for n in r["q"]]
    assert uids[0] == "0x2"  # exact match first
    assert len(uids) == 2


def test_similar_to_uid_arg(geo_graph):
    """similar_to(pred, k, "0x2"): the query vector is node 0x2's own
    vector; the query node ranks first at distance 0
    (worker/task.go:2211 interpretVFloatOrUid; index.AcceptAll keeps
    self). A uid with no vector posting yields empty, not an error
    (tok/hnsw SearchWithUid errFetchingPostingList path)."""
    r = Executor(geo_graph).execute(
        '{ q(func: similar_to(vec, 2, "0x2")) { uid } }')
    uids = [n["uid"] for n in r["q"]]
    assert uids[0] == "0x2" and len(uids) == 2
    r2 = Executor(geo_graph).execute(
        '{ q(func: similar_to(vec, 2, "0xdead")) { uid } }')
    assert r2.get("q", []) == []


def test_intersects_crossing_polygons(spark):
    """Cross-shaped overlap: every vertex of each polygon is OUTSIDE the
    other, so vertex-containment alone says false — only the segment
    intersection test finds it (types/geofilter.go:194 Intersects)."""
    tall = json.dumps({"type": "Polygon", "coordinates": [[
        [-1, -3], [1, -3], [1, 3], [-1, 3], [-1, -3]]]})
    far = json.dumps({"type": "Polygon", "coordinates": [[
        [10, 10], [12, 10], [12, 12], [10, 12], [10, 10]]]})
    reg = SchemaRegistry.parse("loc: geo @index(geo) .\nname: string .")
    preds = {
        "loc": spark.createDataFrame([(1, tall), (2, far)], "subject long, value string"),
        "name": spark.createDataFrame([(1, "tall"), (2, "far")], "subject long, value string"),
    }
    g = Graph(spark=spark, preds=preds, schema=reg)
    # wide flat query rectangle crossing `tall` through the middle
    r = Executor(g).execute(
        "{ q(func: intersects(loc, [[-3, -1], [3, -1], [3, 1], [-3, 1], [-3, -1]])) { name } }")
    assert {n["name"] for n in r["q"]} == {"tall"}
