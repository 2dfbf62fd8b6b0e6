"""Operator-level tests: similarity, graph algorithms."""

import pyspark.sql.functions as F

from dgraph_spark.operators.graph_algos import connected_components, pagerank, reachable
from dgraph_spark.operators.similarity import ann_topk_lsh, similar_to, similar_to_many
from tests.conftest import SF_SMALL


def test_similar_to_exact(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = similar_to(emb, list(q), k=5, id_col="vec_id", vec_col="embedding").collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0 and abs(out[0]["dist"]) < 1e-6
    dists = [r["dist"] for r in out]
    assert dists == sorted(dists)


def test_similar_to_many(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = similar_to_many(emb, queries, k=3, id_col="vec_id", vec_col="embedding")
    rows = out.collect()
    assert len(rows) == 9
    # self is always nearest with euclidean (dist 0, lowest id tie)
    by_q = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["dist"], r["vec_id"])):
        by_q.setdefault(r["qid"], r["vec_id"])
    assert all(qid == vid for qid, vid in by_q.items())


def test_similar_to_many_metrics_match_single(spark):
    """Every metric of the batch GEMM path must agree with the
    single-query JVM column path (similar_to) on ids AND distances."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 3).collect()[0]["embedding"]
    queries = emb.where(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    for metric in ("euclidean", "cosine", "dotproduct"):
        single = similar_to(emb, list(qvec), 5, metric,
                            id_col="vec_id", vec_col="embedding").collect()
        batch = similar_to_many(emb, queries, 5, metric,
                                id_col="vec_id", vec_col="embedding").collect()
        assert [r["vec_id"] for r in single] == [r["vec_id"] for r in batch]
        for s, b in zip(single, batch):
            assert abs(s["dist"] - b["dist"]) < 1e-9, metric


def test_ann_lsh_contains_near(spark):
    import random

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    rnd = random.Random(7)
    planes = [[rnd.gauss(0, 1) for _ in range(len(q))] for _ in range(4)]
    out = ann_topk_lsh(emb, list(q), k=3, hyperplanes=planes, metric="cosine",
                       id_col="vec_id", vec_col="embedding", probe_hamming=1).collect()
    assert any(r["vec_id"] == 1 for r in out)


def test_ann_ivf(spark):
    from dgraph_spark.operators.similarity import ann_topk_ivf, ivf_index, similar_to

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    assigned, centroids = ivf_index(emb, n_lists=8, id_col="vec_id", vec_col="embedding")
    assert assigned.select("list_id").distinct().count() <= 8
    q = emb.where(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    approx = ann_topk_ivf(assigned, centroids, list(q), k=5, n_probes=3,
                          id_col="vec_id", vec_col="embedding").collect()
    # the query vector itself must be found (its own list is probed first)
    assert approx[0]["vec_id"] == 3
    # recall vs exact top-5 should be decent with 3/8 lists probed
    exact = {r["vec_id"] for r in similar_to(emb, list(q), 5, id_col="vec_id",
                                             vec_col="embedding").collect()}
    got = {r["vec_id"] for r in approx}
    assert len(got & exact) >= 3


def test_reachable(graph):
    starts = graph.uids_of_type("Customer").limit(5)
    out = reachable(graph, starts, ["in_nation", "in_region"], max_depth=3)
    depths = {r["depth"] for r in out.collect()}
    assert depths == {1, 2}


def test_connected_components(graph):
    labels = connected_components(graph, ["in_region"])
    # nations sharing a region share a component
    n = labels.count()
    assert n > 0
    comps = labels.select("component").distinct().count()
    assert comps <= 5  # at most one component per region


def test_pagerank(graph):
    ranks = pagerank(graph, ["in_nation"], max_iter=3)
    rows = ranks.collect()
    assert all(r["rank"] > 0 for r in rows)
