"""Vector similarity search (similar_to) + ANN scale paths.

Reference: similar_to(v, k, vec) with euclidean/cosine/dotproduct
metrics backed by HNSW (worker/task.go:359-410, tok/hnsw/). Exact
brute-force top-k is *more* accurate than HNSW and embarrassingly
parallel, so it is the baseline (SURVEY.md §7 "HNSW parity"); the scale
path is LSH bucketing (random hyperplanes), which turns the all-pairs
scan into a bucket-equi-join.

All distance math uses JVM higher-order functions (zip_with/aggregate)
— no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


_PAIR_DOT_UDF = None


def pair_dot_vec(a: Column, b: Column) -> Column:
    """Arrow-vectorized dot product for CANDIDATE-PAIR verification.

    The zip_with/aggregate form (_dot) is evaluated per element by the
    interpreter — Spark does not whole-stage-codegen lambda functions —
    which is fine on row-count-bound paths (norms, small k-NN scans)
    but measured ~10x slower than numpy once a blocked pair join emits
    tens of millions of candidates. Same float64 math, batched through
    Arrow (the tr/en stemmer precedent for hot Python paths)."""
    global _PAIR_DOT_UDF
    if _PAIR_DOT_UDF is None:
        _PAIR_DOT_UDF = F.pandas_udf(_pair_dot_arrs, "double",
                                     F.PandasUDFType.SCALAR)
    return _PAIR_DOT_UDF(a, b)


def _pair_dot_arrs(a, b):
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    av = np.stack(a.to_numpy()).astype("float64", copy=False)
    bv = np.stack(b.to_numpy()).astype("float64", copy=False)
    return pd.Series(np.einsum("ij,ij->i", av, bv))


def distance_col(a: Column, b: Column, metric: str) -> Column:
    """euclidean | cosine | dotproduct — tok/hnsw/helper.go metrics.
    For cosine the 'distance' is 1 - cosine similarity; for dotproduct
    the negative dot (so smaller = closer), matching HNSW ordering."""
    if metric == "euclidean":
        return F.sqrt(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    if metric == "cosine":
        return 1.0 - _dot(a, b) / (_norm(a) * _norm(b))
    if metric == "dotproduct":
        return -_dot(a, b)
    raise ValueError(f"unknown metric {metric!r}")


def similar_to(
    vectors: DataFrame,
    query_vec: list[float],
    k: int,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Exact top-k nearest neighbors of a literal query vector.
    Returns (id_col, dist), ascending distance, ties by id.

    Scale: one projection-only scan + a TakeOrderedAndProject (no full
    sort, no shuffle of vectors) — Spark's limit-sort does per-partition
    top-k then merges k*partitions rows on one reducer.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = vectors.select(
        F.col(id_col), distance_col(F.col(vec_col), q, metric).alias("dist")
    )
    return scored.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(k)


def similar_to_many(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Batch k-NN: for every query row, its k nearest vectors.

    Executes as a GEMM scan: the query matrix is collected (queries are
    the SMALL side by contract — capped loudly) and shipped in the
    mapInPandas closure; each corpus Arrow batch computes a
    batch x queries distance matrix and emits its LOCAL per-query
    top-k (exact (dist, id) lexicographic ties), then one window picks
    the global top-k from k * n_batches candidates. vs the previous
    crossJoin + interpreted per-pair distance this is the
    pair-multiplied case (rows x Q evaluations) — measured 39.3s ->
    3.4s at 500k x 64 queries with identical results; single-query
    similar_to stays the JVM column path (see PLANS.md, the negative
    A/B)."""
    if metric not in ("euclidean", "cosine", "dotproduct"):
        raise ValueError(f"unknown metric {metric!r}")
    qrows = queries.select(qid_col, qvec_col).collect()
    if len(qrows) > 100_000:
        raise ValueError(
            f"similar_to_many broadcasts the query matrix to every "
            f"task: {len(qrows)} query rows exceeds the 100k cap — "
            f"split the query set or join per-shard.")
    import numpy as np

    qm = np.stack([np.asarray(r[qvec_col], dtype="float64") for r in qrows])
    qids = np.array([r[qid_col] for r in qrows])

    def score(batches):
        import pandas as pd

        qn = np.sqrt(np.einsum("ij,ij->i", qm, qm))
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64", copy=False)
            ids = pdf[id_col].to_numpy()
            if metric == "euclidean":
                sq = np.einsum("ij,ij->i", mat, mat)
                dists = np.sqrt(np.maximum(
                    sq[:, None] - 2.0 * (mat @ qm.T) + (qn * qn)[None, :], 0.0))
            elif metric == "cosine":
                nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
                nrm[nrm == 0.0] = 1.0
                dists = 1.0 - (mat @ qm.T) / np.outer(nrm, qn)
            elif metric == "dotproduct":
                dists = -(mat @ qm.T)
            else:
                raise ValueError(f"unknown metric {metric!r}")
            out = {"qid": [], "id": [], "dist": []}
            kk = min(k, len(ids))
            for qi in range(len(qids)):
                col = dists[:, qi]
                # exact (dist, id) lexicographic local top-k so global
                # tie-breaks match the declared ordering
                idx = np.lexsort((ids, col))[:kk]
                out["qid"].extend([qids[qi]] * kk)
                out["id"].extend(ids[idx])
                out["dist"].extend(col[idx])
            yield pd.DataFrame(out)

    local = vectors.select(id_col, vec_col).mapInPandas(
        score, f"qid {queries.schema[qid_col].dataType.simpleString()}, "
               f"id {vectors.schema[id_col].dataType.simpleString()}, "
               f"dist double")
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k).drop("_rn")
        .select(F.col("qid").alias(qid_col), F.col("id").alias(id_col), "dist")
    )


def ivf_index(
    vectors: DataFrame,
    n_lists: int = 16,
    id_col: str = "id",
    vec_col: str = "vec",
    seed: int = 42,
    max_iter: int = 10,
):
    """IVF (inverted-file) ANN index: k-means centroids + cluster
    assignment. Returns (assigned DataFrame with `list_id`, centroids as
    a Python list). The index build is one MLlib KMeans fit; search
    probes only the closest lists — the classic 100 TB ANN layout
    (train on a sample, assign in one pass, partition by list_id)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = vectors.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
    )
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter, featuresCol="_features",
                predictionCol="list_id")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, "list_id")
    centroids = [list(c) for c in model.clusterCenters()]
    return assigned, centroids


def ann_topk_ivf(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int,
    n_probes: int = 2,
    metric: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Search an IVF index: rank centroids by distance to the query,
    scan only the ``n_probes`` nearest lists, exact re-rank inside.
    With the assigned relation partitioned by list_id, the probe is a
    partition-pruned scan."""
    import math

    def dist(c):
        return math.sqrt(sum((a - b) ** 2 for a, b in zip(c, query_vec)))

    probe_ids = sorted(range(len(centroids)), key=lambda i: dist(centroids[i]))[:n_probes]
    cand = assigned.where(F.col("list_id").isin(probe_ids))
    return similar_to(cand, query_vec, k, metric, id_col, vec_col)


def lsh_bucket(
    vectors: DataFrame,
    hyperplanes: list[list[float]],
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Random-hyperplane LSH signature (cosine family): one bit per
    hyperplane, packed into a long `bucket` column. ANN search then
    equi-joins on bucket instead of scanning all pairs — the scale path
    for 100 TB corpora (candidate generation), with exact re-rank inside
    buckets."""
    bits = []
    for i, h in enumerate(hyperplanes):
        hcol = F.array(*[F.lit(float(x)) for x in h])
        bits.append(F.when(_dot(F.col(vec_col), hcol) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return vectors.select(F.col(id_col), F.col(vec_col), bucket.cast("long").alias("bucket"))


def ann_topk_lsh(
    vectors: DataFrame,
    query_vec: list[float],
    k: int,
    hyperplanes: list[list[float]],
    metric: str = "cosine",
    id_col: str = "id",
    vec_col: str = "vec",
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN top-k: restrict the exact scorer to the query's LSH bucket
    (optionally probing neighbors within a Hamming radius)."""
    bucketed = lsh_bucket(vectors, hyperplanes, id_col, vec_col)
    qbits = 0
    for i, h in enumerate(hyperplanes):
        if sum(a * b for a, b in zip(query_vec, h)) >= 0:
            qbits |= 1 << i
    if probe_hamming <= 0:
        cand = bucketed.where(F.col("bucket") == qbits)
    else:
        cand = bucketed.where(
            F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qbits))) <= probe_hamming
        )
    return similar_to(cand, query_vec, k, metric, id_col, vec_col)
