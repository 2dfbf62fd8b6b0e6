"""BM25 ranked full-text search (Robertson/Spärck Jones; the Lucene
default scoring family). The reference's fulltext functions
(anyoftext/alloftext) return an unranked match set — this operator
adds the standard relevance-ranked top-k on the same term tokenization,
as a deterministic column program with an exact DuckDB twin:

    idf(t)    = ln( (N - df + 0.5) / (df + 0.5) + 1 )      # BM25+ floor
    score(d)  = sum_t idf(t) * tf * (k1 + 1)
                      / (tf + k1 * (1 - b + b * dl / avgdl))

tf = term frequency in d, dl = d's token count, avgdl = corpus mean,
N = corpus size, df = documents containing t. Constants k1 = 1.2,
b = 0.75 (the textbook defaults).

Scale shape: corpus stats (N, avgdl, df per query term) are one
aggregation pass; scoring filters to documents containing ANY query
term BEFORE computing tf (the match set is the small side — the scan
prunes on an arrays_overlap predicate), then a TakeOrderedAndProject
top-k. No shuffle except the final top-k; the per-term df frame is a
handful of rows (broadcast literal in practice — we fold it into the
expression as computed scalars, so the scoring pass is one projection
over the pruned scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dgraph_spark.operators.dedup import norm_tokens

K1 = 1.2
B = 0.75


def _tokens(text_col: str):
    return norm_tokens(F.col(text_col))


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25: (doc_id, score),
    score desc then id asc (deterministic ties), rounded to 4
    decimals. Two jobs: one stats aggregate (N, avgdl, df per term —
    a single small action) and one pruned scan + top-k."""
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("empty query")
    toks = _tokens(text_col)
    stats = docs.select(
        F.count("*").alias("n"),
        F.avg(F.size(toks)).alias("avgdl"),
        *[F.sum(F.array_contains(toks, t).cast("int")).alias(f"df{i}")
          for i, t in enumerate(terms)],
    ).collect()[0]
    n, avgdl = stats["n"], stats["avgdl"] or 0.0
    if n == 0:
        raise ValueError("empty corpus")
    import math

    idfs = [math.log((n - stats[f"df{i}"] + 0.5)
                     / (stats[f"df{i}"] + 0.5) + 1.0)
            for i in range(len(terms))]
    t_arr = F.array(*[F.lit(t) for t in terms])
    base = (docs.select(F.col(id_col), toks.alias("_t"))
            .where(F.arrays_overlap(F.col("_t"), t_arr)))
    dl = F.size("_t")
    score = None
    for t, idf in zip(terms, idfs):
        tf = F.size(F.filter(F.col("_t"), lambda x: x == t)).cast("double")
        part = (F.lit(idf) * tf * (K1 + 1)
                / (tf + K1 * (1 - B + B * dl / F.lit(float(avgdl)))))
        score = part if score is None else score + part
    return (base.select(F.col(id_col),
                        F.round(score, 4).alias("score"))
            .orderBy(F.desc("score"), id_col).limit(k))
