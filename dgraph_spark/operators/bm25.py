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

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dgraph_spark.operators.dedup import (
    _ALL_CACHES, _corpus_key, compute_spread, nopush, norm_tokens)

K1 = 1.2
B = 0.75

# ASCII-\s split + lowercase — the SAME spec as norm_tokens (Java's \s
# class); python re's \s is Unicode-wide, so the class is explicit.
# A query tokenized differently from the documents can silently never
# match (e.g. non-breaking-space-separated terms).
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def query_terms(query: str) -> list[str]:
    """Sorted distinct query terms under the document token spec."""
    return sorted({t for t in _WS.split(query.lower()) if t})


# (session, corpus plan hash, file snapshot, text/id cols) ->
# {"n": int, "avgdl": float, "df": {term: int}}. The corpus-stats pass
# (N, avgdl, per-term df) is the expensive full tokenize+aggregate; a
# search operator re-paying it per call is wrong — stats are corpus
# properties, so they live in the same keyed/invalidated cache family
# as the jaccard/minhash indexes (values are scalars: nothing to
# unpersist on eviction).
_BM25_STATS_CACHE: dict[tuple, dict] = {}
_ALL_CACHES.append(_BM25_STATS_CACHE)


def _tokens(text_col: str):
    return norm_tokens(F.col(text_col))


def _corpus_stats(docs, terms, text_col, id_col):
    """(n, avgdl, {term: df}) with per-corpus caching: N/avgdl are paid
    once per corpus, df once per (corpus, term) — repeat searches on
    the same DataFrame trigger NO Spark job here. Cache misses fold
    into ONE aggregate (missing terms only)."""
    ck = _corpus_key(docs, "bm25stats", text_col, id_col)
    cached = _BM25_STATS_CACHE.get(ck) if ck is not None else None
    missing = ([t for t in terms if t not in cached["df"]]
               if cached else terms)
    if cached is None or missing:
        toks = _tokens(text_col)
        aggs = [F.sum(F.array_contains(toks, t).cast("int")).alias(f"df{i}")
                for i, t in enumerate(missing)]
        if cached is None:
            aggs = [F.count("*").alias("n"),
                    F.avg(F.size(toks)).alias("avgdl")] + aggs
        # compute_spread: the partial aggregate tokenizes every document
        # where the scan runs — single-core on a one-file corpus
        row = compute_spread(docs).select(*aggs).collect()[0]
        if cached is None:
            cached = {"n": row["n"], "avgdl": row["avgdl"] or 0.0,
                      "df": {}}
            if ck is not None:
                _BM25_STATS_CACHE[ck] = cached
        for i, t in enumerate(missing):
            cached["df"][t] = row[f"df{i}"] or 0
    return cached["n"], cached["avgdl"], cached["df"]


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25: (doc_id, score),
    score desc then id asc (deterministic ties), rounded to 4
    decimals. At most one stats aggregate (N, avgdl, df per term —
    cached per corpus, so repeat searches skip it) plus one pruned
    scan + top-k."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("empty query")
    n, avgdl, dfs = _corpus_stats(docs, terms, text_col, id_col)
    if n == 0:
        raise ValueError("empty corpus")
    import math

    idfs = [math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            for t in terms]
    t_arr = F.array(*[F.lit(t) for t in terms])
    toks = _tokens(text_col)
    # compute_spread + nopush: keep the tokenizer in ONE parallel
    # projection — pushed down, the overlap test inlines a second
    # tokenizer copy into the (single-task, on a one-file corpus)
    # scan filter (round-10 plan audit)
    base = (compute_spread(docs).select(F.col(id_col), toks.alias("_t"))
            .where(nopush(F.arrays_overlap(F.col("_t"), t_arr))))
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
