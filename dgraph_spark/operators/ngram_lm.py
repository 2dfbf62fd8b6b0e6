"""Bigram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020: filter/partition a crawl by LM perplexity;
fastText/KenLM pipelines use the same shape). A deterministic
Laplace-smoothed bigram model so every number has an exact SQL twin:

    P(w2 | w1) = (C(w1 w2) + alpha) / (C(w1) + alpha * V)

with V = distinct unigram count of the TRAINING corpus and C(.) the
training counts; unseen words/bigrams fall out of the same formula
(C = 0). A document's score is the mean natural log-probability over
its bigrams; perplexity = exp(-mean). Documents with fewer than one
bigram score NULL (no evidence, not "perfect").

Scale shape: training is two hash aggregations (unigrams, bigrams) —
map-side partial counts, reduce bounded by vocabulary, not corpus.
Scoring explodes each document's bigrams and joins the model; the
model is the SMALL side by Heaps' law (even a 100 TB crawl has a
bounded distinct-bigram table after a min-count floor) — broadcast it;
per-doc aggregation then happens map-side on the scan partitioning.
In the CCNet setup the LM is trained once on a clean reference corpus
(wiki) and reused, so training cost is off the hot path entirely.

Reference parity note: dgraph has no LM scoring; this is part of the
training-pipeline extension surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dgraph_spark.operators.dedup import (BROADCAST_ROW_CAP, compute_spread,
                                          norm_tokens)


def _tokens(text_col: str):
    return norm_tokens(F.col(text_col))


@dataclass
class BigramLM:
    """A trained model: persisted count tables + sizes. The table row
    counts decide broadcast-vs-shuffle at scoring time; ``unpersist``
    (or use as a context manager) releases the cached blocks —
    repeated trainings in one session otherwise accumulate them."""

    uni: DataFrame
    big: DataFrame
    vocab: int        # distinct unigrams == uni row count
    n_bigrams: int    # distinct bigrams == big row count

    def unpersist(self) -> None:
        for df in (self.uni, self.big):
            try:
                df.unpersist()
            except Exception:
                pass

    def __enter__(self) -> "BigramLM":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()


def _bigrams(t):
    n = F.size(t)
    return F.when(
        n >= 2,
        F.arrays_zip(F.slice(t, 1, n - 1).alias("w1"),
                     F.slice(t, 2, n - 1).alias("w2")),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> BigramLM:
    """Train and return a :class:`BigramLM`. ``min_count`` floors the
    bigram table (the standard lever that keeps the model broadcastable
    at crawl scale; the smoothing formula absorbs floored bigrams as
    unseen). The returned handle owns the persisted tables — call
    ``unpersist()`` (or use it as a context manager) when done."""
    from pyspark import StorageLevel

    # compute_spread: tokenization is the expensive step of both count
    # passes; a single-file corpus otherwise tokenizes twice on one
    # scan task (round-10 measurement; no-op at crawl scale)
    toks = compute_spread(docs).select(_tokens(text_col).alias("t"))
    uni = (toks.select(F.explode("t").alias("w1"))
           .groupBy("w1").agg(F.count("*").alias("cu")))
    big = (toks.select(F.explode(_bigrams(F.col("t"))).alias("b"))
           .select("b.w1", "b.w2")
           .groupBy("w1", "w2").agg(F.count("*").alias("cb")))
    if min_count > 1:
        big = big.where(F.col("cb") >= min_count)
    # the model tables are re-read by every scoring join and the
    # vocab count materializes uni anyway — persist both so training
    # runs the corpus scan once, not once per consumer
    uni = uni.persist(StorageLevel.MEMORY_AND_DISK)
    big = big.persist(StorageLevel.MEMORY_AND_DISK)
    vocab = uni.count()
    return BigramLM(uni=uni, big=big, vocab=vocab,
                    n_bigrams=big.count())


def lm_perplexity(
    docs: DataFrame,
    model: BigramLM,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document (doc_id, n_bigrams, avg_logp, ppl) under the
    trained model; avg_logp/ppl rounded to 4 decimals (sum order is
    not deterministic across partitions — rounding puts the compare
    far above float-sum noise).

    The model joins broadcast only while its tables fit
    (BROADCAST_ROW_CAP — on a real crawl the un-floored distinct-bigram
    table is tens of billions of rows, and an unconditional broadcast
    hint would not fail gracefully); past the cap the joins degrade to
    shuffle joins with identical results."""
    uni, big, vocab = model.uni, model.big, model.vocab
    bc_big = (F.broadcast if model.n_bigrams <= BROADCAST_ROW_CAP
              else (lambda d: d))
    bc_uni = (F.broadcast if model.vocab <= BROADCAST_ROW_CAP
              else (lambda d: d))
    pairs = (compute_spread(docs)
             .select(F.col(id_col),
                     F.explode_outer(_bigrams(_tokens(text_col)))
                      .alias("b"))
             .select(id_col, "b.w1", "b.w2"))
    scored = (
        pairs.join(bc_big(big), ["w1", "w2"], "left")
        .join(bc_uni(uni), ["w1"], "left")
        .select(
            id_col,
            F.col("w1"),
            # null w1 marks a <2-token document (explode_outer row):
            # no evidence, so no logp — avg() skips nulls and the doc
            # reports NULL avg_logp/ppl with n_bigrams = 0
            F.when(
                F.col("w1").isNotNull(),
                F.log((F.coalesce("cb", F.lit(0)) + F.lit(alpha))
                      / (F.coalesce("cu", F.lit(0))
                         + F.lit(alpha * vocab)))).alias("logp"),
        ))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("w1").alias("n_bigrams"),
            F.round(F.avg("logp"), 4).alias("avg_logp"),
            F.round(F.exp(-F.avg("logp")), 4).alias("ppl"),
        )
    )


def perplexity_report(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Convenience: train on ``lm_docs`` (default: the corpus itself —
    self-perplexity, the repetition-sensitive variant) and score
    ``docs``. The model's persisted tables stay cached for the
    lifetime of the returned (lazy) plan; callers who train repeatedly
    in one session should use :func:`train_bigram_lm` directly and
    ``unpersist()`` each model when its scores are materialized."""
    model = train_bigram_lm(
        lm_docs if lm_docs is not None else docs,
        text_col=text_col, min_count=min_count)
    return lm_perplexity(docs, model, alpha=alpha,
                         text_col=text_col, id_col=id_col)
