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

from dgraph_spark.operators.dedup import (_ALL_CACHES, BROADCAST_ROW_CAP,
                                          _corpus_key, compute_spread,
                                          norm_tokens)

# (session id, corpus plan hash, file snapshot, text col, min_count) ->
# (counts_base, uni, big, vocab, n_bigrams). The trained model is a
# corpus property like the BM25 stats and the jaccard/minhash indexes:
# in the CCNet deployment the LM is trained ONCE (on a clean reference
# corpus) and reused for every scoring pass, so perplexity_report
# re-training per call was pure overhead. Same keyed/invalidated cache
# family (_corpus_key: a rewritten parquet dir or uncacheable source
# produces a miss), values carry the persisted DataFrames so eviction
# unpersists them (dedup._drop_entry).
_LM_CACHE: dict[tuple, tuple] = {}
_ALL_CACHES.append(_LM_CACHE)

# LM count tables are much larger than the BM25 stats dicts in the same
# cache family, so this cache alone is LRU-BOUNDED: a session training
# over many distinct corpora otherwise accumulates persisted
# MEMORY_AND_DISK relations for the whole session (round-11 advice).
# Multi-corpus trainers that want explicit lifetime control should call
# train_bigram_lm directly and unpersist() the handle.
LM_CACHE_MAX_ENTRIES = 4


def _lm_cache_put(key: tuple, value: tuple) -> None:
    from dgraph_spark.operators.dedup import _drop_entry

    _LM_CACHE[key] = value
    while len(_LM_CACHE) > LM_CACHE_MAX_ENTRIES:
        _drop_entry(_LM_CACHE, next(iter(_LM_CACHE)))  # oldest-inserted


def _lm_cache_get(key: tuple):
    """dict preserves insertion order — re-inserting on hit makes the
    eviction order least-recently-USED, not least-recently-built."""
    val = _LM_CACHE.pop(key, None)
    if val is not None:
        _LM_CACHE[key] = val
    return val


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
    base: DataFrame | None = None   # the one persisted counts relation

    def unpersist(self) -> None:
        for df in (self.uni, self.big, self.base):
            if df is None:
                continue
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

    # ONE corpus pass for BOTH count tables (round 10; was one
    # tokenize+explode+aggregate pipeline per table): a single explode
    # emits the unigram rows as (w, NULL) next to the bigram rows
    # (w1, w2), one hash aggregation counts them all, and the uni/big
    # tables are null-partitioned views of the one persisted result.
    # compute_spread parallelizes the tokenizer on a one-file corpus
    # (no-op at crawl scale).
    t = F.col("t")
    unis = F.transform(t, lambda w: F.struct(
        w.alias("w1"), F.lit(None).cast("string").alias("w2")))
    rows = (compute_spread(docs)
            .select(_tokens(text_col).alias("t"))
            .select(F.explode(F.concat(unis, _bigrams(t))).alias("b"))
            .select("b.w1", "b.w2"))
    counts = (rows.groupBy("w1", "w2").agg(F.count("*").alias("c"))
              .persist(StorageLevel.MEMORY_AND_DISK))
    uni = (counts.where(F.col("w2").isNull())
           .select("w1", F.col("c").alias("cu")))
    big = (counts.where(F.col("w2").isNotNull())
           .select("w1", "w2", F.col("c").alias("cb")))
    if min_count > 1:
        big = big.where(F.col("cb") >= min_count)
    vocab = uni.count()   # materializes the one persisted pipeline
    return BigramLM(uni=uni, big=big, vocab=vocab,
                    n_bigrams=big.count(), base=counts)


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
    ``docs``. The trained model is cached per (corpus, min_count) in
    the same keyed/invalidated family as the BM25 stats and dedup
    indexes — the CCNet deployment trains once and scores everything,
    so repeat reports over the same training corpus skip the training
    jobs entirely. Uncacheable sources (no file snapshot AND mutable
    leaves — see dedup._corpus_key) train per call as before; those
    callers should use :func:`train_bigram_lm` directly and
    ``unpersist()`` the model when its scores are materialized."""
    train_docs = lm_docs if lm_docs is not None else docs
    ck = _corpus_key(train_docs, "bigram_lm", text_col, min_count)
    cached = _lm_cache_get(ck) if ck is not None else None
    if cached is None:
        model = train_bigram_lm(train_docs, text_col=text_col,
                                min_count=min_count)
        if ck is not None:
            _lm_cache_put(ck, (model.base, model.uni, model.big,
                               model.vocab, model.n_bigrams))
    else:
        base, uni, big, vocab, n_bigrams = cached
        model = BigramLM(uni=uni, big=big, vocab=vocab,
                         n_bigrams=n_bigrams, base=base)
    return lm_perplexity(docs, model, alpha=alpha,
                         text_col=text_col, id_col=id_col)
