"""End-to-end training-corpus preparation: the standard
quality→dedup→decontaminate→split→pack flow in one call instead of
wiring eight operators by hand.

The SEMANTICS are exactly the composition of the individually-oracled
operators (gopher_quality_filter → exact_duplicates keep-min →
decontaminate → hash_split → pack_sequences → corpus_report; the
driver entry `prepare_corpus` gates the composed output against a
DuckDB CTE twin). The PLAN is deliberately tighter than naive
chaining: one corpus scan computes keep/fingerprint/token-count/
char-count in a single projection (the quality predicate is a
let-bound expression, so it pushes to the scan as one tokenizer
pass), exact dedup is a row_number window over the fingerprint
(equivalent to keep-min-id, no groupBy+explode+anti-join re-scan),
and every shuffle after the scan carries only slim columns — text
never shuffles. Round-9 A/B: 2.6 s → ~1 s at sf0.1; the naive
semi/anti-join chaining before the round-9 pushdown fix was 45-65 s.

Scale shape: one scan + two narrow shuffles (fingerprint window,
pack-key window) + the optional broadcast decontamination anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prepare_corpus(
    docs: DataFrame,
    bench: DataFrame | None = None,
    *,
    split_fracs: dict[str, float] | None = None,
    pack_budget: int = 2048,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    decontaminate_n: int = 3,
) -> dict[str, DataFrame]:
    """Returns ``{"corpus": ..., "report": ...}``.

    corpus: one row per surviving document —
      (doc_id, <stratum>, split, n_tokens, tok_offset,
       first_seq, last_seq)
    report: per-stratum dataset card of the SURVIVING corpus
      (same formulas as corpus_report).

    Stage semantics (each individually driver-oracled):
      1. gopher_quality_filter  — drop rule-failing documents
      2. exact_duplicates       — keep the smallest id per dup group
      3. decontaminate          — drop benchmark n-gram overlaps
         (skipped when ``bench`` is None)
      4. hash_split             — deterministic train/val/test
      5. pack_sequences         — per (stratum, split) token stream
      6. corpus_report          — the dataset card
    """
    from dgraph_spark.operators.dedup import (compute_spread, nopush,
                                              normalized)
    from dgraph_spark.operators.pipeline_text import (
        _ws_tokens, decontaminate, hash_split, pack_sequences)
    from dgraph_spark.operators.textstats import (
        GOPHER_DEFAULTS, gopher_reasons_expr)

    split_fracs = split_fracs or {"train": 0.98, "val": 0.01,
                                  "test": 0.01}
    text = F.col(text_col)

    # ONE corpus scan: a single projection computes everything
    # downstream stages need — text itself never shuffles
    # (decontamination is the one consumer that still needs it, so it
    # is carried only when bench is given). The quality predicate is
    # COMPUTE-bound (~0.3 ms/doc of interpreted HOF work), but Spark
    # sizes scan partitions for I/O: a small corpus (one file under
    # the 4 MB open-cost) reads as ONE partition and the whole pass
    # runs single-core. Spread it when the scan is under-parallel —
    # at crawl scale the input has thousands of partitions and
    # compute_spread is a no-op, so the repartition never ships
    # 100 TB anywhere.
    spread = compute_spread(docs)

    keep_expr = F.size(gopher_reasons_expr(text, GOPHER_DEFAULTS)) == 0
    if spread is not docs:
        # the barrier keeps the (expensive) quality predicate ABOVE the
        # spread exchange — round 10 found Catalyst pushing it back to
        # the single scan task, which made the repartition useless (the
        # whole Gopher pass ran single-core; plans/r10/ A/B)
        keep_expr = nopush(keep_expr)
    docs = spread
    slim_cols = [
        F.col(id_col), F.col(stratum_col),
        (F.col("lang") if "lang" in docs.columns
         else F.lit("und")).alias("_lang"),
        F.md5(normalized(text)).alias("_fp"),
        F.size(_ws_tokens(text)).cast("long").alias("_nt"),
        F.length(text).cast("long").alias("_nc"),
    ]
    if bench is not None:
        slim_cols.append(text)
    slim = docs.where(keep_expr).select(*slim_cols)

    # exact dedup = keep the smallest id per normalized-text
    # fingerprint: a row_number window over _fp, equivalent to
    # exact_duplicates + loser anti-join but one narrow shuffle
    fpw = Window.partitionBy("_fp").orderBy(id_col)
    clean = (slim.withColumn("_rn", F.row_number().over(fpw))
             .where(F.col("_rn") == 1).drop("_rn", "_fp"))

    if bench is not None:
        clean = decontaminate(clean, bench, n=decontaminate_n,
                              text_col=text_col, id_col=id_col)
        clean = clean.drop(text_col)

    split = hash_split(clean, split_fracs, id_col=id_col)
    # pack each split's stream independently: stratum = (source, split).
    # The composite key is decomposed back afterwards (unit separator —
    # split names are validated below to contain no separator, so
    # taking the LAST component is exact even if a stratum value
    # contains \x1f). A NULL stratum would be SKIPPED by concat_ws
    # (collapsing it to '' on the way back), so it rides through as a
    # sentinel and is restored to NULL after the decompose.
    sep = "\x1f"
    null_stratum = "\x1e<null>\x1e"
    bad = [k for k in split_fracs if sep in k]
    if bad:
        raise ValueError(f"split names must not contain {sep!r}: {bad}")
    keyed = split.withColumn(
        "_pack_key",
        F.concat_ws(sep,
                    F.coalesce(F.col(stratum_col), F.lit(null_stratum)),
                    F.col("split")))
    packed = pack_sequences(keyed, budget=pack_budget,
                            stratum_col="_pack_key",
                            tokens_col="_nt", id_col=id_col)
    parts = F.split(F.col("_pack_key"), sep)
    restored = F.array_join(F.slice(parts, 1, F.size(parts) - 1), sep)
    corpus = (packed
              .withColumn(stratum_col,
                          F.when(restored == null_stratum, F.lit(None))
                           .otherwise(restored))
              .withColumn("split", F.element_at(parts, -1))
              .drop("_pack_key")
              .select(id_col, stratum_col, "split", "n_tokens",
                      "tok_offset", "first_seq", "last_seq"))

    # dataset card over the survivors: corpus_report's exact formulas,
    # fed from the precomputed slim columns (no second text pass)
    report = (clean.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.round(F.avg("_nt"), 4).alias("mean_tokens"),
        F.sum("_nc").alias("n_chars"),
        F.count_distinct(F.col("_lang")).alias("n_langs"),
    ))
    return {"corpus": corpus, "report": report}
