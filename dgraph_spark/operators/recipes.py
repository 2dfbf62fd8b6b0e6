"""End-to-end training-corpus preparation: the documented composition
of the pipeline operators, so a user gets the standard
quality→dedup→decontaminate→split→pack flow in one call instead of
wiring eight operators by hand.

Every stage is one of the individually-oracled operators; this module
adds NO new semantics — it only chains them, which keeps the whole
recipe inside the per-operator correctness gates. Scale shape is the
sum of its parts: one aggregation for the quality stats, one
hash-groupBy for exact dedup, a broadcast anti-join for
decontamination, narrow transforms for split/weights, one window for
packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    report: per-stratum dataset card of the SURVIVING corpus.

    Stages (each individually driver-oracled):
      1. gopher_quality_filter  — drop rule-failing documents
      2. exact_duplicates       — keep the smallest id per dup group
      3. decontaminate          — drop benchmark n-gram overlaps
         (skipped when ``bench`` is None)
      4. hash_split             — deterministic train/val/test
      5. pack_sequences         — per (stratum, split) token stream
      6. corpus_report          — the dataset card
    """
    from dgraph_spark.operators.dedup import exact_duplicates
    from dgraph_spark.operators.pipeline_text import (
        decontaminate, hash_split, pack_sequences)
    from dgraph_spark.operators.textstats import gopher_quality_filter

    split_fracs = split_fracs or {"train": 0.98, "val": 0.01,
                                  "test": 0.01}

    keep = gopher_quality_filter(
        docs, text_col=text_col, id_col=id_col)
    clean = docs.join(keep.where("keep").select(id_col),
                      id_col, "left_semi")

    dups = exact_duplicates(clean, text_col=text_col, id_col=id_col)
    losers = dups.select(
        F.explode(F.expr("slice(ids, 2, size(ids) - 1)")).alias(id_col))
    clean = clean.join(losers, id_col, "left_anti")

    if bench is not None:
        clean = decontaminate(clean, bench, n=decontaminate_n,
                              text_col=text_col, id_col=id_col)

    split = hash_split(clean, split_fracs, id_col=id_col)
    # pack each split's stream independently: stratum = (source, split).
    # The composite key is decomposed back into its parts afterwards
    # (unit separator — not a join back to `split`, which would
    # re-execute the whole quality+dedup chain on the second join
    # side). Split names are dict keys with no separator in them, so
    # taking the LAST component is exact even if a stratum value
    # contains \x1f.
    sep = "\x1f"
    keyed = split.withColumn(
        "_pack_key", F.concat_ws(sep, F.col(stratum_col), F.col("split")))
    packed = pack_sequences(keyed, budget=pack_budget,
                            stratum_col="_pack_key", text_col=text_col,
                            id_col=id_col)
    parts = F.split(F.col("_pack_key"), sep)
    corpus = (packed
              .withColumn(stratum_col, F.array_join(
                  F.slice(parts, 1, F.size(parts) - 1), sep))
              .withColumn("split", F.element_at(parts, -1))
              .drop("_pack_key")
              .select(id_col, stratum_col, "split", "n_tokens",
                      "tok_offset", "first_seq", "last_seq"))

    from dgraph_spark.operators.pipeline_text import corpus_report

    rep_src = split.drop("split")
    if "lang" not in rep_src.columns:
        rep_src = rep_src.withColumn("lang", F.lit("und"))
    report = corpus_report(
        rep_src, stratum_col=stratum_col,
        text_col=text_col, id_col=id_col)
    return {"corpus": corpus, "report": report}
