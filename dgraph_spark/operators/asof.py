"""As-of and interval (range) joins over event streams — the two
time-series join shapes Spark has no native operator for (and the
reference has no notion of at all; training/analytics pipelines need
them for sessionization, attribution and feature backfill).

`asof_join` — for each left row, the LATEST right row with
``right.ts <= left.ts`` per key — uses the union+window formulation,
NOT a range join: tag both sides, union, sort each key's timeline
once, and carry the last right payload forward with
``last(ignorenulls)``. That is ONE shuffle (the window sort on the
key), zero join blowup, and state bounded by a row — the only shape
that survives 100 TB, where a naive range join explodes to
|left|x|right| per key before filtering. Right rows sort BEFORE left
rows at equal timestamps (<= semantics); ties among right rows at the
same timestamp resolve to the greatest order column.

`interval_join` — all (left, right) pairs with
``right.ts ∈ [left.ts + lower, left.ts + upper]`` per key. This one
IS a range join (the output genuinely is the pair set); Spark executes
the equi-key + range predicate as a hash join on the key with the
range as a post-filter. Both functions run unchanged on streaming
DataFrames (watermarks applied when streaming — Structured Streaming's
stream-stream interval join contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("event_id", "value"),
    tolerance: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left rows + the latest preceding right row's ``right_cols``
    (NULL when no right row precedes). ``tolerance`` (e.g. '30
    minutes') drops matches older than ``left.ts - tolerance``,
    matching pandas ``merge_asof``'s parameter."""
    if not right_cols:
        raise ValueError("right_cols must name at least one column")
    # the union+window machinery reserves helper names, and the output
    # adds prefixed right columns — a left frame already using any of
    # them would be silently overwritten / duplicated
    reserved = {"_side", "_rpay", "_c", f"{prefix}{ts_col}",
                *(f"{prefix}{c}" for c in right_cols)}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with "
            f"internal helper / prefixed output names; rename them or "
            f"pass a different prefix")
    rsel = right.select(
        F.col(on), F.col(ts_col),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols])
    # dedupe right per (key, ts) to the greatest first payload column:
    # deterministic <=-tie resolution in every engine
    tie = Window.partitionBy(on, ts_col).orderBy(
        F.desc(f"{prefix}{right_cols[0]}"))
    rsel = (rsel.withColumn("_rn", F.row_number().over(tie))
            .where(F.col("_rn") == 1).drop("_rn"))
    # the whole right payload rides ONE struct carried by a single
    # last(ignorenulls): per-column carries would tear rows when a
    # matched row's payload field is legitimately NULL (the carry
    # would reach back to an older row for just that field)
    rt = (rsel.select(
        F.col(on), F.col(ts_col),
        F.struct(F.col(ts_col).alias("ts"),
                 *[F.col(f"{prefix}{c}").alias(c) for c in right_cols])
         .alias("_rpay"))
        .withColumn("_side", F.lit(0)))
    lt = left.withColumn("_side", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (Window.partitionBy(on).orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.select(
        "*", F.last("_rpay", ignorenulls=True).over(w).alias("_c"))
    keep = F.col("_c").isNotNull()
    if tolerance is not None:
        keep = keep & (F.col("_c.ts")
                       >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}"))
    return (u.where(F.col("_side") == 1)
            .select(*left.columns,
                    F.when(keep, F.col("_c.ts"))
                     .alias(f"{prefix}{ts_col}"),
                    *[F.when(keep, F.col(f"_c.{c}"))
                       .alias(f"{prefix}{c}") for c in right_cols]))


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    on: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Gap-based session assignment (the batch counterpart of the
    streaming session window): a new session starts when the gap to
    the key's previous event exceeds ``gap``. Adds ``session_seq``
    (0-based per key, in (ts, order_col) order). One window shuffle on
    the key; the running sum is the standard gaps-and-islands
    formulation, identical in the SQL twin."""
    w = Window.partitionBy(on).orderBy(ts_col, order_col)
    prev = F.lag(ts_col).over(w)
    is_new = (prev.isNull()
              | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}")))
    return events.withColumn(
        "session_seq",
        F.sum(is_new.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.currentRow)) - 1)


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    on: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup over `sessionize`: (key, session_seq,
    n_events, dur_s, sum_value). Duration in whole seconds (second
    boundaries crossed — identical semantics in Spark unix_timestamp
    subtraction and DuckDB date_diff)."""
    s = sessionize(events, gap=gap, on=on, ts_col=ts_col,
                   order_col=order_col)
    return (s.groupBy(on, "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max(ts_col))
         - F.unix_timestamp(F.min(ts_col))).alias("dur_s"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    ))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    watermark: str = "1 hour",
    prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with the right timestamp in
    ``[left.ts + lower, left.ts + upper]`` and equal keys. On
    streaming inputs both sides get the watermark (required for
    Spark's stream-stream join state eviction)."""
    lt, rt = left, right
    if lt.isStreaming:
        lt = lt.withWatermark(ts_col, watermark)
    if rt.isStreaming:
        rt = rt.withWatermark(ts_col, watermark)
    rt = rt.select(*[F.col(c).alias(f"{prefix}{c}") for c in rt.columns])
    cond = (
        (lt[on] == rt[f"{prefix}{on}"])
        & (rt[f"{prefix}{ts_col}"]
           >= lt[ts_col] + F.expr(f"INTERVAL {lower}"))
        & (rt[f"{prefix}{ts_col}"]
           <= lt[ts_col] + F.expr(f"INTERVAL {upper}"))
    )
    return lt.join(rt, cond)
