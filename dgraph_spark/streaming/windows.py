"""Watermarked window aggregations over event streams.

Extension beyond the reference (dgraph has no stream operators —
SURVEY.md §2.11). The same functions run on BOTH batch and streaming
DataFrames (Structured Streaming's unified model); goldens therefore
come from batch SQL over the same rows, which is exactly the driver's
oracle strategy.

Scale: watermark bounds state; the window+key groupBy is the only
shuffle; for session windows state size ~ active sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, dir_path: str, schema: str | None = None) -> DataFrame:
    """File-source stream of event files appearing in ``dir_path``
    (json or parquet parts)."""
    schema = schema or "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    return spark.readStream.schema(schema).json(dir_path)


def _agg_exprs(aggs: dict[str, str] | None) -> list[Column]:
    out = [F.count("*").alias("cnt")]
    for col, fn in (aggs or {}).items():
        out.append(getattr(F, fn)(col).alias(f"{fn}_{col}"))
    return out


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Tumbling window counts/aggregates per key, watermarked for late
    data. Works on batch DataFrames too (watermark is a no-op there)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *(keys or []))
        .agg(*_agg_exprs(aggs))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "*")
        .drop("w")
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), *(keys or []))
        .agg(*_agg_exprs(aggs))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "*")
        .drop("w")
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Session windows (gap-based), the classic stateful streaming op."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *(keys or []))
        .agg(*_agg_exprs(aggs))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "*")
        .drop("w")
    )
