"""Structured Streaming: windowed aggs vs batch goldens, CDC diff."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dgraph_spark.sources.events import read_events
from dgraph_spark.streaming.cdc import graph_diff
from dgraph_spark.streaming.windows import session_agg, stream_events, tumbling_agg
from tests.conftest import SF_SMALL


def test_tumbling_batch_equals_manual(spark):
    ev = read_events(spark, SF_SMALL)
    out = tumbling_agg(ev, "1 hour", keys=["event_type"], aggs={"value": "sum"})
    got = {(r["ws"], r["event_type"]): (r["cnt"], round(r["sum_value"], 6)) for r in out.collect()}
    manual = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 6).alias("s"))
    )
    want = {(r["ws"], r["event_type"]): (r["c"], r["s"]) for r in manual.collect()}
    assert got == want


def test_streaming_tumbling_matches_batch(spark):
    ev = read_events(spark, SF_SMALL).limit(200)
    tmp = tempfile.mkdtemp(prefix="dgs_stream_")
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    rows = ev.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts"),
        "user_id", "event_type", "value",
    ).collect()
    # two file arrivals == two micro-batches
    for part, chunk in enumerate([rows[:100], rows[100:]]):
        with open(os.path.join(src, f"part{part}.json"), "w") as f:
            for r in chunk:
                f.write(json.dumps(r.asDict(), default=str) + "\n")

    stream = stream_events(
        spark, src,
        schema="event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    agg = tumbling_agg(stream, "1 hour", keys=["event_type"])
    q = (
        agg.writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["ws"], r["event_type"]): r["cnt"]
            for r in spark.sql("SELECT * FROM t_tumbling").collect()
        }
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)

    batch_df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd'T'HH:mm:ss"))
    batch = tumbling_agg(batch_df, "1 hour", keys=["event_type"])
    want = {(r["ws"], r["event_type"]): r["cnt"] for r in batch.collect()}
    assert got == want


def test_watermark_append_mode_drops_late_data(spark):
    """Append-mode windowed agg: a window only emits once the watermark
    passes it, and data later than the watermark is dropped — the core
    late-data contract."""
    tmp = tempfile.mkdtemp(prefix="dgs_wm_")
    src = os.path.join(tmp, "in")
    os.makedirs(src)

    def write_batch(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for ts, et in rows:
                f.write(json.dumps({"event_id": 1, "ts": ts, "user_id": 1,
                                    "event_type": et, "value": 1.0}) + "\n")

    # batch 0: events in hour 10 and hour 12 (watermark -> 12:30 - 1h = 11:30)
    write_batch("b0.json", [
        ("2024-01-01T10:05:00", "a"), ("2024-01-01T10:20:00", "a"),
        ("2024-01-01T12:30:00", "b"),
    ])
    stream = stream_events(
        spark, src,
        schema="event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    agg = tumbling_agg(stream, "1 hour", keys=["event_type"], watermark="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("t_wm")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # batch 1: a LATE event for hour 10 (older than watermark 11:30) plus
        # an event advancing the watermark past hour 12
        write_batch("b1.json", [
            ("2024-01-01T10:40:00", "a"),          # late -> dropped
            ("2024-01-01T14:10:00", "c"),          # advances watermark to 13:10
        ])
        q.processAllAvailable()
        rows = {(str(r["ws"]), r["event_type"]): r["cnt"]
                for r in spark.sql("SELECT * FROM t_wm").collect()}
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    # hour-10 'a' window emitted with the ON-TIME count only (2, not 3)
    assert rows[("2024-01-01 10:00:00", "a")] == 2
    # hour-12 'b' emitted once the watermark passed it
    assert rows[("2024-01-01 12:00:00", "b")] == 1
    # hour-14 'c' window NOT emitted (watermark hasn't passed it)
    assert ("2024-01-01 14:00:00", "c") not in rows


def test_session_windows(spark):
    ev = read_events(spark, SF_SMALL)
    out = session_agg(ev, gap="5 minutes", keys=["user_id"])
    rows = out.limit(10).collect()
    assert all(r["we"] > r["ws"] for r in rows)


def test_cdc_graph_diff(spark):
    from dgraph_spark.mutations import delete_nquads, set_nquads
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    lines = spark.createDataFrame(
        [('<0x1> <name> "A" .',), ("<0x1> <friend> <0x2> .",)], "value string"
    )
    g = graph_from_triples(spark, parse_nquads(lines),
                           SchemaRegistry.parse("name: string .\nfriend: [uid] ."))
    g2 = set_nquads(g, "<0x1> <friend> <0x3> .")
    g2 = delete_nquads(g2, "<0x1> <friend> <0x2> .")
    events = {(r["op"], r["predicate"], r["object_uid"]) for r in graph_diff(g, g2).collect()}
    assert ("set", "friend", 3) in events
    assert ("del", "friend", 2) in events
