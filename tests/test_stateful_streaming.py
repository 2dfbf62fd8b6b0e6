"""applyInPandasWithState custom stateful operators: real micro-batch
runs with state carried across batches."""

import json
import os
import shutil
import tempfile

import pyspark.sql.functions as F

from dgraph_spark.streaming.stateful import running_counts, running_dedup


def _stream_fixture(spark, tmp, rows_batches):
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    for i, rows in enumerate(rows_batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return spark.readStream.schema("user_id long, value double").json(src)


def test_running_counts_state_across_batches(spark):
    tmp = tempfile.mkdtemp(prefix="dgs_state_")
    try:
        stream = _stream_fixture(
            spark, tmp,
            [
                [{"user_id": 1, "value": 2.0}, {"user_id": 1, "value": 3.0},
                 {"user_id": 2, "value": 1.0}],
            ],
        )
        out = running_counts(stream, "user_id")
        q = (
            out.writeStream.format("memory").queryName("t_counts")
            .outputMode("update").start()
        )
        try:
            q.processAllAvailable()
            # second batch arrives later -> state must accumulate
            with open(os.path.join(tmp, "in", "b1.json"), "w") as f:
                f.write(json.dumps({"user_id": 1, "value": 5.0}) + "\n")
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM t_counts").collect()
        finally:
            q.stop()
        latest = {}
        for r in rows:
            latest[r["key"]] = (r["total"], r["total_value"])
        assert latest["1"] == (3, 10.0)
        assert latest["2"] == (1, 1.0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_running_dedup_emits_once(spark):
    tmp = tempfile.mkdtemp(prefix="dgs_dedup_")
    try:
        stream = _stream_fixture(
            spark, tmp,
            [[{"user_id": 7, "value": 1.0}, {"user_id": 8, "value": 1.0}]],
        )
        out = running_dedup(stream, "user_id")
        q = (
            out.writeStream.format("memory").queryName("t_dedup")
            .outputMode("append").start()
        )
        try:
            q.processAllAvailable()
            with open(os.path.join(tmp, "in", "b1.json"), "w") as f:
                f.write(json.dumps({"user_id": 7, "value": 9.0}) + "\n")
                f.write(json.dumps({"user_id": 9, "value": 9.0}) + "\n")
            q.processAllAvailable()
            keys = [r["key"] for r in spark.sql("SELECT * FROM t_dedup").collect()]
        finally:
            q.stop()
        # 7 emitted once (first batch), 9 emitted in second batch
        assert sorted(keys) == ["7", "8", "9"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_batch_fallback(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 1.0)], "user_id long, value double"
    )
    rows = {r["key"]: (r["total"], r["total_value"])
            for r in running_counts(df, "user_id").collect()}
    assert rows == {"1": (2, 5.0), "2": (1, 1.0)}
