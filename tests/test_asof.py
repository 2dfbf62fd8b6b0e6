"""As-of / interval join: engine vs pandas.merge_asof (an entirely
independent implementation) and a naive pair enumeration. The DuckDB
native ASOF JOIN is the driver-oracle leg (entry `asof_join`)."""

import random

import pandas as pd
import pytest


def _mk_events(rng, n_users=8, n=200):
    rows = []
    t = 0
    for i in range(n):
        t += rng.randint(1, 300)
        rows.append((i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t),
                     rng.randrange(n_users), rng.choice("ab"),
                     round(rng.uniform(0, 100), 2)))
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                       "kind", "value"])


@pytest.mark.parametrize("seed", [20260816, 5])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    from dgraph_spark.operators.asof import asof_join

    rng = random.Random(seed)
    pdf = _mk_events(rng)
    left = pdf[pdf.kind == "a"].drop(columns=["kind"])
    right = pdf[pdf.kind == "b"].drop(columns=["kind"])
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got = {r["event_id"]: (r["r_event_id"], r["r_value"])
           for r in asof_join(sl, sr, on="user_id", ts_col="ts",
                              right_cols=("event_id", "value")).collect()}
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
        suffixes=("", "_r"))
    for _, row in exp.iterrows():
        want = (None if pd.isna(row["event_id_r"])
                else int(row["event_id_r"]),
                None if pd.isna(row["value_r"]) else row["value_r"])
        assert got[row["event_id"]] == want, row["event_id"]


@pytest.mark.parametrize("seed", [20260816, 5])
def test_asof_join_tolerance_matches_pandas(spark, seed):
    from dgraph_spark.operators.asof import asof_join

    rng = random.Random(seed)
    pdf = _mk_events(rng)
    left = pdf[pdf.kind == "a"].drop(columns=["kind"])
    right = pdf[pdf.kind == "b"].drop(columns=["kind"])
    got = {r["event_id"]: r["r_event_id"]
           for r in asof_join(
               spark.createDataFrame(left), spark.createDataFrame(right),
               on="user_id", ts_col="ts", right_cols=("event_id",),
               tolerance="10 minutes").collect()}
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
        tolerance=pd.Timedelta("10 minutes"), suffixes=("", "_r"))
    for _, row in exp.iterrows():
        want = (None if pd.isna(row["event_id_r"])
                else int(row["event_id_r"]))
        assert got[row["event_id"]] == want, row["event_id"]


@pytest.mark.parametrize("seed", [20260816])
def test_interval_join_matches_naive(spark, seed):
    from dgraph_spark.operators.asof import interval_join

    rng = random.Random(seed)
    pdf = _mk_events(rng)
    left = pdf[pdf.kind == "a"].drop(columns=["kind"])
    right = pdf[pdf.kind == "b"].drop(columns=["kind"])
    got = {(r["event_id"], r["r_event_id"]) for r in interval_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="user_id", ts_col="ts",
        lower="0 seconds", upper="5 minutes").collect()}
    want = set()
    for _, l in left.iterrows():
        for _, r in right.iterrows():
            if (l.user_id == r.user_id and r.ts >= l.ts
                    and r.ts <= l.ts + pd.Timedelta("5 minutes")):
                want.add((l.event_id, r.event_id))
    assert got == want


def test_asof_equal_ts_is_inclusive_and_tied_to_greatest(spark):
    from dgraph_spark.operators.asof import asof_join

    ts = pd.Timestamp("2024-01-01")
    left = spark.createDataFrame(
        pd.DataFrame({"event_id": [1], "ts": [ts], "user_id": [7]}))
    right = spark.createDataFrame(
        pd.DataFrame({"event_id": [10, 11], "ts": [ts, ts],
                      "user_id": [7, 7]}))
    r = asof_join(left, right, right_cols=("event_id",)).collect()[0]
    assert r["r_event_id"] == 11  # <= inclusive; tie -> greatest id


def test_interval_join_streaming_shape(spark, tmp_path):
    """Streaming inputs build a legal stream-stream interval join
    (watermarks applied; plan constructs without error)."""
    from dgraph_spark.operators.asof import interval_join

    pdf = _mk_events(random.Random(1))
    p = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(p)
    schema = spark.read.parquet(p).schema
    sl = spark.readStream.schema(schema).parquet(p)
    sr = spark.readStream.schema(schema).parquet(p)
    out = interval_join(sl, sr, on="user_id", ts_col="ts")
    assert out.isStreaming


@pytest.mark.parametrize("seed", [20260816, 5])
def test_sessionize_matches_naive(spark, seed):
    from dgraph_spark.operators.asof import sessionize

    rng = random.Random(seed)
    pdf = _mk_events(rng).drop(columns=["kind"])
    out = {r["event_id"]: r["session_seq"]
           for r in sessionize(
               spark.createDataFrame(pdf), gap="5 minutes").collect()}
    want = {}
    for uid, grp in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        seq, prev = -1, None
        for _, row in grp.iterrows():
            if prev is None or row.ts > prev + pd.Timedelta("5 minutes"):
                seq += 1
            want[row.event_id] = seq
            prev = row.ts
    assert out == want


def test_session_stats_consistency(spark):
    from dgraph_spark.operators.asof import session_stats, sessionize

    pdf = _mk_events(random.Random(3)).drop(columns=["kind"])
    sdf = spark.createDataFrame(pdf)
    stats = session_stats(sdf, gap="5 minutes").collect()
    per_event = sessionize(sdf, gap="5 minutes").collect()
    n_by_sess = {}
    for r in per_event:
        k = (r["user_id"], r["session_seq"])
        n_by_sess[k] = n_by_sess.get(k, 0) + 1
    assert {(r["user_id"], r["session_seq"]): r["n_events"]
            for r in stats} == n_by_sess
    assert all(r["dur_s"] >= 0 for r in stats)


def test_asof_join_null_payload_not_torn(spark):
    """A matched right row with a NULL payload field must yield NULL
    for that field — not a stale value carried from an older row
    (regression: per-column last(ignorenulls) tore rows)."""
    from dgraph_spark.operators.asof import asof_join

    t0 = pd.Timestamp("2024-01-01")
    left = spark.createDataFrame(
        pd.DataFrame({"event_id": [1], "ts": [t0 + pd.Timedelta("3s")],
                      "user_id": [1]}))
    right = spark.createDataFrame(
        [(10, (t0 + pd.Timedelta("1s")).to_pydatetime(), 1, 5.0),
         (11, (t0 + pd.Timedelta("2s")).to_pydatetime(), 1, None)],
        "event_id long, ts timestamp, user_id long, value double")
    r = asof_join(left, right, right_cols=("event_id", "value")
                  ).collect()[0]
    assert r["r_event_id"] == 11 and r["r_value"] is None


def test_asof_join_empty_right_cols_rejected(spark):
    from dgraph_spark.operators.asof import asof_join

    df = spark.createDataFrame(
        pd.DataFrame({"event_id": [1], "ts": [pd.Timestamp("2024-01-01")],
                      "user_id": [1]}))
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(df, df, right_cols=())


def test_asof_join_rejects_reserved_column_collisions(spark):
    """A left frame already using an internal helper name (_side/_rpay/
    _c) or a prefixed output name (r_ts, r_value, ...) must be refused
    loudly — silently overwriting it corrupts the carry."""
    from dgraph_spark.operators.asof import asof_join

    import datetime

    right = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 10, 1.0)],
        "user_id long, ts timestamp, event_id long, value double")
    for bad in ("_side", "r_ts", "r_value"):
        left = right.withColumnRenamed("event_id", bad)
        with pytest.raises(ValueError, match="collide"):
            asof_join(left, right)
    # a non-default prefix frees the default names
    left = right.withColumnRenamed("event_id", "r_ts")
    out = asof_join(left, right, prefix="x_")
    assert "x_ts" in out.columns and "r_ts" in out.columns
