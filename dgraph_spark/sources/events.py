"""Events table reader — normalizes nanosecond parquet timestamps.

The driver's events.parquet stores TIMESTAMP(NANOS), which Spark's
parquet reader rejects by default. We read nanos as long (legacy conf)
and convert to microsecond TimestampType, which is what every window/
watermark operator expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        # integer division — float division loses microsecond precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df
