"""Synthesize an sf1-equivalent dataset by replicating the sf0.1 tables
10x with key offsets (join integrity preserved: every foreign key gets
the same per-replica offset as its target's primary key). Produces the
scaling-curve evidence for the headline bench: the same queries at 10x
the rows, written to --out (default /tmp/sf1_synth).

Names are ALSO suffixed per replica (c_name, s_name, p_name, user_id,
doc text) so name-keyed filters keep per-key selectivity instead of
returning 10 copies of one entity.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = 100_000_000  # per-replica key offset; stays far below the uid tag space


def main(out: str = "/tmp/sf1_synth", src: str = "/root/testdata/sf0.1",
         copies: int | str = 10) -> None:
    copies = int(copies)
    from pyspark.sql import functions as F

    from dgraph_spark import get_spark
    from dgraph_spark.sources.events import read_events

    spark = get_spark("scale-data")
    spark.sparkContext.setLogLevel("ERROR")

    def reps(df, fn):
        parts = [fn(df, i) for i in range(copies)]
        outdf = parts[0]
        for p in parts[1:]:
            outdf = outdf.unionByName(p)
        return outdf

    def shift(col, i):
        return (F.col(col) + F.lit(i * OFF)).alias(col)

    def suffix(col, i):
        return (F.concat(F.col(col), F.lit(f"_R{i}")) if i else F.col(col)).alias(col)

    # dimensions stay as-is (broadcast side at any scale)
    for t in ("region", "nation"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{out}/{t}.parquet")

    plans = {
        "customer": lambda df, i: df.select(
            shift("c_custkey", i), suffix("c_name", i), "c_nationkey",
            "c_acctbal", "c_mktsegment"),
        "supplier": lambda df, i: df.select(
            shift("s_suppkey", i), suffix("s_name", i), "s_nationkey",
            "s_acctbal"),
        "part": lambda df, i: df.select(
            shift("p_partkey", i), suffix("p_name", i), "p_brand", "p_type",
            "p_size", "p_retailprice"),
        "orders": lambda df, i: df.select(
            shift("o_orderkey", i), shift("o_custkey", i), "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority"),
        "lineitem": lambda df, i: df.select(
            shift("l_orderkey", i), shift("l_partkey", i),
            shift("l_suppkey", i), "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate"),
        # replica texts must be DISTINCT documents, not near-dups of the
        # original (suffixing every word keeps length/term statistics but
        # shares no shingles), so dedup scaling measures 10x corpus size
        # with the same per-replica duplicate structure
        "documents": lambda df, i: df.select(
            shift("doc_id", i),
            (F.array_join(F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit(f"r{i}"))), " ") if i
             else F.col("text")).alias("text"),
            "lang", "source", "n_chars"),
        "embeddings": lambda df, i: df.select(
            shift("vec_id", i), "embedding", "label"),
    }
    nparts = 8 if copies <= 10 else 32
    for t, fn in plans.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        reps(df, fn).repartition(nparts).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet")

    ev = read_events(spark, src)
    reps(ev, lambda df, i: df.select(
        shift("event_id", i), "ts", shift("user_id", i), "event_type",
        "value", "props")).repartition(nparts).write.mode(
        "overwrite").parquet(f"{out}/events.parquet")
    print(f"# wrote {copies}x replicas of {src} to {out}", file=sys.stderr)


if __name__ == "__main__":
    main(*sys.argv[1:])
