"""CDC egress (reference: worker/cdc.go:44-260 — txn change events to
Kafka/file). In the batch/snapshot model, a change feed is the diff of
two graph snapshots; for live tailing, a writeStream over the triples
directory.

At scale: the diff is two anti-joins per predicate, each pruned to that
predicate's files; the streaming variant is incremental (file-source
tracks new part files only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dgraph_spark.model import Graph


def graph_diff(old: Graph, new: Graph) -> DataFrame:
    """Change events between snapshots: (op 'set'|'del', subject,
    predicate, object_uid, value_str) — the CDC event payload shape
    (worker/cdc.go events are txn set/del lists)."""
    o = old.to_triples()
    n = new.to_triples()
    keys = ["subject", "predicate", "object_uid", "value_str"]

    def anti(a: DataFrame, b: DataFrame) -> DataFrame:
        # null-safe equality: object_uid is NULL for scalar triples and
        # value_str NULL for uid triples — a plain join key would never
        # match them and report the whole graph as churn
        bb = b.select(*[F.col(k).alias(f"_b_{k}") for k in keys])
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"_b_{k}"))
            cond = c if cond is None else (cond & c)
        return a.join(bb, cond, "left_anti")

    added = anti(n, o).withColumn("op", F.lit("set"))
    removed = anti(o, n).withColumn("op", F.lit("del"))
    return added.unionByName(removed).select("op", *keys)


def stream_triples(spark, triples_dir: str) -> DataFrame:
    """Tail a triples parquet directory as a stream (new part files ==
    new committed batches)."""
    return spark.readStream.schema(
        "subject long, predicate string, object_uid long, value_str string"
    ).parquet(triples_dir)


def write_cdc(changes: DataFrame, out_dir: str, checkpoint: str, fmt: str = "json"):
    """Egress a (streaming) change DataFrame to a sink directory —
    stand-in for the reference's Kafka sink (worker/cdc.go SinkHandler);
    swap `format("kafka")` in deployments with a broker."""
    return (
        changes.writeStream.format(fmt)
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
