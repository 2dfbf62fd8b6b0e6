"""Warehouse persistence: the 100 TB storage layout.

Two layouts (SURVEY.md §7 storage decision):

1. `write_triples_partitioned`: one long triples dataset partitioned by
   predicate — predicate pruning on read == dgraph tablet routing; ideal
   for full-graph interchange and CDC tailing.

2. `write_bucketed`: per-predicate tables bucketed + sorted by subject
   via the session catalog. Bucketing co-locates every predicate's rows
   for the same subject range, so uid-equality traversal joins between
   bucketed predicates run WITHOUT a shuffle exchange (verified in
   tests by asserting the physical plan has no Exchange) — the Spark
   equivalent of dgraph's "one network hop per query level" property
   (paper/dgraph.tex:104).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dgraph_spark.model import Graph
from dgraph_spark.schema import SchemaRegistry


def _safe(name: str) -> str:
    return "p_" + re.sub(r"[^A-Za-z0-9_]", "_", name)


def write_triples_partitioned(graph: Graph, path: str, mode: str = "overwrite") -> None:
    """Long-format triples, partitioned by predicate (tablet layout)."""
    graph.to_triples().write.mode(mode).partitionBy("predicate").parquet(path)


def read_triples_partitioned(spark: SparkSession, path: str, schema: SchemaRegistry) -> Graph:
    from dgraph_spark.sources.rdf import graph_from_triples

    return graph_from_triples(spark, spark.read.parquet(path), schema)


def write_bucketed(
    graph: Graph, database: str, buckets: int = 16, mode: str = "overwrite"
) -> None:
    """Persist each predicate as a bucketed+sorted catalog table.

    At cluster scale `buckets` is sized so each bucket's hottest
    predicate fits an executor core's working set; all predicates share
    the same bucket count + key so ANY pair co-locates."""
    spark = graph.spark
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, df in graph.preds.items():
        (
            df.write.mode(mode)
            .bucketBy(buckets, "subject")
            .sortBy("subject")
            .saveAsTable(f"{database}.{_safe(name)}")
        )
    meta = graph.spark.createDataFrame(
        [(n, graph.schema.to_json()) for n in graph.preds],
        "pred string, schema_json string",
    )
    meta.write.mode(mode).saveAsTable(f"{database}.graph_meta")


def read_bucketed(spark: SparkSession, database: str) -> Graph:
    rows = spark.table(f"{database}.graph_meta").collect()
    schema = SchemaRegistry.from_json(rows[0]["schema_json"])
    preds = {r["pred"]: spark.table(f"{database}.{_safe(r['pred'])}") for r in rows}
    return Graph(spark=spark, preds=preds, schema=schema)
