"""Warehouse layouts: predicate-partitioned triples and bucketed
co-located joins (shuffle-free traversal)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dgraph_spark.schema import SchemaRegistry
from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads
from dgraph_spark.sources.warehouse import (
    read_bucketed,
    read_triples_partitioned,
    write_bucketed,
    write_triples_partitioned,
)

NQ = "\n".join(
    [f'<{i}> <name> "n{i}" .' for i in range(1, 40)]
    + [f"<{i}> <friend> <{i + 1}> ." for i in range(1, 39)]
)
SCHEMA = "name: string .\nfriend: [uid] ."


@pytest.fixture(scope="module")
def small_graph(spark):
    lines = spark.createDataFrame([(l,) for l in NQ.splitlines()], "value string")
    return graph_from_triples(spark, parse_nquads(lines), SchemaRegistry.parse(SCHEMA))


def test_partitioned_triples_roundtrip(spark, small_graph):
    tmp = tempfile.mkdtemp(prefix="dgs_wh_")
    try:
        write_triples_partitioned(small_graph, f"{tmp}/triples")
        g2 = read_triples_partitioned(spark, f"{tmp}/triples", SchemaRegistry.parse(SCHEMA))
        assert g2.pred("friend").count() == small_graph.pred("friend").count()
        # predicate pruning: reading one predicate only lists its partition
        plan = g2.pred("name")._jdf.queryExecution().executedPlan().toString()
        assert "friend" not in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, small_graph):
    write_bucketed(small_graph, "dgs_test_db", buckets=4)
    try:
        g2 = read_bucketed(spark, "dgs_test_db")
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = g2.pred("friend").join(
                g2.pred("name").withColumnRenamed("value", "nm"), "subject"
            )
            assert joined.count() == 38
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # bucketed co-location: uid join needs no Exchange
            assert "Exchange" not in plan or "ReusedExchange" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql("DROP DATABASE IF EXISTS dgs_test_db CASCADE")
