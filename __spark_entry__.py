"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship traversal query on sf0.001 (smoke).
queries()     -> one callable per implemented operator (SURVEY.md §2).
oracle_sql()  -> DuckDB twin SQL per query (t2 correctness gate).

Implementation lives in dgraph_spark/ (see SURVEY.md §7 build plan);
the registry itself is dgraph_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from dgraph_spark.entry_queries import QUERIES, entry_flagship, resolve_sql


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: resolve_sql(sql)
            for name, (_fn, sql) in QUERIES.items() if sql is not None}
