"""dgraph_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dgraph-io/dgraph.

Architecture (see SURVEY.md):
  - Data model: per-predicate DataFrames (columnar tablets), mirroring
    dgraph's predicate-sharded posting lists (reference: x/keys.go:26-42,
    posting/list.go:70-78) — but expressed as Parquet-backed relations.
  - Queries: DQL parsed by a hand-rolled recursive-descent parser
    (reference grammar: dql/parser.go), compiled to declarative DataFrame
    plans so Catalyst handles pushdown/pruning/join-selection.
  - Traversal: one query level == one uid-equality join
    (reference: worker/task.go:1012 processTask).
"""

from dgraph_spark.model import Graph
from dgraph_spark.schema import Predicate, SchemaRegistry
from dgraph_spark.session import get_spark

__all__ = ["Graph", "Predicate", "SchemaRegistry", "get_spark"]
__version__ = "0.1.0"
