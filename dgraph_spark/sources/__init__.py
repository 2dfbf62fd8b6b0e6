"""Sources/sinks: loaders that produce a Graph, exporters that dump one.

Covers the reference's loader/exporter surface (SURVEY.md §2.1):
RDF N-Quads (chunker/rdf_parser.go), JSON docs (chunker/json_parser.go),
bulk load (dgraph/cmd/bulk — in Spark, a partitioned parquet write),
export (worker/export.go), plus the TPC-H-ish fixture mapping used for
oracle-checked correctness (FIXTURES.md §B).
"""

from dgraph_spark.sources.tpch_graph import load_tpch_graph

__all__ = ["load_tpch_graph"]
