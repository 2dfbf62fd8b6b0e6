"""Query planning/execution: AST blocks -> DataFrame plans.

Everything here is declarative DataFrame composition — Catalyst does
pushdown/pruning/join strategy; the only driver-side logic is block
scheduling (variable topo-order, reference query/query.go:2899) and
iterative algorithms (recurse/shortest, reference query/recurse.go,
query/shortest.go).
"""

from dgraph_spark.plans.executor import Executor

__all__ = ["Executor"]
