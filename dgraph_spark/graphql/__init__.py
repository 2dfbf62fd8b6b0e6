"""GraphQL façade: auto-generated query API over the graph schema
(reference: graphql/schema/gqlschema.go generated fields,
graphql/resolve/query_rewriter.go rewrite to DQL).
"""

from dgraph_spark.graphql.mutations import execute_graphql_mutation
from dgraph_spark.graphql.resolver import execute_graphql_ref
from dgraph_spark.graphql.rewriter import execute_graphql, graphql_to_dql

__all__ = ["execute_graphql", "execute_graphql_mutation",
           "execute_graphql_ref", "graphql_to_dql"]
