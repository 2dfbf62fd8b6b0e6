"""DQL front-end: lexer + recursive-descent parser -> AST dataclasses.

Grammar follows the reference's hand-rolled parser (dql/parser.go:615
Parse, FilterTree at dql/parser.go:156, math trees dql/math.go) — the
surface, not the implementation.
"""

from dgraph_spark.dql.ast import Attr, Block, FilterTree, FuncCall, ParsedQuery
from dgraph_spark.dql.parser import parse_dql

__all__ = ["Attr", "Block", "FilterTree", "FuncCall", "ParsedQuery", "parse_dql"]
