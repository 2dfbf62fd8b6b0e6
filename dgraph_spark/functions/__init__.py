"""Scalar/tokenizer/vector/geo function library (JVM-side first).

Mirrors the reference tokenizer set (tok/tok.go) and geo filters
(types/geofilter.go) with built-in pyspark.sql.functions wherever
possible; Python UDFs only where semantics genuinely require them.
"""
