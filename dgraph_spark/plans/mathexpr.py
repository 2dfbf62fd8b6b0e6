"""math() expression compiler: MathNode -> pyspark Column.

Op set mirrors dql/math.go:148-157 (+ - * / % pow logbase exp ln sqrt
floor ceil u- min max dot cond since and comparisons); evaluation
semantics from query/math.go. Everything compiles to built-in column
expressions (whole-stage codegen); vector ops use higher-order functions
(zip_with/aggregate) per SURVEY.md §2.6.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from dgraph_spark.dql.ast import MathNode


def compile_math(node: MathNode, resolve: Callable[[str], Column],
                 int_var: Callable[[str], bool] | None = None) -> Column:
    """``resolve(varname)`` maps a value-variable name to its Column.
    ``int_var(varname)`` reports whether a variable holds INT values:
    Go's typed aggregator divides int/int as integer division
    (query/aggregator.go applyDiv on types.IntID), so `sum(int)/count`
    truncates — Spark's `/` would promote to double."""

    def is_int(n: MathNode) -> bool:
        if n.var is not None:
            return int_var is not None and int_var(n.var)
        if n.op is None:
            return isinstance(n.const, int) and not isinstance(n.const, bool)
        if n.op in ("+", "-", "*", "/", "%", "u-"):
            return all(is_int(c) for c in n.children)
        return False

    def go(n: MathNode) -> Column:
        if n.var is not None:
            return resolve(n.var)
        if n.const is not None or (n.op is None and not n.children):
            return F.lit(n.const)
        ch = [go(c) for c in n.children]
        op = n.op
        if op in ("+", "-", "*", "/", "%"):
            # a missing (null) operand is SKIPPED, not nulling the whole
            # expression: the aggregator applies present values only, so
            # the result is the other side verbatim
            # (query/math.go:48-75 processBinary + aggregator.ApplyVal)
            a, b = ch
            div = a / b
            if op == "/" and is_int(n):
                # int/int truncates toward zero (Go integer division)
                div = (a / b).cast("long")
            raw = {"+": a + b, "-": a - b, "*": a * b,
                   "/": div, "%": a % b}[op]
            return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(raw)
        if op == "u-":
            return -ch[0]
        if op == "pow":
            return F.pow(ch[0], ch[1])
        if op == "logbase":
            # logbase(x, b) = ln(x)/ln(b)  (dql/math.go logbase)
            return F.log(ch[0]) / F.log(ch[1])
        if op == "exp":
            return F.exp(ch[0])
        if op == "ln":
            # Go math.Log(0) = -Inf; the reference's JSON encoder emits it
            # as -MaxFloat64 (query/outputnode.go float marshalling) —
            # Spark's SQL log(0) would yield null and silently drop the
            # term through the binary-op null-skip
            return F.when(
                ch[0] == 0, F.lit(-1.7976931348623157e308)
            ).otherwise(F.log(ch[0]))
        if op == "sqrt":
            return F.sqrt(ch[0])
        if op == "floor":
            return F.floor(ch[0])
        if op == "ceil":
            return F.ceil(ch[0])
        if op == "min":
            return F.least(*ch)
        if op == "max":
            return F.greatest(*ch)
        if op == "dot":
            # float32vector dot product, JVM-side higher-order funcs
            return F.aggregate(
                F.zip_with(ch[0], ch[1], lambda x, y: x * y),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
        if op == "cond":
            return F.when(ch[0], ch[1]).otherwise(ch[2])
        if op == "since":
            # seconds since timestamp (query/aggregator.go:566-574)
            return F.unix_timestamp(F.current_timestamp()) - F.unix_timestamp(ch[0])
        if op in ("<", ">", "<=", ">=", "==", "!="):
            a, b = ch
            return {
                "<": a < b, ">": a > b, "<=": a <= b,
                ">=": a >= b, "==": a == b, "!=": a != b,
            }[op]
        raise NotImplementedError(f"math op {op!r}")

    return go(node)


def math_vars(node: MathNode) -> set[str]:
    """All value-variable names referenced in the expression."""
    out: set[str] = set()

    def go(n: MathNode) -> None:
        if n.var is not None:
            out.add(n.var)
        for c in n.children:
            go(c)

    go(node)
    return out
