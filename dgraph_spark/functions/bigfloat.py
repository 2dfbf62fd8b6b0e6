"""200-bit bigfloat arithmetic — the reference's bigfloat type is
arbitrary-precision big.Float at 200 bits (types/scalar_types.go:27
BigFloatPrecision, types/conversion.go SetPrec throughout). Values store
as their lexical strings (full fidelity); this module supplies:

- an ORDER-PRESERVING fixed-width sort key (pandas UDF) so comparisons,
  sorts, min/max run as plain JVM string comparisons after ONE
  Arrow-batched key computation per row — no driver round-trips, no
  row-at-a-time Python;
- 200-bit sum/avg as grouped-aggregate pandas UDFs (mpmath, mp.prec=200
  — the same round-to-nearest-even binary arithmetic as Go big.Float);
- per-row 200-bit math (ceil/floor/sqrt/+-*/ and unary minus) for
  math() over a bigfloat value variable;
- shortest-round-trip decimal rendering, the analogue of
  big.Float.Text('f', -1): the fewest digits that parse back to the
  same 200-bit value (query4_test.go TestBigFloatSum pins
  "123520.2462462464320000000001" exactly).
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

PREC = 200
# binary-exponent bias covering big.Float's full int32 exponent range
# (math/big: MaxExp = math.MaxInt32); biased values fit 10 digits
_BIAS = 1 << 31
_EXP_W = 10
_MANT_HEX = PREC // 4  # 50 hex chars hold the 200-bit mantissa


def _ctx():
    import mpmath

    ctx = mpmath.mp.clone()
    ctx.prec = PREC
    return ctx


def _parse(ctx, s: str):
    return ctx.mpf(s.strip())


# ------------------------------------------------------------- sort key
def key_py(s: str | None) -> str | None:
    """Order-preserving encoding: '1' for zero, '2'+biased-exponent+
    mantissa-hex for positives, '0'+inverted for negatives. String
    comparison of keys == numeric comparison of values."""
    if s is None:
        return None
    import mpmath

    ctx = _ctx()
    try:
        x = _parse(ctx, str(s))
    except (ValueError, TypeError):
        return None
    if x == 0:
        return "1" + "0" * (_EXP_W + _MANT_HEX)
    sign, man, exp, bc = x._mpf_
    # normalize mantissa to exactly PREC bits, top bit set
    man_n = man << (PREC - bc)
    e_adj = exp + bc  # x = 0.man_n * 2^e_adj
    if not -_BIAS < e_adj < _BIAS:
        # big.Float exponents are int32; beyond that the reference
        # panics with ErrNaN ("exponent overflow") — fail loudly rather
        # than emit a key that would sort wrong
        raise ValueError(f"bigfloat exponent overflow: {s!r}")
    if sign == 0:
        return f"2{e_adj + _BIAS:0{_EXP_W}d}{man_n:0{_MANT_HEX}x}"
    inv_e = 2 * _BIAS - (e_adj + _BIAS)
    inv_m = (1 << PREC) - 1 - man_n
    return f"0{inv_e:0{_EXP_W}d}{inv_m:0{_MANT_HEX}x}"


_UDF_CACHE: dict = {}


def _key_udf():
    if "key" not in _UDF_CACHE:
        @pandas_udf("string")
        def key(s: pd.Series) -> pd.Series:
            return s.map(key_py)
        _UDF_CACHE["key"] = key
    return _UDF_CACHE["key"]


def bigfloat_key(col: Column) -> Column:
    return _key_udf()(col.cast("string"))


# ------------------------------------------------------------- rendering
def render_py(s: str | None) -> Decimal | None:
    """Shortest decimal that round-trips to the same 200-bit value
    (big.Float.Text('f', -1) analogue), as a Decimal in plain
    (non-scientific) form."""
    if s is None:
        return None
    ctx = _ctx()
    try:
        x = _parse(ctx, str(s))
    except (ValueError, TypeError):
        return None
    if x == 0:
        return Decimal(0)
    import mpmath

    for d in range(1, 65):
        cand = mpmath.nstr(x, d, strip_zeros=True)
        if _parse(ctx, cand) == x:
            return Decimal(format(Decimal(cand), "f"))
    return Decimal(format(Decimal(mpmath.nstr(x, 64)), "f"))


# ------------------------------------------------------------ aggregates
def _agg_udf(op: str):
    if ("agg", op) in _UDF_CACHE:
        return _UDF_CACHE[("agg", op)]

    @pandas_udf("string")
    def agg(s: pd.Series) -> str:
        ctx = _ctx()
        vals = [_parse(ctx, v) for v in s.dropna()]
        if not vals:
            return None
        if op == "min":
            r = min(vals)
        elif op == "max":
            r = max(vals)
        else:
            r = vals[0]
            for v in vals[1:]:
                r = ctx.fadd(r, v)  # 200-bit round-to-nearest-even
            if op == "avg":
                r = ctx.fdiv(r, len(vals))
        return mpmath_str(ctx, r)

    _UDF_CACHE[("agg", op)] = agg
    return agg


def mpmath_str(ctx, x) -> str:
    """Full-fidelity lexical form (hex-free): shortest round-trip."""
    import mpmath

    if x == 0:
        return "0"
    for d in range(1, 65):
        cand = mpmath.nstr(x, d, strip_zeros=True)
        if _parse(ctx, cand) == x:
            return cand
    return mpmath.nstr(x, 64)


def bigfloat_agg(op: str):
    """Grouped-aggregate pandas UDF for sum/avg/min/max over lexical
    bigfloat strings (lazy: pandas UDFs need an active session)."""
    return _agg_udf(op)


# ------------------------------------------------------------- math eval
def bigfloat_math_udf(fn_tree):
    """Compile a math AST (MathNode with a SINGLE value-variable leaf)
    into a per-row pandas UDF over the variable's lexical strings.
    Supported ops: + - * / % unary-, ceil, floor, sqrt, min, max —
    enough for the reference's bigfloat math surface (query4_test.go
    TestBigFloatCeil/Floor/Sqrt)."""

    def compile_node(node):
        if node.op is None:
            if node.var is not None:
                return lambda ctx, x: x
            c = node.const
            return lambda ctx, x, c=c: ctx.mpf(str(c))
        kids = [compile_node(k) for k in node.children]
        op = node.op

        def ev(ctx, x):
            a = [k(ctx, x) for k in kids]
            if op == "+":
                return ctx.fadd(a[0], a[1]) if len(a) > 1 else a[0]
            if op == "-":
                return ctx.fsub(a[0], a[1]) if len(a) > 1 else ctx.fneg(a[0])
            if op == "*":
                return ctx.fmul(a[0], a[1])
            if op == "/":
                return ctx.fdiv(a[0], a[1])
            if op == "%":
                return ctx.fmod(a[0], a[1])
            if op == "ceil":
                return ctx.ceil(a[0])
            if op == "floor":
                return ctx.floor(a[0])
            if op == "sqrt":
                return ctx.sqrt(a[0])
            if op == "min":
                return min(a)
            if op == "max":
                return max(a)
            raise ValueError(f"math op {op!r} unsupported for bigfloat")

        return ev

    root = compile_node(fn_tree)

    @pandas_udf("string")
    def evaluate(s: pd.Series) -> pd.Series:
        ctx = _ctx()

        def one(v):
            if v is None:
                return None
            return mpmath_str(ctx, root(ctx, _parse(ctx, str(v))))

        return s.map(one)

    return evaluate


def math_tree_supported(node) -> bool:
    if node.op is None:
        return True
    if node.op not in {"+", "-", "*", "/", "%", "ceil", "floor", "sqrt",
                       "min", "max"}:
        return False
    return all(math_tree_supported(k) for k in node.children)


def math_tree_vars(node) -> set[str]:
    out = set()
    if node.var is not None:
        out.add(node.var)
    for k in node.children:
        out |= math_tree_vars(k)
    return out
