"""Local stand-in for the driver's t2 correctness gate: run every
QUERIES entry on Spark and its oracle SQL on DuckDB over the same
parquet, compare row count + sorted-by-name columns + canonicalized
values. Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("\x1f".join(canon(r[i]) for i in idx))
    return sorted(out)


def _native(v):
    """Pandas cell -> python-native value. Both legs are fetched ONCE
    as pandas (the Spark query used to run twice: collect() for values
    + toPandas() for the dtype gate) and their rows derived through
    THIS one converter, so NULL/NaN/timestamp semantics stay aligned
    between the legs by construction."""
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    # pandas renders NULLs as NaN (DuckDB .df() even for string
    # columns; Spark toPandas for numeric ones) — collapse to None on
    # BOTH legs, which is also the driver canonicalizer's behavior
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if type(v).__name__ == "ndarray":
        return tuple(_native(x) for x in v.tolist())
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        return v.item()
    return v


def frame_rows(df):
    return [tuple(_native(v) for v in r)
            for r in df.itertuples(index=False, name=None)]


def _dtype_kind(dt):
    """Collapse a pandas dtype to the equivalence class the driver's
    value hash is sensitive to. int64-vs-float64 (DuckDB HUGEINT sums)
    is THE class that burned rounds 7 and 8; datetime resolution
    (ns vs us) and string-vs-object are canonicalized away upstream,
    so only the numeric/bool/datetime/object split matters."""
    import pandas.api.types as pt

    if pt.is_bool_dtype(dt):
        return "bool"
    if pt.is_integer_dtype(dt):
        return "int"
    if pt.is_float_dtype(dt):
        return "float"
    if pt.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def dtype_problems(spdf, odf):
    """The driver hashes pandas frames, and its hash is dtype-sensitive
    (512 vs 512.0 differ) and crashes outright on unhashable cells
    (lists). check_oracle's string canon hid both classes in round 8 —
    these checks make the local gate as strict as the driver's."""
    problems = []
    for c in sorted(set(spdf.columns) & set(odf.columns)):
        # an all-NULL column types as float64 in pandas regardless of
        # its SQL type (recurse_depth5's sparse level columns) — the
        # driver canonicalizes NULLs before hashing, so no signal there
        if spdf[c].isna().all() or odf[c].isna().all():
            continue
        sk, ok = _dtype_kind(spdf[c].dtype), _dtype_kind(odf[c].dtype)
        if sk != ok:
            problems.append(f"dtype[{c}] spark={sk} oracle={ok}")
    for side, df in (("spark", spdf), ("oracle", odf)):
        for c in df.columns:
            col = df[c].dropna()
            if len(col) == 0:
                continue
            cell = col.iloc[0]
            if (isinstance(cell, (list, tuple, dict, set))
                    or type(cell).__name__ == "ndarray"):
                problems.append(
                    f"unhashable {side} column {c} "
                    f"({type(cell).__name__} cells crash the "
                    "driver's canonicalizer)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # computed oracles (bpe_tokens) read the parquet when their lazy
    # builder is resolved below; point them at the sf under check
    os.environ["DGSPARK_ORACLE_SF_DIR"] = sf_dir

    from dgraph_spark import get_spark
    from dgraph_spark.entry_queries import QUERIES, resolve_sql

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        sql = resolve_sql(sql)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            if sql is None:
                n = sdf.count()
                print(f"  {name}: rows-only ({n} rows) OK")
                continue
            spdf = sdf.toPandas()          # the ONE Spark execution
            odf = con.execute(sql).df()    # the ONE DuckDB execution
            srows, orows = frame_rows(spdf), frame_rows(odf)
            ocols = list(odf.columns)
            problems = []
            if sorted(scols) != sorted(ocols):
                problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
            if len(srows) != len(orows):
                problems.append(f"rowcount {len(srows)} != {len(orows)}")
            problems += dtype_problems(spdf, odf)
            if not problems:
                a = canon_rows(scols, srows)
                b = canon_rows(ocols, orows)
                if a != b:
                    diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    problems.append(f"values differ, e.g. {diff}")
            if problems:
                failures.append(name)
                print(f"✗ {name}: " + "; ".join(problems))
            else:
                print(f"✓ {name} ({len(srows)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"✗ {name}: EXCEPTION {type(e).__name__}: {e}")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
