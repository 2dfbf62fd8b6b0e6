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
            srows = [tuple(r) for r in sdf.collect()]
            if sql is None:
                print(f"  {name}: rows-only ({len(srows)} rows) OK")
                continue
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            problems = []
            if sorted(scols) != sorted(ocols):
                problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
            if len(srows) != len(orows):
                problems.append(f"rowcount {len(srows)} != {len(orows)}")
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
