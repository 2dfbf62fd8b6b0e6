"""DuckDB baseline for the oracle'd queries: times each oracle SQL at a
given sf (default sf0.1) for context on how far Spark wall-times are
from a single-node columnar engine. Usage:
    python tools/bench_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools.check_oracle import TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from dgraph_spark.entry_queries import QUERIES, resolve_sql

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # oracles that are INTENTIONALLY quadratic/recursive (they verify
    # values, not throughput) would dominate the baseline wall time at
    # sf >= 0.1; time them only at the correctness scale
    slow_oracles = {"dedup_clusters"}
    times = {}
    for name, (_fn, sql) in QUERIES.items():
        if sql is None:
            continue
        if name in slow_oracles and "sf0.01" not in sf_dir \
                and "sf0.001" not in sf_dir:
            continue
        sql = resolve_sql(sql)
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        times[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"engine": "duckdb", "sf_dir": sf_dir,
                      "total": round(sum(times.values()), 3), "queries": times}))


if __name__ == "__main__":
    main()
