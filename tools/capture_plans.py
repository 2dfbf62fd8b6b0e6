"""Capture .explain("formatted") output for registry queries.

Usage: python tools/capture_plans.py OUTDIR [sf_dir] [name ...]

Writes OUTDIR/<name>.txt for each named query (default: every registry
entry). Used by the optimization rounds to pin before/after plan shapes
(plans/r10/<query>_{before,after}.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from dgraph_spark import get_spark
    from dgraph_spark.entry_queries import QUERIES

    spark = get_spark("dgraph-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")

    targets = names or list(QUERIES)
    for name in targets:
        fn, _sql = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # capture errors too: a failing plan is a finding
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
