"""Time registry queries against the noop sink (guide §1.4): eagerly
computes every column of every row, discards output — isolates the
computation from both the sink and count()'s column pruning.

Usage: python tools/bench_noop.py [sf_dir] [name ...]
       (default sf_dir /root/testdata/sf0.1; default names = HEADLINE)

Prints one line per query: name, median-of-5 noop seconds, and the
count() time for comparison. This is a diagnostic tool for the
optimization rounds; bench.py (count-based, unchanged methodology)
stays the driver artifact.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]

    from dgraph_spark import get_spark
    from dgraph_spark.entry_queries import QUERIES, _g

    spark = get_spark("dgraph-spark-noop-bench")
    spark.sparkContext.setLogLevel("ERROR")
    g = _g(spark, sf_dir)
    g.pred("r_name").count()
    g.pred("l_quantity").count()

    if not names:
        import bench
        names = bench.HEADLINE

    for name in names:
        fn, _sql = QUERIES[name]
        spark.sparkContext.setJobDescription(f"noop:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        noop_runs, count_runs = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_runs.append(time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            count_runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}\tnoop_med={statistics.median(noop_runs):.3f}"
              f"\tnoop_min={min(noop_runs):.3f}"
              f"\tcount_min={min(count_runs):.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
