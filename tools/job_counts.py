"""Jobs-per-query counter: how many Spark jobs (driver actions) one
execution of each HEADLINE query costs — the round-11 evidence tool for
the driver-round-trip work (VERDICT r10 #5: iterative/multi-action
entries should batch probes so the job count drops).

Usage: python tools/job_counts.py [sf_dir] [query ...]
Prints one JSON line {query: jobs_per_execution}. Each query is run
once untimed (cache/index warmup, JIT) and then once counted, so the
number reflects steady state, matching the bench's timed region.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _n_jobs(spark) -> int:
    # total jobs submitted so far (DAGScheduler's monotone job counter)
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import HEADLINE

    from dgraph_spark import get_spark
    from dgraph_spark.entry_queries import QUERIES, _g

    names = sys.argv[2:] or HEADLINE
    spark = get_spark("dgraph-spark-jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    g = _g(spark, sf_dir)
    g.pred("l_quantity").count()

    out: dict[str, int] = {}
    for name in names:
        fn, _sql = QUERIES[name]
        fn(spark, sf_dir).count()  # warmup (indexes/JIT, untimed region)
        j0 = _n_jobs(spark)
        fn(spark, sf_dir).count()
        out[name] = _n_jobs(spark) - j0
        print(f"# {name}: {out[name]} jobs", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
