"""Scale-curve bench: runs the iterative/pipeline core at a list of
sf dirs back-to-back IN ONE PROCESS (same-day A/B protocol, PLANS.md
round 8) with warmup + N-rep medians, and prints one JSON object with
per-query medians per sf plus last/first ratios. Usage:

    python tools/bench_scale.py out.json sfdir1 sfdir2 [reps]

Round-10 artifact: BENCH_sf10_r10.json = sf1_synth (10x) vs sf10_synth
(100x), pass bar = no query more than 2x super-linear (ratio <= 20 at
10x data step).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_SET = [
    # iterative core (the queries whose design must survive scale-up)
    "shortest_path",
    "connected_components",
    "recurse_reach",
    # composed pipeline + dedup family
    "prepare_corpus",
    "dedup_exact",
    "dedup_minhash_lsh",
    # windows / ordering
    "sessionize",
    "order_by_val",
    # join-input-bound DQL (both join sides grow with sf)
    "q5_local_supplier",
    "chain_region_revenue",
    "cascade",
    # tokenizer / search / scoring tier
    "anyoftext",
    "bm25_search",
    "lm_perplexity",
    "quality_filter",
    "line_stats",
]


def main() -> None:
    out_path = sys.argv[1]
    sf_dirs = [a for a in sys.argv[2:] if not a.isdigit()]
    reps = int(next((a for a in sys.argv[2:] if a.isdigit()), "8"))

    from dgraph_spark import get_spark
    from dgraph_spark.entry_queries import QUERIES, _g

    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    for sf_dir in sf_dirs:
        g = _g(spark, sf_dir)
        g.pred("c_name").count()
        g.pred("o_totalprice").count()
        medians: dict[str, float] = {}
        for name in SCALE_SET:
            fn, _sql = QUERIES[name]
            fn(spark, sf_dir).count()  # warm plan/codegen/caches
            rs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                rs.append(time.perf_counter() - t0)
            medians[name] = round(statistics.median(rs), 3)
            print(f"# {sf_dir} {name}: median={medians[name]:.3f}s "
                  f"reps={[round(r, 3) for r in rs]}",
                  file=sys.stderr, flush=True)
        results[sf_dir] = medians

    artifact = {"metric": "scale_curve_median_wall_time", "unit": "sec",
                "reps": reps, "sf_dirs": sf_dirs, "queries": results}
    if len(sf_dirs) >= 2:
        lo, hi = results[sf_dirs[0]], results[sf_dirs[-1]]
        artifact["ratio_last_vs_first"] = {
            q: round(hi[q] / lo[q], 2) for q in SCALE_SET if lo[q] > 0}
    try:
        l1, l5, _ = os.getloadavg()
        artifact["loadavg_1m"], artifact["loadavg_5m"] = (
            round(l1, 2), round(l5, 2))
    except OSError:
        pass
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    spark.stop()


if __name__ == "__main__":
    main()
