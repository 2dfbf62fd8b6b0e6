"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "root_eq_reverse_traversal",
    "between_dates",
    "count_having",
    "per_parent_topk",
    "anyofterms",
    "regexp",
    "math_per_uid",
    "level_agg_sum",
    "groupby_q1",
    "facet_filter",
    "cascade",
    "recurse_reach",
    "shortest_path",
    "similar_to",
    "stream_tumbling",
    "dedup_exact",
    "chain_region_revenue",
    "order_by_val",
    "dedup_ngram_jaccard",
    "text_stats",
    "connected_components",
    "stream_session",
    "q5_local_supplier",
    "dedup_minhash_lsh",
    "anyoftext",
    # round-8 continuation: the new training-pipeline operators join the
    # headline set — totals are NOT comparable to BENCH_r07 and earlier
    # (25-query set) without restricting to the shared per-query keys.
    "dedup_spans",
    "repetition_stats",
    "quality_filter",
    "pack_sequences",
    "semantic_dedup",
    "bpe_tokens",
    "c4_clean",
    "domain_mix",
    "lm_perplexity",
    "bm25_search",
    "asof_join",
    "interval_join",
    "sessionize",
    # round 9: the one-call pipeline recipe (stage-wiring cost on top
    # of the individually-benched stages)
    "prepare_corpus",
]

# Queries whose first execution in a fresh process builds a
# _corpus_key-cached artifact (shingle/jaccard/minhash indexes, BM25
# stats, the bigram-LM model): the untimed warmup pays that build, the
# timed runs measure steady-state. Round 11 (VERDICT #3): the artifact
# ALSO records the cold first execution for these, so round-over-round
# deltas can't silently ride a cache-boundary shift again.
CORPUS_CACHED = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "bm25_search",
    "lm_perplexity",
]


def _parallel_probe(spark, sf_dir):
    """Scaling probe (round 11, VERDICT #1 'make the driver-visible
    scaling gate discriminative'): a FIXED amount of compute-bound work
    — 128 replicas of the documents corpus through the trigram-shingle
    program — spread over the session's cores by the engine's own
    compute_spread. The work is constant in core count (replication is
    a literal 128, not defaultParallelism), so the 8-vs-32-core time
    ratio of this entry measures parallelism directly; every other
    sf0.1 HEADLINE query is scheduling-floor-bound at this SF and reads
    ~1.0 regardless of cores. Computes from parquet on every call —
    nothing on this path is cached. The replica tag is concatenated
    into the hashed text so the per-replica program cannot be hoisted
    below the explode.

    Two shape constraints, both load-bearing:
      * the bench times ``df.count()``, and count() PRUNES any column
        it can prove unused — a global ``agg(sum(n))`` would let the
        optimizer delete the whole shingle program from the timed plan
        (measured: a pruned probe reads ~0.25 s at EVERY core count).
        Grouping by a key DERIVED from the computed value (n % 7) makes
        the row count depend on every n, so nothing can be pruned.
      * the replicas come from ``sequence()``, not a 128-literal array
        (same semantics, constant-size plan).
    Measured this round (quiet box): 3.90 s at 32 cores vs 9.53 s at
    8 cores — ratio 2.45 (memory-bandwidth-bound past ~16 cores, so
    sub-4x; a defeated spread or a serialized plan reads ~1.0)."""
    from pyspark.sql import functions as F

    from dgraph_spark.operators.dedup import compute_spread, word_shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    reps = F.explode(F.sequence(F.lit(0), F.lit(127))).alias("r")
    salted = F.concat(F.col("text"), F.lit(" "), F.col("r").cast("string"))
    return (
        compute_spread(docs)
        .select(reps, "text")
        .select(F.size(word_shingles(salted, 3)).alias("n"))
        .groupBy((F.col("n") % 7).alias("k"))
        .agg(F.sum("n").alias("total_shingles"))
    )


def main() -> None:
    # Registry hygiene policy (round 10, README "Correctness &
    # benchmarks"): the driver's artifact is ALWAYS the full HEADLINE
    # run (`python bench.py`, no flags) — gate semantics unchanged.
    # `--fast` is the in-round iteration loop: trio ritual + DuckDB
    # anchor only (~20 s), for quick A/Bs while developing; it never
    # replaces the driver artifact.
    fast = "--fast" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from dgraph_spark import get_spark
    from dgraph_spark.entry_queries import QUERIES

    spark = get_spark("dgraph-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM, parquet file indexes, the lazy graph views, and the
    # session-cached lineitem uid relation (one-time costs, not query work)
    from dgraph_spark.entry_queries import _g

    g = _g(spark, sf_dir)
    g.pred("r_name").count()
    g.pred("l_quantity").count()
    g.pred("c_name").count()
    g.pred("o_totalprice").count()

    ANCHOR = [
        "between_dates", "count_having", "groupby_q1", "anyofterms",
        "chain_region_revenue", "order_by_val", "q5_local_supplier",
        "facet_filter", "text_stats", "sessionize",
    ]
    if fast:
        ANCHOR = ANCHOR[:4]

    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    bench_list = ANCHOR if fast else (HEADLINE + ["parallel_probe_128x"])
    for name in bench_list:
        if name == "parallel_probe_128x":
            fn = _parallel_probe
        else:
            fn, _sql = QUERIES[name]
        # one untimed warmup execution, then three timed, report the min.
        # The first run of each distinct plan shape on a fresh JVM pays
        # one-time JIT + whole-stage-codegen (Janino) compilation and
        # broadcast-thread spin-up — seconds on slow vCPUs, a JVM warmup
        # artifact, not query cost. A long-lived cluster session (the
        # deployment model, like dgraph's always-on alphas) runs
        # steady-state, which is what the timed runs measure. No query
        # RESULT is cached anywhere: every execution re-runs the full
        # plan against parquet (warmup and timed runs produce identical
        # row counts precisely because nothing is memoized). For the
        # CORPUS_CACHED queries the warmup additionally builds the
        # in-process index/model; its wall time is recorded as
        # cold_first_run_s (round 11 — timed-region honesty; the
        # steady-state methodology itself is unchanged).
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        if name in CORPUS_CACHED:
            cold[name] = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - t0)
        times[name] = round(min(runs), 3)
        print(
            f"# {name}: {times[name]:.3f}s ({n} rows; runs "
            + "/".join(f"{r:.3f}" for r in runs) + ")",
            file=sys.stderr,
        )

    # iterative-trio ritual (PLANS.md "iterative-trio target — re-set
    # with data"): same-session 8-rep MEDIANS for the three iterative
    # queries, reported against the round-8 honest targets — absolute
    # trio <= 2.2 s on a quiet box AND (machine-independent) 10x-data
    # trio ratio <= 1.7x. The medians kill the absolute-vs-machine-
    # drift ambiguity: they ride in every BENCH artifact next to
    # loadavg, so a slow box shows up as loadavg+medians moving
    # together, while a code regression moves medians alone.
    import statistics

    trio = {}
    for name in ("shortest_path", "connected_components", "recurse_reach"):
        fn, _sql = QUERIES[name]
        reps = []
        for _ in range(8):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            reps.append(time.perf_counter() - t0)
        trio[name] = round(statistics.median(reps), 3)
    trio_total = round(sum(trio.values()), 3)

    # DuckDB anchor: the absolute totals drift ±25% with box load
    # between rounds (round-9 verdict), but the Spark/DuckDB ratio of a
    # fixed cheap-twin subset measured back-to-back IN THIS PROCESS is
    # machine-independent — both engines see the same load. This ratio
    # is the cross-round comparator; treat raw totals as local color.
    import duckdb

    from dgraph_spark.entry_queries import resolve_sql
    from tools.check_oracle import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    duck_times: dict[str, float] = {}
    for name in ANCHOR:
        sql = resolve_sql(QUERIES[name][1])
        con.execute(sql).fetchall()  # warm (buffer cache, query plan)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        duck_times[name] = round(min(runs), 4)
    anchor_spark = round(sum(times[n] for n in ANCHOR), 3)
    anchor_duck = round(sum(duck_times.values()), 3)
    ratio = round(anchor_spark / anchor_duck, 3) if anchor_duck else None

    # `value` stays the sum of the HEADLINE set ONLY: the scaling
    # probe is an ADDED entry in `queries` (allowed by the contract),
    # and folding it into the headline total would make round-over-
    # round totals incomparable (the probe is deliberately expensive).
    total = round(sum(times[n] for n in HEADLINE if n in times), 3)
    # ambient context: round-7/8 showed ±20-30% machine drift between
    # sessions; recording loadavg makes the artifact interpretable
    try:
        load1, load5, _ = (round(x, 2) for x in __import__("os").getloadavg())
    except OSError:
        load1 = load5 = None
    print(
        json.dumps(
            {
                "metric": ("fast_bench" if fast
                           else "headline_query_wall_time"),
                "value": total,
                "unit": "sec",
                "queries": times,
                # cold (index/model-building) first executions of the
                # corpus-cache-backed queries — see CORPUS_CACHED
                "cold_first_run_s": cold,
                "sf": sf,
                "loadavg_1m": load1,
                "loadavg_5m": load5,
                "trio_median_8rep": trio,
                "trio_total_s": trio_total,
                "trio_target_s": 2.2,
                "trio_target_ratio_10x": 1.7,
                "anchor_queries": duck_times,
                "anchor_spark_s": anchor_spark,
                "anchor_duckdb_s": anchor_duck,
                "spark_vs_duckdb_ratio": ratio,
                # most recent measured 10x trio ratios (per query):
                # BENCH_sf1_r08.json shortest 0.97 / cc 1.07 /
                # recurse 1.66 — refresh via tools/scale_data.py +
                # SPARK_GRAFT_SF_DIR=/tmp/sf1_synth when the iterative
                # plans change
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
