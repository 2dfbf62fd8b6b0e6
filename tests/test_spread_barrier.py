"""Round-10 optimization internals: compute_spread + nopush (the
pushdown barrier that keeps compute-bound predicates above the spread
exchange) and the robots_filter shuffle-free rewrite.

The barrier property is load-bearing: without it Catalyst pushes the
predicate through the round-robin repartition back to the (single-task,
on a one-file corpus) scan — plans/r10/prepare_corpus_before.txt shows
the regression shape these tests pin against.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dgraph_spark.operators.dedup import compute_spread, nopush


def _docs(spark, n=200):
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("w"), F.col("id").cast("string"),
                             F.lit(" common tokens here")).alias("text"))
            .repartition(1))


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_compute_spread_spreads_single_partition_input(spark):
    df = _docs(spark)
    spread = compute_spread(df)
    assert spread is not df
    assert (spread.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)


def test_compute_spread_noop_on_parallel_input(spark):
    par = spark.sparkContext.defaultParallelism
    df = _docs(spark).repartition(max(2, par // 2))
    assert compute_spread(df) is df


def test_nopush_keeps_filter_above_spread_exchange(spark):
    df = _docs(spark)
    expensive = F.size(F.split(F.col("text"), " ")) > 2
    plan = _physical(compute_spread(df).where(nopush(expensive)))
    # the barrier condition must sit ABOVE the round-robin exchange
    # (tree prints top-down: parent before child)
    f = plan.index("monotonically_increasing_id")
    ex = plan.index("RoundRobinPartitioning")
    assert f < ex, plan
    # control: the un-barriered predicate is pushed below the exchange
    ctrl = _physical(compute_spread(df).where(expensive))
    assert ctrl.index("RoundRobinPartitioning") < ctrl.index("split("), ctrl


def test_nopush_preserves_filter_semantics(spark):
    df = _docs(spark, n=500)
    cond = F.col("doc_id") % 3 == 0
    a = sorted(r["doc_id"] for r in df.where(cond).collect())
    b = sorted(r["doc_id"]
               for r in compute_spread(df).where(nopush(cond)).collect())
    assert a == b
    # NULL conditions drop the row on both paths
    nullable = F.when(F.col("doc_id") % 2 == 0, F.col("doc_id") % 3 == 0)
    an = sorted(r["doc_id"] for r in df.where(nullable).collect())
    bn = sorted(r["doc_id"]
                for r in compute_spread(df).where(nopush(nullable)).collect())
    assert an == bn


def test_robots_filter_no_url_side_exchange(spark):
    from dgraph_spark.operators.robots import robots_filter, robots_rules

    urls = spark.createDataFrame(
        [(i, f"d{i % 3}", p) for i, p in
         enumerate(["/a", "/private/x", "/private/ok/y", "/tmp/z"] * 6)],
        "doc_id long, domain string, path string")
    robots = spark.createDataFrame(
        [(f"d{k}",
          "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
          "Disallow: /tmp/*\nAllow: /tmp/keep$\n") for k in range(3)],
        "domain string, robots_txt string")
    out = robots_filter(urls, robots_rules(robots))
    rows = {(r["doc_id"]): r["allowed"] for r in out.collect()}
    assert len(rows) == 24
    for i, p in enumerate(["/a", "/private/x", "/private/ok/y", "/tmp/z"] * 6):
        assert rows[i] == (p in ("/a", "/private/ok/y")), (i, p)
    # the URL side must not shuffle: the only exchanges in the plan are
    # the broadcast build and the tiny per-domain rules aggregation
    plan = _physical(out)
    assert "hashpartitioning(doc_id" not in plan, plan
    assert "hashpartitioning(path" not in plan, plan


def test_robots_filter_preserves_duplicate_url_rows(spark):
    from dgraph_spark.operators.robots import robots_filter, robots_rules

    urls = spark.createDataFrame(
        [(1, "d0", "/private/x"), (1, "d0", "/private/x")],
        "doc_id long, domain string, path string")
    robots = spark.createDataFrame(
        [("d0", "User-agent: *\nDisallow: /private\n")],
        "domain string, robots_txt string")
    out = robots_filter(urls, robots_rules(robots)).collect()
    assert len(out) == 2
    assert all(r["allowed"] is False for r in out)


def test_lm_model_cache_hits_and_matches(spark):
    import dgraph_spark.operators.ngram_lm as lm

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (i % 3 + 1)) for i in range(40)],
        "doc_id long, text string")
    a = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
         for r in lm.perplexity_report(docs).collect()}
    before = len(lm._LM_CACHE)
    b = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
         for r in lm.perplexity_report(docs).collect()}
    assert a == b
    # second call reused the cached model (no new entry, same table ids)
    assert len(lm._LM_CACHE) == before
    assert before >= 1


def test_train_bigram_lm_counts_match_naive(spark):
    from collections import Counter

    from dgraph_spark.operators.ngram_lm import train_bigram_lm

    texts = ["a b a", "b b c a", "", "a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    with train_bigram_lm(docs) as m:
        uni = {r["w1"]: r["cu"] for r in m.uni.collect()}
        big = {(r["w1"], r["w2"]): r["cb"] for r in m.big.collect()}
        toks = [t.split() for t in texts]
        exp_uni = Counter(w for t in toks for w in t)
        exp_big = Counter((t[i], t[i + 1]) for t in toks
                          for i in range(len(t) - 1))
        assert uni == dict(exp_uni)
        assert big == dict(exp_big)
        assert m.vocab == len(exp_uni)
        assert m.n_bigrams == len(exp_big)


# ---------------------------------------------------------- round 11:
# trigger matrix for the hardened compute_spread (partition probe via
# queryExecution().toRdd(), fat-partition byte clause, Connect-safe
# degrade) — VERDICT r10 #7.

def test_compute_spread_fat_partition_trigger(spark, monkeypatch):
    import dgraph_spark.operators.dedup as dd

    par = spark.sparkContext.defaultParallelism
    if par < 4:
        pytest.skip("needs defaultParallelism >= 4")
    n = max(2, par // 2)  # clears the //2 trigger, still below par
    df = _docs(spark).repartition(n)
    # no file inputs -> byte probe unknown -> no spread (status quo)
    assert dd.compute_spread(df) is df
    # few-but-fat partitions: avg bytes/partition over the threshold
    monkeypatch.setattr(
        dd, "_input_bytes",
        lambda _df: (dd.SPREAD_FAT_PARTITION_BYTES + 1) * n)
    spread = dd.compute_spread(df)
    assert spread is not df
    assert spread.rdd.getNumPartitions() == par


def test_compute_spread_fat_but_fully_parallel_stays(spark, monkeypatch):
    import dgraph_spark.operators.dedup as dd

    par = spark.sparkContext.defaultParallelism
    df = _docs(spark).repartition(par)
    monkeypatch.setattr(
        dd, "_input_bytes",
        lambda _df: (dd.SPREAD_FAT_PARTITION_BYTES + 1) * par * 10)
    # at defaultParallelism partitions there is no idle capacity to win
    assert dd.compute_spread(df) is df


def test_compute_spread_thin_midrange_stays(spark, monkeypatch):
    import dgraph_spark.operators.dedup as dd

    par = spark.sparkContext.defaultParallelism
    if par < 4:
        pytest.skip("needs defaultParallelism >= 4")
    df = _docs(spark).repartition(max(2, par // 2))
    monkeypatch.setattr(dd, "_input_bytes", lambda _df: 1024)  # thin
    assert dd.compute_spread(df) is df


def test_compute_spread_probe_failure_degrades_to_noop(spark, monkeypatch):
    import dgraph_spark.operators.dedup as dd

    def boom(_df):
        raise RuntimeError("no classic SparkContext (Connect)")

    monkeypatch.setattr(dd, "_partition_count", boom)
    df = _docs(spark)
    # Connect-style probe failure: return the input unchanged instead
    # of erroring (mirrors _corpus_key's degrade-to-uncached behavior)
    assert dd.compute_spread(df) is df


def test_input_bytes_matches_on_disk_sizes(spark, tmp_path):
    import os

    import dgraph_spark.operators.dedup as dd

    p = str(tmp_path / "t.parquet")
    spark.range(100).write.mode("overwrite").parquet(p)
    expect = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(p) for f in fs if f.endswith(".parquet"))
    got = dd._input_bytes(spark.read.parquet(p))
    assert got == expect and got > 0
    # in-memory relations have no input files
    assert dd._input_bytes(_docs(spark)) is None


def test_robots_filter_shuffle_fallback_matches_broadcast(spark, monkeypatch):
    import dgraph_spark.operators.dedup as dd
    from dgraph_spark.operators.robots import robots_filter, robots_rules

    urls = spark.createDataFrame(
        [(i, f"d{i % 3}", p) for i, p in
         enumerate(["/a", "/private/x", "/private/ok/y", "/tmp/z"] * 3)],
        "doc_id long, domain string, path string")
    robots = spark.createDataFrame(
        [(f"d{k}",
          "User-agent: *\nDisallow: /private\nAllow: /private/ok\n")
         for k in range(3)],
        "domain string, robots_txt string")
    rules = robots_rules(robots)
    a = sorted((r["doc_id"], r["allowed"])
               for r in robots_filter(urls, rules).collect())
    # simulate a crawl-scale rules table: byte gate refuses the hint
    monkeypatch.setattr(dd, "_input_bytes", lambda _df: 10**12)
    b = sorted((r["doc_id"], r["allowed"])
               for r in robots_filter(urls, rules).collect())
    assert a == b


def test_lm_cache_is_lru_bounded(spark):
    import dgraph_spark.operators.ngram_lm as lm

    start = len(lm._LM_CACHE)
    for k in range(lm.LM_CACHE_MAX_ENTRIES + 2):
        docs = spark.createDataFrame(
            [(i, f"tok{k} a b c d{i}") for i in range(6)],
            "doc_id long, text string")
        lm.perplexity_report(docs).count()
    assert len(lm._LM_CACHE) <= lm.LM_CACHE_MAX_ENTRIES
    assert start <= lm.LM_CACHE_MAX_ENTRIES
