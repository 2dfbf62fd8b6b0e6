"""Iterative graph algorithms over the per-predicate edge model.

These are driver-loop DataFrame algorithms (SURVEY.md §7: plain joins,
localCheckpoint per iteration, no GraphFrames dependency):

- reachable(): multi-hop frontier expansion == @recurse's uid semantics
  (query/recurse.go:19-215) in set form.
- shortest_paths(): weighted Dijkstra-ish relaxation == query/shortest.go.
- pagerank(), connected_components(): classic GraphX-style analytics as
  new verbs beyond the reference surface (BASELINE.json north star).

Scale notes: each iteration is one shuffle on the frontier join key; the
frontier is checkpointed to truncate lineage. Visited sets stay
distributed (no driver collect). At 100 TB the edge relation should be
bucketed by subject so iterations co-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dgraph_spark.model import OBJECT, SUBJECT, Graph, SmallLoopConf

# Depth bound under which multi-round traversals are planned fully
# lazily (one action for all rounds, no per-round probe/checkpoint).
# Beyond it the probing loop wins: early exit on a dead frontier and
# lineage truncation outweigh the per-round job-scheduling cost.
# (A WITH RECURSIVE formulation was measured too: Spark 4 executes each
# recursion level as separate internal jobs, so it was no faster.)
CTE_MAX_DEPTH = 8


def _cached_count(g: Graph, key: tuple, df: DataFrame) -> int:
    cache = g.__dict__.setdefault("_loop_rel_cache", {})
    if key not in cache:
        cache[key] = df.count()
    return cache[key]


def union_edges(g: Graph, preds: list[str]) -> DataFrame:
    """Union the (subject, object) pairs of several uid predicates.
    A leading '~' traverses the predicate in reverse."""
    frames = []
    for p in preds:
        rev = p.startswith("~")
        frames.append(g.edge(p.lstrip("~"), reverse=rev).select(SUBJECT, OBJECT))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _cached_rel(g: Graph, key: tuple, build) -> DataFrame:
    """Persist a loop relation once per (immutable) Graph and reuse it
    across queries — the adjacency-tablet index pattern: iterative
    algorithms re-join the same relation every round and every call."""
    cache = g.__dict__.setdefault("_loop_rel_cache", {})
    if key not in cache:
        cache[key] = build().persist()
    return cache[key]


def reachable(
    g: Graph,
    starts: DataFrame,
    preds: list[str],
    max_depth: int = 3,
    keep_start: bool = False,
) -> DataFrame:
    """All nodes reachable from ``starts`` (column `subject`) within
    ``max_depth`` hops over ``preds``. Returns (start, node, depth) with
    the minimal depth per (start, node). BFS with distributed visited set.
    """
    edges = _cached_rel(g, ("reach_edges", tuple(preds)),
                        lambda: union_edges(g, preds))
    # Shallow traversals build the WHOLE multi-round plan lazily and run
    # it as ONE action: no per-round count probe, no per-round
    # checkpoint materialization, no driver barrier between rounds —
    # measured 0.95 s -> 0.65 s at sf0.1 (the probe jobs were pure
    # scheduling overhead). A dead frontier just makes the remaining
    # round joins empty (cheap). Deep traversals keep the probing loop:
    # there the early-exit and lineage truncation matter more than the
    # per-round job cost.
    lazy = max_depth <= CTE_MAX_DEPTH
    frontier = starts.select(F.col(SUBJECT).alias("start"), F.col(SUBJECT).alias("node"))
    frontier = frontier.withColumn("depth", F.lit(0))
    if lazy:
        # shallow: NO per-round anti-join against the visited set — each
        # round is join+distinct only, and one final groupBy-min collapses
        # re-reached nodes to their minimal depth. The anti-join was a
        # whole extra shuffle per round that only avoids re-expanding
        # already-seen nodes — pure overhead on shallow/DAG-ish
        # traversals (measured at 10x data: 2.13 s -> see SCALING.md).
        # Deep traversals keep the probing loop below: there early exit
        # and lineage truncation dominate.
        parts = [frontier]
        cur = frontier
        for d in range(1, max_depth + 1):
            cur = (
                cur.join(edges, cur.node == edges[SUBJECT], "inner")
                .select(F.col("start"), F.col(OBJECT).alias("node"),
                        F.lit(d).alias("depth"))
            )
            if max_depth > 3:
                # per-round dedup guards against multiplicative path
                # blow-up on deeper traversals; at depth <= 3 the final
                # groupBy absorbs duplicates and the per-round shuffle
                # costs more than it saves
                cur = cur.distinct()
            parts.append(cur)
        visited = parts[0]
        for p in parts[1:]:
            visited = visited.unionByName(p)
        visited = visited.groupBy("start", "node").agg(
            F.min("depth").alias("depth"))
    else:
        visited = frontier
        loop_conf = SmallLoopConf(frontier.sparkSession)
        front_n = 0
        for d in range(1, max_depth + 1):
            loop_conf.adapt(front_n)
            nxt = (
                frontier.join(edges, frontier.node == edges[SUBJECT], "inner")
                .select(F.col("start"), F.col(OBJECT).alias("node"), F.lit(d).alias("depth"))
                .distinct()
            )
            # drop already-visited (start, node) pairs -> minimal depth kept
            nxt = nxt.join(visited.select("start", "node"), ["start", "node"], "left_anti")
            # lazy checkpoint + full count: one job computes, caches, and
            # lineage-truncates the round (a limit(1) probe would only
            # partially materialize the checkpoint)
            nxt = nxt.localCheckpoint(eager=False)
            front_n = nxt.count()
            if front_n == 0:
                break
            visited = visited.unionByName(nxt).localCheckpoint(eager=False)
            frontier = nxt
        loop_conf.exit()
    if not keep_start:
        visited = visited.where(F.col("depth") > 0)
    # eager=False: single-action callers materialize exactly once; the
    # checkpoint still truncates lineage for anyone iterating further
    visited = visited.localCheckpoint(eager=not lazy)
    return visited


def connected_components(g: Graph, preds: list[str], max_iter: int = 20) -> DataFrame:
    """Undirected connected components via iterative label propagation
    (small-label-wins). Returns (node, component). Converges in
    O(diameter) iterations; each is two shuffles."""
    # the symmetrized edge relation is re-joined EVERY round and reused
    # across calls: persist once per graph. NO distinct — the
    # min-aggregation absorbs duplicate edges, and an edge-relation-wide
    # distinct is the single biggest shuffle here at scale.
    def _sym():
        e = union_edges(g, preds)
        return e.select(SUBJECT, OBJECT).unionByName(
            e.select(F.col(OBJECT).alias(SUBJECT),
                     F.col(SUBJECT).alias(OBJECT)))

    sym = _cached_rel(g, ("cc_sym", tuple(preds)), _sym)
    # node relation cached per graph alongside the edges: the distinct
    # is a full-edge-relation shuffle that every call re-paid
    nodes = _cached_rel(
        g, ("cc_nodes", tuple(preds)),
        lambda: sym.select(F.col(SUBJECT).alias("node")).distinct())
    labels = nodes.withColumn("component", F.col("node"))

    def _round(lbl: DataFrame, it: int) -> DataFrame:
        if it == 0:
            # round 1 with identity labels: the neighbor join IS the
            # edge relation relabeled — skip the join entirely
            neigh = sym.select(F.col(OBJECT).alias("node"),
                               F.col(SUBJECT).alias("component"))
        else:
            neigh = (
                sym.join(lbl, sym[SUBJECT] == lbl.node, "inner")
                .select(F.col(OBJECT).alias("node"), "component")
            )
        propagated = (
            lbl.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump (shortcutting): component <- label(component).
        # Propagation alone needs O(diameter) rounds; adding one jump
        # per round squares the reach (O(log diameter)) for one extra
        # self-join shuffle — the classic two-phase CC round.
        roots = propagated.select(
            F.col("node").alias("component"),
            F.col("component").alias("_root"),
        )
        return (
            propagated.join(roots, "component", "left")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("_root"), F.col("component")),
                    F.col("component"),
                ).alias("component"),
            )
            # lazy checkpoint: the pair-probe action below computes the
            # round ONCE, caching + lineage-truncating as it goes
            .localCheckpoint(eager=False)
        )

    def _sum(lbl: DataFrame) -> DataFrame:
        return lbl.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s"))

    # rounds run in PAIRS with a single probe action per pair: labels are
    # per-node nonincreasing under min-propagation, so the label total
    # strictly decreases until convergence — equal consecutive sums
    # prove the pair's second round changed nothing. Small-diameter
    # graphs (the common case after one pointer jump) finish in one
    # action instead of two.
    prev_sum = None
    n_nodes = _cached_count(g, ("cc_n", tuple(preds)), nodes)
    loop_conf = SmallLoopConf(labels.sparkSession)
    try:
        loop_conf.adapt(n_nodes)
        for it in range(0, max_iter, 2):
            l1 = _round(labels, it)
            l2 = _round(l1, it + 1)
            s1, s2 = [r["s"] for r in _sum(l1).unionAll(_sum(l2)).collect()]
            if s1 == prev_sum:
                return labels
            if s1 == s2:
                return l2
            labels, prev_sum = l2, s2
        # the probe action already materialized the final checkpoint; the
        # graph-cached edge relation stays persisted for the next call
        return labels
    finally:
        loop_conf.exit()


def pagerank(
    g: Graph,
    preds: list[str],
    alpha: float = 0.15,
    max_iter: int = 10,
) -> DataFrame:
    """PageRank over the union edge relation. Returns (node, rank).
    Classic power iteration; ranks normalized over the node universe."""
    # every power iteration re-joins e / out_deg / nodes: persist them
    # once (released before returning)
    e = _cached_rel(g, ("pr_edges", tuple(preds)),
                    lambda: union_edges(g, preds).distinct())
    nodes = _cached_rel(g, ("pr_nodes", tuple(preds)), lambda: (
        e.select(F.col(SUBJECT).alias("node"))
        .unionByName(e.select(F.col(OBJECT).alias("node")))
        .distinct()))
    n = nodes.count()
    out_deg = _cached_rel(
        g, ("pr_outdeg", tuple(preds)),
        lambda: e.groupBy(SUBJECT).agg(F.count("*").alias("_deg")))
    # dangling NODE SET is rank-independent: compute the anti-join once
    # per graph instead of once per power iteration
    dangling_nodes = _cached_rel(
        g, ("pr_dangling", tuple(preds)),
        lambda: nodes.join(out_deg, nodes.node == out_deg[SUBJECT],
                           "left_anti").select("node"))
    # (src, dst, 1/deg) is rank-independent — pre-join once per graph so
    # each power iteration is a single join + aggregate
    e_share = _cached_rel(
        g, ("pr_eshare", tuple(preds)),
        lambda: e.join(out_deg, SUBJECT).select(
            SUBJECT, OBJECT, (F.lit(1.0) / F.col("_deg")).alias("_share")))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        contrib = (
            e_share.join(ranks, e_share[SUBJECT] == ranks.node, "inner")
            .select(F.col(OBJECT).alias("node"),
                    (F.col("rank") * F.col("_share")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        # dangling-node mass: rank held by nodes with no out-edges
        # redistributes uniformly (standard formulation; without it the
        # ranks don't sum to 1). Per iteration this is now a semi-join
        # against the cached dangling set + a 1-row aggregate.
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(alpha / n)
                    + F.lit(1 - alpha)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("_dm") / F.lit(float(n)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    ranks = ranks.localCheckpoint(eager=True)
    return ranks
