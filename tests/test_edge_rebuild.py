"""Round-11 flat-assembly let-binding (Level.edge_rebuild).

The flat oracle path used to assemble child levels by joining the built
parent frame against the child's separately-derived edge relation —
whose lineage embeds the full parent derivation, so the parent subtree
planned TWICE (plans/r11/per_parent_topk_after.txt's SortMergeJoin of
two copies of the nation->customer pipeline). The let-binding replays
the child edge pipeline anchored on the frame itself when the frame's
uid column is provably distinct; these tests pin the plan effect, the
fallback conditions, and row-level equivalence between both paths.
"""

from __future__ import annotations


QUERY_TOPK = '''
{ q(func: eq(n_name, "NATION_1")) {
    cust: ~in_nation @filter(type(Customer)) {
      c_name
      placed (first: 2, orderdesc: o_totalprice) { o_totalprice }
    }
} }'''

# unpaginated chain: every child level qualifies for the let-binding
QUERY_CHAIN = '''
{ q(func: eq(n_name, "NATION_1")) {
    cust: ~in_nation @filter(type(Customer)) {
      c_name
      placed { o_totalprice }
    }
} }'''


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _optimized(df) -> str:
    # formatted physical explain — includes scan Locations (file paths)
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _stripped(graph, monkeypatch):
    """Executor with the let-binding disabled (assembly-join fallback)."""
    from dgraph_spark.plans import Executor

    monkeypatch.setattr(
        Executor, "_make_edge_rebuild", lambda self, *a, **k: None)
    return Executor(graph)


def test_rebuild_plans_parent_lineage_once(executor):
    plan = _optimized(executor.execute_flat(QUERY_CHAIN))
    # before the let-binding the root lineage planned twice (once in the
    # frame, once inside the child edge relation)
    assert plan.count("nation.parquet") == 1
    assert plan.count("customer.parquet") == 1
    assert plan.count("orders.parquet") == 1


def test_paginated_child_with_extras_falls_back(executor):
    # anchor extras (c_name) riding through the per-parent topk window
    # widen every sorted/shuffled row — measured net-negative (round
    # 11) — so a paginated child only rebuilds off a bare anchor
    plan = _optimized(executor.execute_flat(QUERY_TOPK))
    assert plan.count("nation.parquet") == 2


def test_rebuild_matches_fallback_rows(executor, graph, monkeypatch):
    for q in (QUERY_CHAIN, QUERY_TOPK):
        on = _rows(executor.execute_flat(q))
        off = _rows(_stripped(graph, monkeypatch).execute_flat(q))
        assert len(on) > 0
        assert on == off


def test_rebuild_respects_per_parent_pagination(executor):
    rows = executor.execute_flat(QUERY_TOPK).collect()
    per_parent: dict = {}
    for r in rows:
        per_parent[r["c_name"]] = per_parent.get(r["c_name"], 0) + 1
    assert per_parent and max(per_parent.values()) <= 2


def test_second_sibling_falls_back(executor, graph, monkeypatch):
    # after the first child joins, the frame fans out per edge — the
    # second sibling must NOT anchor on it (pagination windows would
    # rank duplicated rows); it takes the assembly join, and both paths
    # agree on the result
    q = '''
    { q(func: eq(n_name, "NATION_1")) {
        cust: ~in_nation @filter(type(Customer)) {
          placed (first: 2, orderdesc: o_totalprice) { o_totalprice }
          nat: in_nation { n_name }
        }
    } }'''
    on = _rows(executor.execute_flat(q))
    off = _rows(_stripped(graph, monkeypatch).execute_flat(q))
    assert len(on) > 0
    assert on == off


def test_column_collision_falls_back(executor, graph, monkeypatch):
    # aliasing a parent attr to a pipeline-reserved name means the
    # anchor cannot be replayed through the edge join — rebuild returns
    # None and the assembly join produces the same rows
    q = '''
    { q(func: eq(n_name, "NATION_1")) {
        cust: ~in_nation @filter(type(Customer)) {
          subject: c_name
          placed { o_totalprice }
        }
    } }'''
    df = executor.execute_flat(q)
    on = _rows(df)
    assert "subject" in df.columns
    # the fallback plans the parent lineage twice — collision respected
    assert _optimized(df).count("nation.parquet") == 2
    off = _rows(_stripped(graph, monkeypatch).execute_flat(q))
    assert len(on) > 0
    assert on == off


def test_cascade_never_captures_rebuild(executor, graph, monkeypatch):
    # @cascade rewrites level.edges after the fact; a captured replay
    # closure would resurrect pruned edges. Levels under cascade defer
    # pagination and never attach one.
    q = '''
    { q(func: eq(n_name, "NATION_1")) @cascade {
        cust: ~in_nation @filter(type(Customer)) {
          c_name
          placed @filter(gt(o_totalprice, 100000)) { o_totalprice }
        }
    } }'''
    on = _rows(executor.execute_flat(q))
    off = _rows(_stripped(graph, monkeypatch).execute_flat(q))
    assert on == off
