"""Resource guards: query-edge cap for iterative queries
(query/recurse.go:154, query/shortest.go:231 via x.Config.LimitQueryEdge),
shortest-path maxfrontiersize (query/query.go:727-734), and the
per-variable uid cap in upsert expansion (edgraph/server.go:1685).

A runaway @recurse or k-shortest must raise the reference's error
instead of silently OOMing the driver at scale.
"""

import pytest

from tests.conftest import SF_SMALL


def _executor(graph, **kw):
    from dgraph_spark.plans import Executor

    return Executor(graph, **kw)


def test_recurse_edge_cap_raises(graph):
    from dgraph_spark.plans.executor import ResourceLimitError
    from dgraph_spark.sources.tpch_graph import uid_of

    ex = _executor(graph, limit_query_edge=5)
    u = uid_of("region", 1)
    with pytest.raises(ResourceLimitError, match="Exceeded query edge limit = 5"):
        ex.execute(f'''
        {{ q(func: uid({u})) @recurse(depth: 4) {{
            ~in_region ~in_nation placed n_name
        }} }}''')


def test_recurse_under_cap_unaffected(graph):
    from dgraph_spark.sources.tpch_graph import uid_of

    ex = _executor(graph)  # default 1M cap
    u = uid_of("customer", 1)
    r = ex.execute(f'''
    {{ q(func: uid({u})) @recurse(depth: 3) {{ in_nation in_region n_name }} }}''')
    assert "in_nation" in r["q"][0]


def test_shortest_edge_cap_raises(graph):
    from dgraph_spark.plans.executor import ResourceLimitError
    from dgraph_spark.sources.tpch_graph import uid_of

    ex = _executor(graph, limit_query_edge=1)
    src = uid_of("customer", 1)
    dst = uid_of("region", 0)
    with pytest.raises(ResourceLimitError, match="Exceeded query edge limit"):
        ex.execute(f'''
        {{ path as shortest(from: {src}, to: {dst}) {{ in_nation in_region }} }}''')


def test_shortest_maxfrontiersize_parses_and_runs(graph):
    import pyspark.sql.functions as F
    from dgraph_spark.sources.tpch_graph import uid_of

    ex = _executor(graph)
    src = uid_of("customer", 1)
    g = ex.g
    n = g.edge("in_nation").where(F.col("subject") == src).collect()[0]["object"]
    rgn = g.edge("in_region").where(F.col("subject") == n).collect()[0]["object"]
    # generous cap: same answer as uncapped
    r = ex.execute(f'''
    {{ path as shortest(from: {src}, to: {rgn}, maxfrontiersize: 10000) {{
        in_nation in_region
    }} }}''')
    assert r["_path_"][0]["_weight_"] == 2.0


def test_upsert_var_size_cap(spark):
    import pyspark.sql.functions as F
    from dgraph_spark.model import SUBJECT
    from dgraph_spark.mutations import expand_template
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    lines = spark.createDataFrame([('<0x1> <email> "a@x.com" .',)], "value string")
    g = graph_from_triples(
        spark, parse_nquads(lines), SchemaRegistry.parse("email: string ."))
    env = {"v": spark.range(3).select(F.col("id").alias(SUBJECT))}
    with pytest.raises(ValueError, match=r"var \[v\] has over million UIDs"):
        expand_template(g, 'uid(v) <name> "X" .', env, max_var_size=2)
    # under the cap: expands fine (3 rows, one per uid)
    out = expand_template(g, 'uid(v) <name> "X" .', env, max_var_size=3)
    assert out.count() == 3


def test_small_loop_conf_interleaved(spark):
    """Two interleaved loops on one session: the regime is refcounted,
    so the ORIGINAL conf is saved once and restored only when the last
    loop exits (a per-instance save/restore would capture the reduced
    conf as 'original' and leave the session quartered)."""
    from dgraph_spark.model import SmallLoopConf

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    a, b = SmallLoopConf(spark), SmallLoopConf(spark)
    a.adapt(10)
    reduced = spark.conf.get("spark.sql.shuffle.partitions")
    assert int(reduced) == max(8, int(orig) // 4)
    b.adapt(10)        # second loop joins the regime
    a.exit()           # first leaves: regime must STAY for b
    assert spark.conf.get("spark.sql.shuffle.partitions") == reduced
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    b.exit()           # last leaves: original conf restored
    assert spark.conf.get("spark.sql.shuffle.partitions") == orig
    # growing past the cap restores mid-loop, re-entry re-reduces
    c = SmallLoopConf(spark)
    c.adapt(10)
    c.adapt(10_000_000)
    assert spark.conf.get("spark.sql.shuffle.partitions") == orig
    c.adapt(10)
    assert spark.conf.get("spark.sql.shuffle.partitions") == reduced
    c.exit()
    assert spark.conf.get("spark.sql.shuffle.partitions") == orig
