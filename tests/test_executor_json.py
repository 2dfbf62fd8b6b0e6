"""Golden-ish JSON shape tests for the executor (model:
query/query0_test.go JSONEq assertions, on the TPC-H graph fixture)."""

from dgraph_spark.sources.tpch_graph import uid_of


def test_nested_traversal(executor):
    r = executor.execute('''
    { q(func: eq(n_name, "NATION_3")) {
        n_name
        cust: ~in_nation @filter(type(Customer) AND gt(c_acctbal, 1000)) (first: 2, orderdesc: c_acctbal) {
          c_name c_acctbal
        }
    } }''')
    assert list(r) == ["q"]
    node = r["q"][0]
    assert node["n_name"] == "NATION_3"
    custs = node["cust"]
    assert len(custs) == 2
    assert custs[0]["c_acctbal"] >= custs[1]["c_acctbal"]
    assert all(c["c_acctbal"] > 1000 for c in custs)


def test_count_attr_and_uid(executor):
    u = uid_of("customer", 1)
    r = executor.execute(f'{{ q(func: uid({u})) {{ uid c_name cnt: count(placed) }} }}')
    node = r["q"][0]
    assert node["uid"] == f"0x{u:x}"
    assert isinstance(node["cnt"], int)


def test_count_uid_root(executor):
    r = executor.execute('{ q(func: type(Region)) { count(uid) } }')
    assert r["q"] == [{"count": 5}]


def test_agg_block(executor):
    r = executor.execute('''
    {
      var(func: type(Order)) { t as o_totalprice }
      s() { total: sum(val(t)) mn: min(val(t)) }
    }''')
    # one single-key node per aggregate (query/outputnode.go shape)
    out = {k: v for d in r["s"] for k, v in d.items()}
    assert out["total"] > 0 and out["mn"] > 0


def test_groupby_json(executor):
    r = executor.execute('''
    { g(func: type(Lineitem)) @groupby(l_returnflag) { cnt: count(uid) } }''')
    groups = r["g"][0]["@groupby"]
    assert {g["l_returnflag"] for g in groups} <= {"A", "N", "R"}
    assert all(g["cnt"] > 0 for g in groups)


def test_cascade_drops_childless(executor):
    r = executor.execute('''
    { q(func: type(Customer)) @cascade {
        c_name
        placed @filter(gt(o_totalprice, 400000)) { o_totalprice }
    } }''')
    assert all("placed" in node and node["placed"] for node in r["q"])


def test_normalize_flattens(executor):
    r = executor.execute('''
    { q(func: eq(n_name, "NATION_0")) @normalize {
        nation: n_name
        ~in_nation @filter(type(Customer)) (first: 2) { cust: c_name c_acctbal }
    } }''')
    flat = r["q"]
    # only ALIASED attrs survive @normalize (c_acctbal is dropped)
    assert all(set(d) <= {"nation", "cust"} for d in flat)
    assert any("cust" in d for d in flat)


def test_recurse_shape(executor):
    u = uid_of("customer", 1)
    r = executor.execute(f'''
    {{ q(func: uid({u})) @recurse(depth: 3) {{ in_nation in_region n_name r_name }} }}''')
    node = r["q"][0]
    # in_nation / in_region are non-list uid preds -> JSON objects
    # (query/outputnode.go: list=false renders single object)
    nation = node["in_nation"]
    assert "n_name" in nation
    assert "in_region" in nation
    assert "r_name" in nation["in_region"]


def test_shortest_path_json(executor):
    src = uid_of("customer", 1)
    # region of customer 1 resolved through the graph itself
    import pyspark.sql.functions as F

    g = executor.g
    n = g.edge("in_nation").where(F.col("subject") == src).collect()[0]["object"]
    rgn = g.edge("in_region").where(F.col("subject") == n).collect()[0]["object"]
    r = executor.execute(f'''
    {{ path as shortest(from: {src}, to: {rgn}) {{ in_nation in_region }} }}''')
    # nested per-hop shape (query/outputnode.go shortest `_path_`)
    root = r["_path_"][0]
    assert root["_weight_"] == 2.0
    assert root["uid"] == f"0x{src:x}"
    hop1 = root["in_nation"]
    assert hop1["uid"] == f"0x{n:x}"
    assert hop1["in_region"]["uid"] == f"0x{rgn:x}"


def test_expand_all(executor):
    """Scalar preds flatten directly into the node (reference JSON shape,
    query/query.go:2038 expandSubgraph -> normal attr children)."""
    u = uid_of("region", 0)
    r = executor.execute(f"{{ q(func: uid({u})) {{ expand(_all_) }} }}")
    node = r["q"][0]
    assert node["r_name"] == "AFRICA"


def test_expand_all_nested_uid_preds(executor):
    """expand(_all_) { body }: uid predicates expand as child blocks
    carrying the body (query/query.go:2139-2143 recursiveCopy)."""
    u = uid_of("nation", 3)
    r = executor.execute(f"{{ q(func: uid({u})) {{ expand(_all_) {{ r_name }} }} }}")
    node = r["q"][0]
    assert node["n_name"] == "NATION_3"
    assert node["in_region"]["r_name"] in {
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}
    # bare expand omits uid-pred children (empty nodes are pruned)
    r2 = executor.execute(f"{{ q(func: uid({u})) {{ expand(_all_) }} }}")
    assert "in_region" not in r2["q"][0]


def test_expand_val_var(spark):
    """expand(val(v)) reads predicate names out of a value variable
    (query/query.go:1823-1830 ExpandPreds)."""
    from dgraph_spark.plans import Executor
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    nq = '\n'.join([
        '<0x1> <name> "Alice" .',
        '<0x1> <city> "Oslo" .',
        '<0x1> <age> "30"^^<int> .',
        # one posting per node: the reference rejects value vars over
        # nodes with >1 postings of a list pred (query/query.go:1640) —
        # multi-pred expand reads DISTINCT values across subjects
        '<0x9> <plist> "name" .',
        '<0xa> <plist> "city" .',
    ])
    lines = spark.createDataFrame([(l,) for l in nq.splitlines()], "value string")
    g = graph_from_triples(spark, parse_nquads(lines), SchemaRegistry.parse(
        "name: string .\ncity: string .\nage: int .\nplist: [string] ."))
    r = Executor(g).execute('''
    {
      var(func: uid(0x9, 0xa)) { p as plist }
      q(func: uid(0x1)) { expand(val(p)) }
    }''')
    node = r["q"][0]
    assert node["name"] == "Alice" and node["city"] == "Oslo"
    assert "age" not in node  # only preds named by the var expand


def test_pagination_negative_first(executor):
    r_all = executor.execute('{ q(func: type(Region), orderasc: r_name) { r_name } }')
    r_last = executor.execute('{ q(func: type(Region), orderasc: r_name, first: -2) { r_name } }')
    names = [n["r_name"] for n in r_all["q"]]
    last2 = [n["r_name"] for n in r_last["q"]]
    assert last2 == names[-2:]


def test_filter_or_not(executor):
    r = executor.execute('''
    { q(func: type(Nation)) @filter(eq(n_name, "NATION_1") OR eq(n_name, "NATION_2")) { n_name } }''')
    assert {n["n_name"] for n in r["q"]} == {"NATION_1", "NATION_2"}
    r2 = executor.execute('''
    { q(func: type(Region)) @filter(NOT eq(r_name, "AFRICA")) { r_name } }''')
    assert {n["r_name"] for n in r2["q"]} == {"AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}


def test_agg_only_math_respects_defining_aggregate(executor):
    """math() over m as min/max(val(x)) must not collapse with SUM
    (query/query.go scalar aggregates; VERDICT r1 wrong-item 2)."""
    r = executor.execute('''
    {
      var(func: type(Part)) { x as p_size }
      me() {
        m1 as min(val(x))
        m2 as max(val(x))
        spread: math(m2 - m1)
      }
    }''')
    node = {k: v for d in r["me"] for k, v in d.items()}
    mn, mx = node["min(val(x))"], node["max(val(x))"]
    assert node["spread"] == mx - mn > 0
    # sum-collapse of either side would blow the spread far past max
    assert node["spread"] < mx + 1


def test_recurse_edge_dedup_semantics(spark):
    """loop=false is reachMap edge-dedup (query/recurse.go:117-127): an
    EDGE is traversed at most once, but a node may reappear via a
    not-yet-taken edge — a<->b shows a again under b, then stops."""
    from dgraph_spark.plans import Executor
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    nq = '\n'.join([
        '<0x1> <name> "a" .', '<0x2> <name> "b" .',
        '<0x1> <knows> <0x2> .', '<0x2> <knows> <0x1> .',
    ])
    lines = spark.createDataFrame([(l,) for l in nq.splitlines()], "value string")
    g = graph_from_triples(spark, parse_nquads(lines), SchemaRegistry.parse(
        "name: string .\nknows: [uid] ."))
    r = Executor(g).execute('{ q(func: uid(0x1)) @recurse(depth: 5) { knows name } }')
    a = r["q"][0]
    assert a["name"] == "a"
    b = a["knows"][0]
    assert b["name"] == "b"
    a2 = b["knows"][0]           # back-edge b->a IS taken (new edge)
    assert a2["name"] == "a"
    assert "knows" not in a2     # a->b already taken -> recursion stops


def test_rdf_object_expr_matches_driver_renderer(spark):
    """The distributed RDF line formatter (_rdf_object_expr) is
    byte-identical to the driver renderer (_rdf_object) for the types it
    claims — strings with every escape class, integers, booleans."""
    from pyspark.sql import functions as F

    from dgraph_spark.plans.executor import _rdf_object, _rdf_object_expr

    vals = ["plain", 'quo"te', "back\\slash", "new\nline", "tab\there",
            "ünïcodé 你好", "ctrl\x01char", ""]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["o"] for r in df.select(
        _rdf_object_expr(F.col("v"), "string").alias("o")).collect()]
    assert got == [_rdf_object(v, "string") for v in vals]

    di = spark.createDataFrame([(0,), (42,), (-7,), (2 ** 62,)], "v long")
    gi = [r["o"] for r in di.select(
        _rdf_object_expr(F.col("v"), "bigint").alias("o")).collect()]
    assert gi == ['"0"', '"42"', '"-7"', f'"{2 ** 62}"']

    db = spark.createDataFrame([(True,), (False,)], "v boolean")
    gb = [r["o"] for r in db.select(
        _rdf_object_expr(F.col("v"), "boolean").alias("o")).collect()]
    assert gb == ["true", "false"]

    # types with driver-only rendering are declined, not mis-rendered
    assert _rdf_object_expr(F.col("v"), "double") is None
    assert _rdf_object_expr(F.col("v"), "timestamp") is None
