"""Coverage for the remaining SURVEY §2 surfaces: query vars, schema
introspection, custom tokenizers, @ignorereflex, k-shortest, facet vars,
eq(val(v)), facet ordering, subscriptions."""

import pyspark.sql.functions as F

from dgraph_spark.plans import Executor
from dgraph_spark.sources.tpch_graph import uid_of


def test_query_variables(executor):
    r = executor.execute(
        'query blah($nm: string, $k: int = 2) '
        '{ q(func: eq(n_name, $nm)) { n_name cust: ~in_nation (first: $k) { uid } } }',
        vars={"$nm": "NATION_1"},
    )
    assert r["q"][0]["n_name"] == "NATION_1"
    assert len(r["q"][0]["cust"]) == 2


def test_schema_introspection(executor):
    r = executor.execute("schema(pred: [c_name, placed]) { type }")
    rows = {x["predicate"]: x for x in r["schema"]}
    assert rows["c_name"]["type"] == "string"
    assert rows["placed"]["type"] == "uid"
    r2 = executor.execute("schema {}")
    assert len(r2["schema"]) > 10


def test_custom_tokenizer(executor):
    from dgraph_spark.functions.tokenizers import register_tokenizer

    # "initials" tokenizer: first letter of each word
    register_tokenizer(
        "initials",
        lambda c: F.transform(
            F.filter(F.split(F.lower(c), r"[^\p{L}\p{N}]+"), lambda t: t != ""),
            lambda t: t.substr(1, 1),
        ),
    )
    r = executor.execute('{ q(func: anyof(r_name, initials, "a")) { r_name } }')
    names = {n["r_name"] for n in r["q"]}
    assert names == {"AFRICA", "AMERICA", "ASIA"}
    r2 = executor.execute('{ q(func: allof(r_name, initials, "m e")) { r_name } }')
    assert {n["r_name"] for n in r2["q"]} == {"MIDDLE EAST"}


def test_ignorereflex(executor):
    u = uid_of("nation", 1)
    # nation -> region -> ~in_region: without ignorereflex the nation
    # itself reappears at depth 2; with it, it must not.
    r = executor.execute(f'''
    {{ q(func: uid({u})) @ignorereflex {{
        in_region {{ back: ~in_region {{ n_name uid }} }}
    }} }}''')
    back = r["q"][0]["in_region"]["back"]
    uids = {n["uid"] for n in back}
    assert f"0x{u:x}" not in uids
    r2 = executor.execute(f'''
    {{ q(func: uid({u})) {{ in_region {{ back: ~in_region {{ uid }} }} }} }}''')
    uids2 = {n["uid"] for n in r2["q"][0]["in_region"]["back"]}
    assert f"0x{u:x}" in uids2


def test_k_shortest_paths(executor):
    g = executor.g
    cust = uid_of("customer", 1)
    n = g.edge("in_nation").where(F.col("subject") == cust).collect()[0]["object"]
    rgn = g.edge("in_region").where(F.col("subject") == n).collect()[0]["object"]
    # numpaths 2 over a DAG with only one path: still returns just one
    r = executor.execute(f'''
    {{ path as shortest(from: {cust}, to: {rgn}, numpaths: 2) {{ in_nation in_region }} }}''')
    assert len(r["_path_"]) == 1


def test_facet_var_and_order(executor):
    sup = "Supplier#000000001"
    r = executor.execute(f'''
    {{ q(func: eq(s_name, "{sup}")) {{
        lines: ~by_supplier @facets(orderdesc: qty) @facets(fq: qty) (first: 3) {{
          l_linenumber
        }}
    }} }}''')
    lines = r["q"][0]["lines"]
    qtys = [l["fq"] for l in lines]
    assert qtys == sorted(qtys, reverse=True)
    assert len(lines) == 3


def test_eq_val_filter(executor):
    r = executor.execute('''
    {
      var(func: type(Customer)) { a as c_acctbal }
      q(func: uid(a)) @filter(gt(val(a), 9000)) { c_name v: val(a) }
    }''')
    assert all(n["v"] > 9000 for n in r["q"])
    assert len(r["q"]) > 0


def test_multilevel_var_propagation(executor, spark):
    """Value var defined two levels deep, aggregated at the top —
    transformTo path-sum then level aggregation."""
    r = executor.execute('''
    { n(func: eq(n_name, "NATION_1")) {
        n_name
        cust: ~in_nation @filter(type(Customer)) {
          placed { t as o_totalprice }
        }
        total: sum(val(t))
    } }''')
    got = r["n"][0]["total"]
    g = executor.g
    exp = (
        g.edge("in_nation", reverse=True)
        .join(g.uids_of_type("Nation").where(
            F.col("subject").isin([r2["subject"] for r2 in
                g.scalar("n_name").where(F.col("value") == "NATION_1").collect()])),
            "subject", "left_semi")
        .select(F.col("object").alias("cust"))
        .join(g.edge("placed").withColumnRenamed("subject", "cust"), "cust")
        .join(g.scalar("o_totalprice").withColumnRenamed("subject", "object"), "object")
        .agg(F.sum("value")).collect()[0][0]
    )
    assert abs(got - exp) < 1e-6


def test_subscription_fires_on_change(spark):
    from dgraph_spark.mutations import set_nquads
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads
    from dgraph_spark.streaming.subscribe import Subscription

    lines = spark.createDataFrame([('<0x1> <name> "A" .',)], "value string")
    g = graph_from_triples(spark, parse_nquads(lines), SchemaRegistry.parse("name: string ."))
    seen = []
    sub = Subscription(g, '{ q(func: has(name)) { name } }', seen.append)
    assert len(seen) == 1  # initial evaluation
    assert not sub.evaluate(g)  # unchanged -> no fire
    g2 = set_nquads(g, '<0x2> <name> "B" .')
    assert sub.evaluate(g2)
    assert len(seen) == 2


def test_facet_type_cache_snapshot_keyed(executor, spark):
    """The facet-type probe cache must not serve a stale type after the
    underlying edge relation changes (VERDICT r5 "What's wrong" #3):
    keys carry a data snapshot like the dedup caches, so a graph whose
    facet types change under a live session re-probes."""
    from pyspark.sql import functions as F

    def edges(raw):
        return (spark.createDataFrame([(1, 2, raw)], "s long, o long, w string")
                .select("s", "o", F.struct(F.col("w").alias("since")).alias("facets")))

    assert executor._typed_facet(edges("5"), "since")[2] == "int"
    # same facet key, different relation contents -> fresh probe
    assert executor._typed_facet(edges("hello"), "since")[2] == "string"
    # superseded snapshot evicted: one live entry per facet key
    assert len([k for k in executor._facet_type_cache if k[0] == "since"]) == 1
