"""GraphQL façade: generated query/get/aggregate API -> DQL -> results
(reference: graphql/resolve/query_rewriter.go)."""

from dgraph_spark.graphql import execute_graphql, graphql_to_dql
from dgraph_spark.sources.tpch_graph import uid_of


def test_query_with_filter_and_order(graph):
    r = execute_graphql(graph, '''
    {
      queryCustomer(filter: {c_acctbal: {gt: 9000}},
                    order: {desc: c_acctbal}, first: 3) {
        c_name
        c_acctbal
      }
    }''')
    rows = r["data"]["queryCustomer"]
    assert len(rows) == 3
    assert rows[0]["c_acctbal"] >= rows[1]["c_acctbal"]
    assert all(x["c_acctbal"] > 9000 for x in rows)


def test_get_by_uid_with_nested(graph):
    u = uid_of("customer", 1)
    r = execute_graphql(graph, f'''
    {{
      getCustomer(uid: "{hex(u)}") {{
        c_name
        placed(first: 2, order: {{desc: o_totalprice}}) {{
          o_totalprice
        }}
      }}
    }}''')
    node = r["data"]["getCustomer"][0]
    assert node["c_name"].startswith("Customer#")
    assert len(node["placed"]) == 2


def test_filter_combinators(graph):
    r = execute_graphql(graph, '''
    {
      queryNation(filter: {or: [{n_name: {eq: "NATION_1"}}, {n_name: {eq: "NATION_2"}}]}) {
        n_name
      }
    }''')
    assert {x["n_name"] for x in r["data"]["queryNation"]} == {"NATION_1", "NATION_2"}


def test_aggregate(graph):
    r = execute_graphql(graph, '''
    {
      aggregateOrder(filter: {o_orderstatus: {eq: "F"}}) {
        count
        o_totalpriceMax
        o_totalpriceAvg
      }
    }''')
    agg = r["data"]["aggregateOrder"][0]
    assert agg["count"] > 0
    assert agg["o_totalpriceMax"] > agg["o_totalpriceAvg"] > 0


def test_rewrite_text_shape():
    dql = graphql_to_dql('{ queryPart(filter: {p_name: {anyofterms: "green"}}) { p_name } }')
    assert "func: type(Part)" in dql
    assert 'anyofterms(p_name, "green")' in dql


def _mini_graph(spark):
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    nq = '\n'.join([
        '<0x1> <dgraph.type> "Person" .',
        '<0x1> <name> "Alice" .',
        '<0x1> <age> "30"^^<int> .',
        '<0x2> <dgraph.type> "Person" .',
        '<0x2> <name> "Bob" .',
        '<0x2> <age> "22"^^<int> .',
    ])
    lines = spark.createDataFrame([(l,) for l in nq.splitlines()], "value string")
    reg = SchemaRegistry.parse(
        "name: string @index(exact) .\nage: int .\nknows: [uid] .\n"
        "dgraph.type: [string] @index(exact) .")
    reg.define_type("Person", ["name", "age", "knows"])
    return graph_from_triples(spark, parse_nquads(lines), reg)


def test_graphql_add_mutation(spark):
    """addT -> blank-node set mutation + payload selection
    (graphql/resolve/mutation_rewriter.go Rewrite add path)."""
    from dgraph_spark.graphql import execute_graphql_mutation

    g = _mini_graph(spark)
    r, g2 = execute_graphql_mutation(g, '''
    mutation {
      addPerson(input: [{name: "Carol", age: 41}, {name: "Dan", age: 19}]) {
        numUids
        person { name age }
      }
    }''')
    p = r["data"]["addPerson"]
    assert p["numUids"] == 2
    assert {x["name"] for x in p["person"]} == {"Carol", "Dan"}
    assert g2.pred("name").count() == 4
    assert g.pred("name").count() == 2  # original graph untouched


def test_graphql_update_mutation(spark):
    """updateT: filter -> uid relation -> relational set/remove
    (mutation_rewriter.go RewriteQueries + Rewrite update path)."""
    from dgraph_spark.graphql import execute_graphql_mutation

    g = _mini_graph(spark)
    r, g2 = execute_graphql_mutation(g, '''
    mutation {
      updatePerson(input: {
        filter: {age: {ge: 30}},
        set: {name: "Elder"},
        remove: {age: null}
      }) { numUids }
    }''')
    assert r["data"]["updatePerson"]["numUids"] == 1
    names = {x["value"] for x in g2.pred("name").collect()}
    assert "Elder" in names and "Alice" not in names
    assert g2.pred("age").count() == 1  # Alice's age removed


def test_graphql_delete_mutation(spark):
    """deleteT: wildcard-delete every type predicate of matched nodes
    (mutation_rewriter.go delete path)."""
    from dgraph_spark.graphql import execute_graphql_mutation

    g = _mini_graph(spark)
    r, g2 = execute_graphql_mutation(g, '''
    mutation { deletePerson(filter: {name: {eq: "Bob"}}) { msg numUids } }''')
    assert r["data"]["deletePerson"] == {"msg": "Deleted", "numUids": 1}
    assert g2.pred("name").count() == 1
    assert g2.pred("age").count() == 1
