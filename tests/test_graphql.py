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
