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


def test_reference_rewrites_execute_end_to_end(spark):
    """The byte-exact GraphQL rewriters COMPOSE with the engine: a
    graph stored with the reference's `Type.field` predicate naming
    answers ref_rewriter-emitted DQL through the Executor, auth chains
    included."""
    import json as _json
    import os as _os

    from dgraph_spark.dql.parser import parse_dql
    from dgraph_spark.graphql.auth_rewriter import (parse_auth_rules,
                                                    rewrite_query_with_auth)
    from dgraph_spark.graphql.ref_rewriter import rewrite_query
    from dgraph_spark.graphql.sdl import parse_sdl
    from dgraph_spark.plans import Executor
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    _dir = _os.path.join(_os.path.dirname(__file__), "golden", "graphql")
    schema = parse_sdl(open(_os.path.join(_dir, "schema.graphql")).read())
    nq = """
    _:a1 <Author.name> "Ann Author" .
    _:a1 <dgraph.type> "Author" .
    _:a1 <Author.reputation> "4.3"^^<float> .
    _:a2 <Author.name> "Bob Writer" .
    _:a2 <dgraph.type> "Author" .
    _:a2 <Author.reputation> "8.9"^^<float> .
    _:p1 <Post.title> "Intro to GraphQL" .
    _:p1 <Post.numLikes> "10"^^<int> .
    _:p1 <dgraph.type> "Post" .
    _:p1 <Post.author> _:a1 .
    _:p2 <Post.title> "Advanced DQL" .
    _:p2 <Post.numLikes> "33"^^<int> .
    _:p2 <dgraph.type> "Post" .
    _:p2 <Post.author> _:a2 .
    """
    reg = SchemaRegistry.parse("""
    Author.name: string @index(hash, term) .
    Author.reputation: float @index(float) .
    Post.title: string @index(term) .
    Post.numLikes: int @index(int) .
    Post.author: [uid] @reverse .
    """)
    lines = spark.createDataFrame(
        [(ln.strip(),) for ln in nq.splitlines() if ln.strip()],
        "value string")
    g = graph_from_triples(spark, parse_nquads(lines), reg)
    g.schema.define_type("Author", ["Author.name", "Author.reputation"])
    g.schema.define_type("Post", ["Post.title", "Post.numLikes",
                                  "Post.author"])

    dql = rewrite_query(
        'query { queryPost(filter: {title: {anyofterms: "GraphQL"}}) '
        '{ title numLikes author { name } } }', schema)
    got = Executor(g).execute(parse_dql(dql))
    row = got["queryPost"][0]
    assert row["Post.title"] == "Intro to GraphQL"
    assert row["Post.numLikes"] == 10
    assert row["Post.author"][0]["Author.name"] == "Ann Author"
    assert len(got["queryPost"]) == 1

    dql2 = rewrite_query(
        'query { queryAuthor(filter: {reputation: {gt: 5}}, '
        'order: {desc: reputation}) { name reputation } }', schema)
    got2 = Executor(g).execute(parse_dql(dql2))
    assert [r["Author.name"] for r in got2["queryAuthor"]] == ["Bob Writer"]

    # an auth-gated query executes through the same engine: the auth
    # schema's UserSecret rules compile to TypeRoot chains over
    # UserSecret.* predicates
    auth_src = open(_os.path.join(_dir, "auth_schema.graphql")).read()
    aschema = parse_sdl(auth_src)
    arules = parse_auth_rules(auth_src)
    nq2 = """
    _:s1 <UserSecret.aSecret> "mine" .
    _:s1 <UserSecret.ownedBy> "user1" .
    _:s1 <dgraph.type> "UserSecret" .
    _:s2 <UserSecret.aSecret> "other" .
    _:s2 <UserSecret.ownedBy> "user2" .
    _:s2 <dgraph.type> "UserSecret" .
    """
    reg2 = SchemaRegistry.parse("""
    UserSecret.aSecret: string @index(term) .
    UserSecret.ownedBy: string @index(hash) .
    """)
    lines2 = spark.createDataFrame(
        [(ln.strip(),) for ln in nq2.splitlines() if ln.strip()],
        "value string")
    g2 = graph_from_triples(spark, parse_nquads(lines2), reg2)
    g2.schema.define_type("UserSecret",
                          ["UserSecret.aSecret", "UserSecret.ownedBy"])
    adql = rewrite_query_with_auth(
        "query { queryUserSecret { aSecret ownedBy } }", aschema, arules,
        {"USER": "user1"})
    got3 = Executor(g2).execute(parse_dql(adql, allow_unused=True))
    rows3 = got3["queryUserSecret"]
    assert len(rows3) == 1  # the auth chain filtered out user2's secret
    assert rows3[0]["UserSecret.aSecret"] == "mine"
    assert rows3[0]["UserSecret.ownedBy"] == "user1"


def test_execute_graphql_ref_completion(spark):
    """execute_graphql_ref: rewrite -> execute -> completion renames
    Type.field keys to GraphQL response keys, drops internal uids, and
    honors @auth when a JWT is supplied."""
    import os as _os

    from dgraph_spark.graphql import execute_graphql_ref
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    _dir = _os.path.join(_os.path.dirname(__file__), "golden", "graphql")
    auth_src = open(_os.path.join(_dir, "auth_schema.graphql")).read()
    nq = """
    _:s1 <UserSecret.aSecret> "mine" .
    _:s1 <UserSecret.ownedBy> "user1" .
    _:s1 <dgraph.type> "UserSecret" .
    _:s2 <UserSecret.aSecret> "other" .
    _:s2 <UserSecret.ownedBy> "user2" .
    _:s2 <dgraph.type> "UserSecret" .
    """
    reg = SchemaRegistry.parse("""
    UserSecret.aSecret: string @index(term) .
    UserSecret.ownedBy: string @index(hash) .
    """)
    lines = spark.createDataFrame(
        [(ln.strip(),) for ln in nq.splitlines() if ln.strip()],
        "value string")
    g = graph_from_triples(spark, parse_nquads(lines), reg)
    g.schema.define_type("UserSecret",
                         ["UserSecret.aSecret", "UserSecret.ownedBy"])
    out = execute_graphql_ref(
        g, auth_src, "query { queryUserSecret { aSecret ownedBy } }",
        jwt={"USER": "user2"})
    assert out == {"data": {"queryUserSecret": [
        {"aSecret": "other", "ownedBy": "user2"}]}}
    # no JWT: auth-gated type yields the empty response shape
    out2 = execute_graphql_ref(
        g, auth_src, "query { queryUserSecret { aSecret } }")
    assert out2 == {"data": {"queryUserSecret": []}}


def test_execute_graphql_add_ref(spark):
    """Add mutations execute through the byte-exact rewrite pipeline:
    existence queries resolve references against the live graph, the
    setjson applies via the JSON mutation path, and inverse edges
    land."""
    import os as _os

    from dgraph_spark.graphql.resolver import execute_graphql_add_ref
    from dgraph_spark.plans import Executor
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    _dir = _os.path.join(_os.path.dirname(__file__), "golden", "graphql")
    sdl = open(_os.path.join(_dir, "schema.graphql")).read()
    nq = '_:c <Country.name> "India" .\n_:c <dgraph.type> "Country" .'
    reg = SchemaRegistry.parse("""
    Country.name: string @index(trigram, exact) .
    Country.states: [uid] @reverse .
    State.code: string @index(hash) @upsert .
    State.name: string .
    State.country: [uid] .
    """)
    lines = spark.createDataFrame([(ln,) for ln in nq.splitlines()],
                                  "value string")
    g = graph_from_triples(spark, parse_nquads(lines), reg)
    g.schema.define_type("Country", ["Country.name", "Country.states"])
    g.schema.define_type("State", ["State.code", "State.name",
                                   "State.country"])

    g2, roots = execute_graphql_add_ref(g, sdl, '''
    mutation {
      addState(input: [{code: "ka", name: "Karnataka",
                        country: {name: "Fresh Country"}}]) {
        state { code }
      }
    }''')
    assert roots and roots[0].startswith("_:State_")
    got = Executor(g2).execute(
        '{ q(func: eq(State.code, "ka")) { State.name '
        'State.country { Country.name Country.states { State.code } } } }')
    row = got["q"][0]
    assert row["State.name"] == "Karnataka"
    country = row["State.country"][0]
    assert country["Country.name"] == "Fresh Country"
    # inverse edge Country.states -> the new state landed too
    assert country["Country.states"][0]["State.code"] == "ka"
