"""set/delete/upsert mutation semantics (model: systest mutations +
edgraph/server.go doMutate paths)."""

from pyspark.sql import functions as F

from dgraph_spark.model import Graph
from dgraph_spark.mutations import delete_nquads, set_nquads, upsert
from dgraph_spark.schema import SchemaRegistry
from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

SCHEMA = "name: string .\nage: int .\nfriend: [uid] .\nemail: string @upsert ."


def _graph(spark, nq: str) -> Graph:
    lines = spark.createDataFrame([(l,) for l in nq.splitlines() if l.strip()], "value string")
    return graph_from_triples(spark, parse_nquads(lines), SchemaRegistry.parse(SCHEMA))


def test_set_overwrites_scalar(spark):
    g = _graph(spark, '<0x1> <name> "Alice" .\n<0x1> <age> "25"^^<int> .')
    g2 = set_nquads(g, '<0x1> <age> "26"^^<int> .')
    vals = [r["value"] for r in g2.pred("age").collect()]
    assert vals == [26]  # single-valued overwrite (posting Ovr)


def test_set_unions_uid_list(spark):
    g = _graph(spark, "<0x1> <friend> <0x2> .")
    g2 = set_nquads(g, "<0x1> <friend> <0x3> .\n<0x1> <friend> <0x2> .")
    objs = sorted(r["object"] for r in g2.pred("friend").collect())
    assert objs == [2, 3]


def test_set_new_predicate(spark):
    g = _graph(spark, '<0x1> <name> "Alice" .')
    g2 = set_nquads(g, '<0x1> <nickname> "Al" .')
    assert g2.pred("nickname").count() == 1


def test_delete_triple_and_star(spark):
    g = _graph(spark, '<0x1> <friend> <0x2> .\n<0x1> <friend> <0x3> .\n<0x1> <name> "A" .')
    g2 = delete_nquads(g, "<0x1> <friend> <0x2> .")
    assert [r["object"] for r in g2.pred("friend").collect()] == [3]
    g3 = delete_nquads(g2, "<0x1> <friend> * .")
    assert g3.pred("friend").count() == 0
    assert g3.pred("name").count() == 1


def test_mutation_text_document(spark):
    from dgraph_spark.mutations import mutate

    g = _graph(spark, '<0x1> <name> "Alice" .\n<0x1> <friend> <0x2> .')
    g2 = mutate(g, '''
    {
      set { <0x1> <friend> <0x3> . }
      delete { <0x1> <friend> <0x2> . }
    }''')
    assert [r["object"] for r in g2.pred("friend").collect()] == [3]


def test_upsert_text_block(spark):
    from dgraph_spark.mutations import upsert_text

    g = _graph(spark, '<0x1> <email> "a@x.com" .')
    r = upsert_text(g, '''
    upsert {
      query { v as var(func: eq(email, "b@x.com")) }
      mutation @if(eq(len(v), 0)) {
        set { <0x99> <email> "b@x.com" . }
      }
    }''')
    assert r.applied
    assert r.graph.pred("email").count() == 2
    # uid(v) substitution path: add a name to every matched email node
    r2 = upsert_text(r.graph, '''
    upsert {
      query { v as var(func: eq(email, "b@x.com")) }
      mutation @if(gt(len(v), 0)) {
        set { uid(v) <name> "Bee" . }
      }
    }''')
    assert r2.applied and r2.matched == 1
    names = {x["value"] for x in r2.graph.pred("name").collect()}
    assert "Bee" in names


def test_conditional_upsert(spark):
    g = _graph(spark, '<0x1> <email> "a@x.com" .\n<0x1> <name> "Alice" .')

    def build(env):
        # create a node for the email only if it doesn't exist
        return parse_nquads(
            spark.createDataFrame([('<0x99> <email> "b@x.com" .',)], "value string")
        )

    # email b@x.com absent -> v empty -> @if(eq(len(v),0)) applies
    r = upsert(g, '{ v as var(func: eq(email, "b@x.com")) }', build,
               cond="empty", cond_var="v")
    assert r.applied and r.matched == 0
    assert r.graph.pred("email").count() == 2

    # now it exists -> second identical upsert must NOT apply
    r2 = upsert(r.graph, '{ v as var(func: eq(email, "b@x.com")) }', build,
                cond="empty", cond_var="v")
    assert not r2.applied and r2.matched == 1
