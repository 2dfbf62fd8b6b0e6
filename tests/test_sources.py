"""RDF/JSON loaders + export round-trips (model: chunker tests)."""

import json

from dgraph_spark.model import Graph
from dgraph_spark.schema import SchemaRegistry
from dgraph_spark.sources.json_loader import json_to_graph
from dgraph_spark.sources.rdf import (
    export_json,
    export_rdf,
    graph_from_triples,
    parse_nquads,
)

NQUADS = """
# a comment
<0x1> <name> "Alice"@en .
<0x1> <name> "Алиса"@ru .
<0x1> <age> "25"^^<int> .
<0x2> <name> "Bob" .
<0x1> <friend> <0x2> (weight=0.5, close=true) .
_:new <name> "Carol" .
<0x1> <friend> _:new .
"""

SCHEMA = """
name: string @index(hash) @lang .
age: int .
friend: [uid] @reverse .
"""


def _lines(spark, text):
    return spark.createDataFrame([(l,) for l in text.splitlines() if l.strip()], "value string")


def test_parse_nquads(spark):
    t = parse_nquads(_lines(spark, NQUADS)).collect()
    by_pred = {}
    for r in t:
        by_pred.setdefault(r["predicate"], []).append(r)
    assert len(by_pred["name"]) == 4
    assert {r["lang"] for r in by_pred["name"]} == {"en", "ru", None}
    age = by_pred["age"][0]
    assert age["value_str"] == "25" and age["datatype"] == "int"
    fr = [r for r in by_pred["friend"] if r["object_uid"] == 2][0]
    assert fr["subject"] == 1
    assert fr["facets"]["weight"] == "0.5" and fr["facets"]["close"] == "true"
    blank = [r for r in by_pred["friend"] if r["object_uid"] != 2][0]
    carol = [r for r in by_pred["name"] if r["value_str"] == "Carol"][0]
    assert blank["object_uid"] == carol["subject"]  # blank node unified


def test_graph_from_triples_and_query(spark):
    triples = parse_nquads(_lines(spark, NQUADS))
    g = graph_from_triples(spark, triples, SchemaRegistry.parse(SCHEMA))
    from dgraph_spark.plans import Executor

    r = Executor(g).execute('{ q(func: eq(name@en, "Alice")) { nm: name@en age friend { fn: name } } }')
    node = r["q"][0]
    assert node["nm"] == "Alice" and node["age"] == 25
    assert {c["fn"] for c in node["friend"]} == {"Bob", "Carol"}


def test_export_rdf_roundtrip(spark):
    triples = parse_nquads(_lines(spark, NQUADS))
    g = graph_from_triples(spark, triples, SchemaRegistry.parse(SCHEMA))
    lines = [r["line"] for r in export_rdf(g).collect()]
    reparsed = parse_nquads(_lines(spark, "\n".join(lines)))
    g2 = graph_from_triples(spark, reparsed, SchemaRegistry.parse(SCHEMA))
    assert g2.pred("friend").count() == g.pred("friend").count()
    assert g2.pred("name").count() == g.pred("name").count()


def test_export_json(spark):
    triples = parse_nquads(_lines(spark, NQUADS))
    g = graph_from_triples(spark, triples, SchemaRegistry.parse(SCHEMA))
    rows = [json.loads(r["json"]) for r in export_json(g).collect()]
    alice = [r for r in rows if r["uid"] == "0x1"][0]
    assert alice["preds"]["age"] == ["25"]
    assert sorted(alice["preds"]["name"]) == ["Alice", "Алиса"]


def test_json_loader(spark):
    docs = spark.createDataFrame(
        [
            ("0x10", "Acme", [{"city": "Berlin", "zip": "10115"}]),
            ("0x11", "Globex", []),
        ],
        "uid string, company string, offices array<struct<city:string,zip:string>>",
    )
    g = json_to_graph(spark, docs, type_name="Company")
    from dgraph_spark.plans import Executor

    r = Executor(g).execute('{ q(func: eq(company, "Acme")) { company offices { city } } }')
    node = r["q"][0]
    assert node["company"] == "Acme"
    assert node["offices"][0]["city"] == "Berlin"
