"""LDBC interactive-workload suite (systest/ldbc/test_cases.yaml: 7
IS-short + 12 IC-complex queries).

The LDBC dataset itself isn't vendored in the reference repo, so this
runs at two levels:

- every one of the 19 corpus queries parses, plans, and executes on an
  LDBC-schema graph (multi-var blocks, @recurse over reverse edges,
  shortest with bidirectional edges, facet-ordered expansions — the
  shapes the dataset-scale suite exists to exercise);
- the queries whose pinned answers are closed under a hand-built
  fixture (IS01/03/04/05/06 entity lookups and the IC13 no-path case)
  must reproduce the reference JSON exactly, including facet datetime
  offsets preserved as written (+00:00, not Z).
"""

from __future__ import annotations

import json
import os

import pytest
import yaml

_CASES_PATH = "/root/reference/systest/ldbc/test_cases.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_CASES_PATH),
    reason="reference LDBC corpus not available")

SCHEMA = """
fqid: string @index(hash) @upsert .
id: int @index(int) .
firstName: string @index(hash, term) .
lastName: string @index(hash) .
name: string @index(hash, term) .
birthday: datetime @index(hour) .
creationDate: datetime @index(hour) .
joinDate: datetime .
locationIP: string .
browserUsed: string .
gender: string .
content: string @index(fulltext) .
imageFile: string .
title: string .
email: string .
language: string .
length: int .
classYear: int .
workFrom: int .
knows: [uid] @reverse @count .
hasCreator: [uid] @reverse @count .
replyOf: [uid] @reverse @count .
containerOf: [uid] @reverse .
hasModerator: [uid] @reverse .
isLocatedIn: [uid] @reverse .
isSubclassOf: [uid] @reverse .
hasType: [uid] @reverse .
hasTag: [uid] @reverse @count .
hasInterest: [uid] @reverse .
likes: [uid] @reverse .
studyAt: [uid] .
workAt: [uid] .
"""

# IS01/03/04/05/06 entity neighborhoods reconstructed from the pinned
# answers; everything else left empty so open-ended queries stay empty.
FIXTURE = r"""
_:p1 <fqid> "person_4398046514948" .
_:p1 <firstName> "Abhishek" .
_:p1 <lastName> "Roy" .
_:p1 <birthday> "1985-09-06T00:00:00Z" .
_:p1 <locationIP> "27.54.166.12" .
_:p1 <browserUsed> "Internet Explorer" .
_:p1 <gender> "male" .
_:p1 <creationDate> "2010-06-06T23:43:29.643Z" .
_:p1 <isLocatedIn> _:city1 .
_:city1 <id> "231"^^<int> .
_:city1 <name> "Thanjavur" .
_:p933 <fqid> "person_933" .
_:p933 <id> "933"^^<int> .
_:p933 <firstName> "Mahinda" .
_:p933 <lastName> "Perera" .
_:p1 <dgraph.type> "person" .
_:p933 <dgraph.type> "person" .
_:k1 <dgraph.type> "person" .
_:k2 <dgraph.type> "person" .
_:k3 <dgraph.type> "person" .
_:post3 <dgraph.type> "post" .
_:forum1 <dgraph.type> "forum" .
_:p933 <knows> _:k1 (creationDate=2011-11-16T09:47:46.750+00:00) .
_:p933 <knows> _:k2 (creationDate=2011-04-02T21:17:40.919+00:00) .
_:p933 <knows> _:k3 (creationDate=2010-04-08T04:18:41.298+00:00) .
_:k1 <id> "24189255814068"^^<int> .
_:k1 <firstName> "Karl" .
_:k1 <lastName> "Wagner" .
_:k2 <id> "15393162790400"^^<int> .
_:k2 <firstName> "Jose" .
_:k2 <lastName> "Costa" .
_:k3 <id> "2199023256437"^^<int> .
_:k3 <firstName> "Rudolf" .
_:k3 <lastName> "Engel" .
_:post3 <fqid> "post_3" .
_:post3 <creationDate> "2010-02-14T20:30:21.451Z" .
_:post3 <content> "About Rupert Murdoch, alised US citizen iAbout Napoleon, tinuation of the waAbout Ferdinand II of Aragon, (1" .
_:post3 <imageFile> "" .
_:post3 <hasCreator> _:p933 .
_:forum1 <id> "0"^^<int> .
_:forum1 <title> "Wall of Mahinda Perera" .
_:forum1 <containerOf> _:post3 .
_:forum1 <hasModerator> _:p933 .
"""


@pytest.fixture(scope="module")
def ldbc_graph(spark):
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    lines = spark.createDataFrame(
        [(ln,) for ln in FIXTURE.splitlines() if ln.strip()], "value string")
    reg = SchemaRegistry.parse(SCHEMA)
    g = graph_from_triples(spark, parse_nquads(lines), reg)
    for t in ("person", "post", "comment", "forum", "tag", "tagclass",
              "place", "organisation"):
        g.schema.define_type(t, [])
    return g


def _cases():
    return yaml.safe_load(open(_CASES_PATH))


def test_ldbc_corpus_executes(ldbc_graph):
    """All 19 LDBC IS/IC queries parse, plan, and execute."""
    from dgraph_spark.plans import Executor

    errors = []
    for name, c in _cases().items():
        try:
            Executor(ldbc_graph).execute(c["query"])
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name} ({c.get('tag')}): {type(e).__name__}: {e}")
    assert errors == []


_EXACT = {"q1": "IS01", "q3": "IS03", "q4": "IS04", "q5": "IS05",
          "q6": "IS06", "q19": "IC13"}


@pytest.mark.parametrize("qname", sorted(_EXACT))
def test_ldbc_pinned_answers(ldbc_graph, qname):
    """Fixture-closed cases reproduce the reference's pinned JSON —
    including knows-edge facet datetimes rendered with their original
    +00:00 offsets."""
    from dgraph_spark.plans import Executor

    c = _cases()[qname]
    got = Executor(ldbc_graph).execute(c["query"])
    want = json.loads(c["resp"])
    assert got == want, f"{qname} ({c['tag']})"
