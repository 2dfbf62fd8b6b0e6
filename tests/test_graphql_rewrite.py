"""GraphQL -> DQL rewrite parity against the reference's own corpus.

``tests/golden/graphql/query_rewrite_cases.yaml`` is the reference's
graphql/resolve/query_test.yaml (167 cases, test TEXT only) over its
resolver schema. Each case pins the EXACT DQL text the reference's
query rewriter emits; ours must match byte-for-byte, and every emitted
query must parse with this engine's own DQL parser.
"""

import json
import os

import pytest
import yaml

from dgraph_spark.dql.parser import parse_dql
from dgraph_spark.graphql.ref_rewriter import rewrite_query
from dgraph_spark.graphql.sdl import parse_sdl

_DIR = os.path.join(os.path.dirname(__file__), "golden", "graphql")
_SCHEMA = parse_sdl(open(os.path.join(_DIR, "schema.graphql")).read())
_CASES = yaml.safe_load(
    open(os.path.join(_DIR, "query_rewrite_cases.yaml")))


def _vars(c: dict) -> dict:
    if "gqlvariables" not in c:
        return {}
    return {("$" + k): v for k, v in json.loads(c["gqlvariables"]).items()}


@pytest.mark.parametrize(
    "case", _CASES,
    ids=[f"{i:03d}-{c['name'][:48]}" for i, c in enumerate(_CASES)])
def test_graphql_rewrite_exact(case):
    got = rewrite_query(case["gqlquery"], _SCHEMA, _vars(case))
    assert got == case["dgquery"].rstrip("\n")


def test_rewritten_dql_parses():
    """Every reference-emitted DQL text is valid input for this
    engine's parser (the rewrite layer and the DQL engine compose)."""
    for c in _CASES:
        parse_dql(c["dgquery"], {"$pwd0": "x"}, allow_unused=True)


_DEL_CASES = yaml.safe_load(
    open(os.path.join(_DIR, "delete_mutation_cases.yaml")))


@pytest.mark.parametrize(
    "case", _DEL_CASES,
    ids=[c["name"][:48] for c in _DEL_CASES])
def test_graphql_delete_mutation_rewrite(case):
    """deleteT(filter) upsert rewriting (graphql/resolve/
    delete_mutation_test.yaml): exact dgquery text + deletejson payload
    including @hasInverse / reverse-predicate back-edge cleanup."""
    from dgraph_spark.graphql.ref_rewriter import rewrite_delete_mutation

    q, dj = rewrite_delete_mutation(case["gqlmutation"], _SCHEMA,
                                    _vars(case))
    assert q == case["dgquery"].rstrip("\n")
    assert dj == json.loads(case["dgmutations"][0]["deletejson"])
