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


_ADD_CASES = yaml.safe_load(
    open(os.path.join(_DIR, "add_mutation_cases.yaml")))
_UPD_CASES = yaml.safe_load(
    open(os.path.join(_DIR, "update_mutation_cases.yaml")))


def _run_mutation_case(case, rewriter_cls):
    """Mirrors the reference's mutationRewriting harness
    (graphql/resolve/mutation_test.go): compare the existence-query text,
    then the upsert mutations (cond exact, payloads JSON-equal) and the
    secondary query text.  Pins the `$now` clock to the reference's
    test constant (wrappers.go:2355 uses it only under `go test`)."""
    from dgraph_spark.graphql import mutation_rewriter as mr
    mr.set_now_clock(mr.GOLDEN_NOW)
    try:
        _run_mutation_case_inner(case, rewriter_cls)
    finally:
        mr.set_now_clock(None)


def _run_mutation_case_inner(case, rewriter_cls):
    rw = rewriter_cls(_SCHEMA, _vars(case))
    q, err = rw.rewrite_queries(case["gqlmutation"])
    if case.get("error"):
        assert err == case["error"]["message"]
        return
    assert err is None, err
    assert q == (case.get("dgquery") or "").rstrip("\n")
    qname = {}
    if case.get("qnametouid"):
        qname = json.loads(case["qnametouid"])
    muts, qsec, err2 = rw.rewrite(qname)
    if case.get("error2"):
        assert err2 == case["error2"]["message"]
        return
    assert err2 is None, err2
    expected = case.get("dgmutations") or []
    assert len(muts) == len(expected), (muts, expected)
    for got, want in zip(muts, expected):
        assert got.get("cond", "") == (want.get("cond") or "")
        if want.get("setjson") or got.get("setjson") is not None:
            assert got.get("setjson") == json.loads(want["setjson"])
        if want.get("deletejson") or got.get("deletejson") is not None:
            assert got.get("deletejson") == json.loads(want["deletejson"])
    assert qsec == (case.get("dgquerysec") or "").rstrip("\n")


@pytest.mark.parametrize(
    "case", _ADD_CASES,
    ids=[f"{i:03d}-{c['name'][:48]}" for i, c in enumerate(_ADD_CASES)])
def test_graphql_add_mutation_rewrite(case):
    """addT(input, upsert) rewriting (graphql/resolve/
    add_mutation_test.yaml): existence queries, setjson with blank
    uids + dgraph.type + inverse edges, additional-delete var blocks,
    upsert conditions."""
    from dgraph_spark.graphql.mutation_rewriter import AddMutationRewriter

    _run_mutation_case(case, AddMutationRewriter)


@pytest.mark.parametrize(
    "case", _UPD_CASES,
    ids=[f"{i:03d}-{c['name'][:48]}" for i, c in enumerate(_UPD_CASES)])
def test_graphql_update_mutation_rewrite(case):
    """updateT(input: {filter, set, remove}) rewriting
    (graphql/resolve/update_mutation_test.yaml)."""
    from dgraph_spark.graphql.mutation_rewriter import UpdateMutationRewriter

    _run_mutation_case(case, UpdateMutationRewriter)


_AUTH_SCHEMA_SRC = open(os.path.join(_DIR, "auth_schema.graphql")).read()
_AUTH_CASES = yaml.safe_load(
    open(os.path.join(_DIR, "auth_query_cases.yaml")))


@pytest.mark.parametrize(
    "case", _AUTH_CASES,
    ids=[f"{i:03d}-{c['name'][:48]}" for i, c in enumerate(_AUTH_CASES)])
def test_graphql_auth_query_rewrite(case):
    """@auth query rewriting (graphql/resolve/auth_query_test.yaml):
    JWT-evaluated RBAC rules, graph-rule @cascade var blocks, TypeRoot
    chains, child-level uid() filters, interface/union/aggregate/
    password/_entities handling — exact DQL text for all 76 cases."""
    from dgraph_spark.graphql.auth_rewriter import (parse_auth_rules,
                                                    rewrite_query_with_auth)
    from dgraph_spark.graphql.sdl import parse_sdl

    schema = parse_sdl(_AUTH_SCHEMA_SRC)
    rules = parse_auth_rules(_AUTH_SCHEMA_SRC)
    got = rewrite_query_with_auth(case["gqlquery"], schema, rules,
                                  case.get("jwtvar") or {})
    assert got == (case["dgquery"] or "").rstrip("\n")


_AUTH_DEL_CASES = yaml.safe_load(
    open(os.path.join(_DIR, "auth_delete_cases.yaml")))


@pytest.mark.parametrize(
    "case", _AUTH_DEL_CASES,
    ids=[f"{i:03d}-{c['name'][:48]}" for i, c in enumerate(_AUTH_DEL_CASES)])
def test_graphql_auth_delete_mutation_rewrite(case):
    """@auth delete-mutation rewriting (auth_delete_test.yaml): the
    x-as upsert query with TypeRoot auth chains, @hasInverse cleanup
    vars numbered after auth allocations, and the payload re-query
    (filterByUid) as the second upsert — exact text, all 24 cases."""
    from dgraph_spark.graphql.auth_rewriter import (
        parse_auth_rules, rewrite_delete_mutation_with_auth)
    from dgraph_spark.graphql.sdl import parse_sdl

    schema = parse_sdl(_AUTH_SCHEMA_SRC)
    rules = parse_auth_rules(_AUTH_SCHEMA_SRC)
    variables = json.loads(case["variables"]) if case.get("variables") else {}
    dq, muts, dqsec = rewrite_delete_mutation_with_auth(
        case["gqlquery"], schema, rules, case.get("jwtvar") or {}, variables)
    assert dq == case["dgquery"].rstrip("\n")
    expected = case.get("dgmutations") or []
    assert len(muts) == len(expected)
    for got, want in zip(muts, expected):
        assert got["deletejson"] == json.loads(want["deletejson"])
    if case.get("dgquerysec"):
        assert dqsec == case["dgquerysec"].rstrip("\n")


_AUTH_ADD_CASES = yaml.safe_load(
    open(os.path.join(_DIR, "auth_add_cases.yaml")))
_AUTH_UPD_CASES = yaml.safe_load(
    open(os.path.join(_DIR, "auth_update_cases.yaml")))


def _existence_from_queryjson(case) -> dict:
    out = {}
    if case.get("queryjson"):
        for var, rows in json.loads(case["queryjson"]).items():
            if rows:
                out[var] = rows[0]["uid"]
    return out


@pytest.mark.parametrize(
    "case", _AUTH_ADD_CASES,
    ids=[f"{i:03d}-{c['name'][:48]}" for i, c in enumerate(_AUTH_ADD_CASES)])
def test_graphql_auth_add_mutation_rewrite(case):
    """@auth add-mutation rewriting (auth_add_test.yaml): existence
    queries, upsert roots with real update-selector auth chains,
    additional-delete per-edge auth checks, and the post-mutation
    authorizeNewNodes check query built from assigned uids."""
    from dgraph_spark.graphql.auth_rewriter import (
        AuthFailedError, build_new_node_auth_query, parse_auth_rules,
        rewrite_add_mutation_with_auth)
    from dgraph_spark.graphql.sdl import parse_sdl

    schema = parse_sdl(_AUTH_SCHEMA_SRC)
    rules = parse_auth_rules(_AUTH_SCHEMA_SRC)
    jwt = case.get("jwtvar") or {}
    variables = json.loads(case["variables"]) if case.get("variables") else {}
    dq, muts, dqsec, new_nodes, err = rewrite_add_mutation_with_auth(
        case["gqlquery"], schema, rules, jwt, variables,
        _existence_from_queryjson(case))
    if case.get("dgquery"):
        assert dq == case["dgquery"].rstrip("\n")
    if case.get("dgquerysec"):
        assert dqsec == case["dgquerysec"].rstrip("\n")
    if case.get("authquery") is not None and not case.get("skipauth"):
        uids = json.loads(case["uids"]) if case.get("uids") else {}
        try:
            aq = build_new_node_auth_query(schema, rules, jwt, uids,
                                           new_nodes)
        except AuthFailedError:
            # statically denied — the reference errors before executing
            # the check query; the corpus marks these with `error`
            assert case.get("error")
            return
        if aq is not None:
            assert aq == (case.get("authquery") or "").rstrip("\n")


@pytest.mark.parametrize(
    "case", [c for c in _AUTH_UPD_CASES if not c.get("error")],
    ids=[f"{i:03d}-{c['name'][:48]}"
         for i, c in enumerate(_AUTH_UPD_CASES) if not c.get("error")])
def test_graphql_auth_update_mutation_rewrite(case):
    """@auth update-mutation rewriting (auth_update_test.yaml): the
    x-as upsert query with update-rule chains and additional-delete
    auth checks (error cases are resolution-level, exercised in the
    reference's executor mock — rewrite output asserted here)."""
    from dgraph_spark.graphql.auth_rewriter import (
        parse_auth_rules, rewrite_update_mutation_with_auth)
    from dgraph_spark.graphql.sdl import parse_sdl

    schema = parse_sdl(_AUTH_SCHEMA_SRC)
    rules = parse_auth_rules(_AUTH_SCHEMA_SRC)
    variables = json.loads(case["variables"]) if case.get("variables") else {}
    dq, muts, dqsec, err = rewrite_update_mutation_with_auth(
        case["gqlquery"], schema, rules, case.get("jwtvar") or {}, variables,
        _existence_from_queryjson(case))
    if case.get("dgquery"):
        assert dq == case["dgquery"].rstrip("\n")
    assert dqsec == case["dgquerysec"].rstrip("\n")


_MQ_TESTS = yaml.safe_load(
    open(os.path.join(_DIR, "mutation_query_cases.yaml")))
_MQ_TYPES = {
    "Add Post ": ('addPost(input: [{title: "A Post", author: {id: "0x1"}}])',
                  "AddPostPayload", ["0x4"]),
    "Update Post ": ('updatePost(input: {filter: {postID: ["0x4"]}, '
                     'set: {text: "Updated text"}})',
                     "UpdatePostPayload", ["0x4"]),
}
_MQ_ALLOWED = {"UPDATE_MUTATION": ["Update Post "],
               "ADD_UPDATE_MUTATION": ["Add Post ", "Update Post "]}
_MQ_PARAMS = [
    (tt_key, name, case)
    for tt_key, cases in _MQ_TESTS.items()
    for name in _MQ_ALLOWED.get(tt_key, [])
    for case in cases
]


@pytest.mark.parametrize(
    "tt_key,mq_name,case", _MQ_PARAMS,
    ids=[f"{n.strip()}-{c['name'][:40]}" for _t, n, c in _MQ_PARAMS])
def test_graphql_mutation_payload_query_rewrite(tt_key, mq_name, case):
    """FromMutationResult payload-query rewriting
    (mutation_query_test.yaml): the query that fetches a mutation's
    payload selection over the mutated root uids — aliases, deep
    selections, filters/order/pagination, skip/include with unbound
    variables, cascade at every position."""
    from dgraph_spark.graphql.auth_rewriter import rewrite_payload_query

    mut, ptype, uids = _MQ_TYPES[mq_name]
    gql = case["gqlquery"].replace(tt_key, mut, 1)
    want = case["dgquery"].replace("PAYLOAD_TYPE", ptype, 1).rstrip("\n")
    assert rewrite_payload_query(gql, _SCHEMA, uids) == want


def test_graphql_auth_closed_by_default():
    """closedByDefault (auth_closed_by_default_*_test.yaml): with no
    JWT token every operation is denied up front — even on types
    without @auth — with the reference's exact message."""
    from dgraph_spark.graphql.auth_rewriter import (AuthRewriter,
                                                    JWTRequiredError,
                                                    parse_auth_rules)
    from dgraph_spark.graphql.sdl import parse_sdl

    schema = parse_sdl(_AUTH_SCHEMA_SRC)
    rules = parse_auth_rules(_AUTH_SCHEMA_SRC)
    with pytest.raises(JWTRequiredError,
                       match="a valid JWT is required but was not provided"):
        AuthRewriter(schema, rules, jwt=None, closed_by_default=True)
    # a present (even empty-claims) token proceeds to normal rewriting
    rw = AuthRewriter(schema, rules, jwt={}, closed_by_default=True)
    assert rw.rewrite("query { queryLog { logs } }") == \
        "query {\n  queryLog()\n}"
