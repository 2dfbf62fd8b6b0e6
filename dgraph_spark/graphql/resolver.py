"""Reference-faithful GraphQL resolution: rewrite with the byte-exact
rewriters (plain or @auth), execute the DQL through the engine, and
complete the result back to GraphQL field names — the shape of
graphql/resolve/resolver.go's completion step (DgraphAlias
`Type.field` keys become response keys, `dgraph.uid` internals drop,
`dgraph.type` drives __typename for abstract types).

Use this on graphs stored with the reference's dotted predicate naming
(GraphQL-loaded data); the lighter `execute_graphql` facade handles
bare-predicate graphs.
"""

from __future__ import annotations

from dgraph_spark.dql.parser import parse_dql
from dgraph_spark.graphql.auth_rewriter import (parse_auth_rules,
                                                rewrite_query_with_auth)
from dgraph_spark.graphql.ref_rewriter import rewrite_query
from dgraph_spark.graphql.sdl import parse_sdl
from dgraph_spark.model import Graph


def _complete(value, want_typename: bool):
    """resolver.go completion: rename `Type.field`/alias keys to the
    GraphQL response keys (the alias part after the final dot), drop
    internal `dgraph.uid`, surface `dgraph.type` as __typename."""
    if isinstance(value, list):
        return [_complete(v, want_typename) for v in value]
    if not isinstance(value, dict):
        return value
    out = {}
    for k, v in value.items():
        if k == "dgraph.uid":
            continue
        if k == "dgraph.type":
            if want_typename:
                types = v if isinstance(v, list) else [v]
                out["__typename"] = types[0] if types else None
            continue
        key = k.rsplit(".", 1)[-1] if "." in k else k
        out[key] = _complete(v, want_typename)
    return out


def execute_graphql_ref(graph: Graph, sdl_src: str, query: str,
                        jwt: dict | None = None,
                        closed_by_default: bool = False) -> dict:
    """GraphQL query -> reference-exact DQL -> engine -> completed
    GraphQL response dict. With ``jwt`` (or closed-by-default), the
    @auth rewriter injects the TypeRoot rule chains; without, the plain
    rewriter runs (auth-gated types yield empty blocks, matching the
    reference without a token)."""
    schema = parse_sdl(sdl_src)
    use_auth = jwt is not None or closed_by_default
    if use_auth:
        rules = parse_auth_rules(sdl_src)
        dql = rewrite_query_with_auth(query, schema, rules, jwt,
                                      closed_by_default=closed_by_default)
    else:
        dql = rewrite_query(query, schema)
    from dgraph_spark.plans import Executor

    raw = Executor(graph).execute(parse_dql(dql, allow_unused=True))
    want_typename = "__typename" in query
    return {"data": {k: _complete(v, want_typename)
                     for k, v in raw.items()}}


def _run_existence(graph: Graph, dgquery: str) -> dict:
    """Execute the existence-check queries and build the
    variable -> uid map the Rewrite phase consumes."""
    if not dgquery.strip():
        return {}
    from dgraph_spark.plans import Executor

    raw = Executor(graph).execute(parse_dql(dgquery, allow_unused=True))
    out = {}
    for var, rows in raw.items():
        if rows:
            out[var] = rows[0]["uid"]
    return out


def execute_graphql_add_ref(graph: Graph, sdl_src: str, mutation: str,
                            variables: dict | None = None):
    """Add mutation through the byte-exact rewrite pipeline
    (mutation_rewriter.go flow): existence queries run against the
    graph, the setjson upserts apply via the engine's JSON mutation
    path, and the mutated root uids return for payload queries.
    Returns (new_graph, root_uids)."""
    from dgraph_spark.graphql.mutation_rewriter import AddMutationRewriter
    from dgraph_spark.mutations import set_json

    schema = parse_sdl(sdl_src)
    vars_dollar = {("$" + k): v for k, v in (variables or {}).items()}
    rw = AddMutationRewriter(schema, vars_dollar)
    dgq, err = rw.rewrite_queries(mutation)
    if err:
        raise ValueError(err)
    idex = _run_existence(graph, dgq)
    muts, _qsec, err2 = rw.rewrite(idex)
    if err2:
        raise ValueError(err2)
    g = graph
    roots = []
    for m in muts:
        if m.get("cond"):
            # Conditional (upsert: true) branches would need @if
            # evaluation against the existence results; failing loudly
            # beats silently dropping the caller's writes.
            raise NotImplementedError(
                "conditional upsert mutation branches (@if) are not "
                "executed by execute_graphql_add; use the DQL upsert "
                "path (dgraph_spark.mutations.upsert_block)")
        payload = m.get("setjson")
        if payload is None:
            continue
        g = set_json(g, payload)
        uid = payload.get("uid", "")
        if isinstance(uid, str) and uid.startswith("_:"):
            roots.append(uid)
    return g, roots
