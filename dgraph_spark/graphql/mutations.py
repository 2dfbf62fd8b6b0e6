"""GraphQL mutation façade: addT / updateT / deleteT rewritten onto the
engine's batch mutation surface (reference:
graphql/resolve/mutation_rewriter.go:1 — RewriteQueries/Rewrite build
upsert-style DQL; deletes expand to per-predicate wildcard deletions).

Architecture mirrors the reference: GraphQL mutations are a REWRITE
layer. `addT` builds blank-node N-Quads (uid assignment via the RDF
loader's hash path), `updateT` resolves the filter to a uid relation and
expands set/remove templates RELATIONALLY (mutations.expand_template —
no driver-side uid materialization), `deleteT` wildcard-deletes every
type predicate of the matched nodes.

The Graph is immutable: each mutation returns (payload, new_graph).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dgraph_spark.graphql.rewriter import _P, _filter_to_dql, _selection_to_dql
from dgraph_spark.model import SUBJECT, TYPE_PRED, Graph
from dgraph_spark.mutations import delete_triples, expand_template, set_triples
from dgraph_spark.plans import Executor




def _parse_mutation(src: str) -> list[dict]:
    p = _P(src)
    if p.peek().text == "mutation":
        p.next()
        if p.peek().kind == "name":
            p.next()
    p.expect("{")
    ops = []
    while not p.accept("}"):
        name = p.next().text
        kind = None
        for prefix in ("add", "update", "delete"):
            if name.startswith(prefix) and len(name) > len(prefix):
                kind, typ = prefix, name[len(prefix):]
                break
        if kind is None:
            raise SyntaxError(f"unsupported GraphQL mutation {name!r}")
        args = p.parse_args() if p.peek().text == "(" else {}
        fields = p.parse_selection() if p.peek().text == "{" else []
        ops.append({"kind": kind, "type": typ, "args": args, "fields": fields})
    return ops


def _nq_value(v) -> str:
    if isinstance(v, bool):
        return f'"{str(v).lower()}"^^<bool>'
    if isinstance(v, int):
        return f'"{v}"^^<int>'
    if isinstance(v, float):
        return f'"{v}"^^<float>'
    s = str(v).replace("\\", "\\\\").replace('"', '\\"')
    return f'"{s}"'


def _obj_nquads(subj: str, typ: str | None, obj: dict) -> list[str]:
    lines = []
    if typ:
        lines.append(f'{subj} <{TYPE_PRED}> "{typ}" .')
    for field, val in obj.items():
        if field in ("id", "uid"):
            continue
        if isinstance(val, dict):
            # reference to an existing node: {id: "0x.."}
            ref = val.get("id") or val.get("uid")
            if ref is None:
                raise ValueError(f"nested object for {field!r} must be a "
                                 "{{id: ...}} reference")
            lines.append(f"{subj} <{field}> <{int(str(ref), 0)}> .")
        elif isinstance(val, list):
            for x in val:
                lines.append(f"{subj} <{field}> {_nq_value(x)} ."
                             if not isinstance(x, dict)
                             else f"{subj} <{field}> <{int(str(x.get('id') or x.get('uid')), 0)}> .")
        else:
            lines.append(f"{subj} <{field}> {_nq_value(val)} .")
    return lines


def _matched_uids(graph: Graph, typ: str, filt: dict | None):
    """uid relation (column `subject`) of type T matching the filter —
    the RewriteQueries step (mutation_rewriter.go:327)."""
    dql_filter = f" @filter({_filter_to_dql(filt)})" if filt else ""
    q = f"{{ v as var(func: type({typ})){dql_filter} }}"
    ex = Executor(graph)
    from dgraph_spark.dql.parser import parse_dql

    pq = parse_dql(q, allow_unused=True)
    for block in ex._schedule(pq.blocks):
        ex._run_block(block)
    vdf = ex.env.get("v")
    if vdf is None:
        return graph.spark.createDataFrame([], f"{SUBJECT} long")
    return vdf.select(SUBJECT).distinct()


def execute_graphql_mutation(graph: Graph, mutation: str) -> tuple[dict, Graph]:
    """Run a GraphQL mutation document; returns ({"data": ...}, new_graph)."""
    data: dict = {}
    g = graph
    for op in _parse_mutation(mutation):
        typ, args, kind = op["type"], op["args"], op["kind"]
        key = f"{kind}{typ}"
        if kind == "add":
            inputs = args.get("input") or []
            if isinstance(inputs, dict):
                inputs = [inputs]
            lines: list[str] = []
            for i, obj in enumerate(inputs):
                lines.extend(_obj_nquads(f"_:n{i}", typ, obj))
            triples = _triples(g, "\n".join(lines))
            new_uids = [r[SUBJECT] for r in
                        triples.select(SUBJECT).distinct().collect()]
            g = set_triples(g, triples)
            payload = {"numUids": len(new_uids)}
            payload.update(_reselect(g, op, new_uids))
            data[key] = payload
        elif kind == "update":
            inp = args.get("input") or {}
            filt = inp.get("filter") or args.get("filter")
            uids = _matched_uids(g, typ, filt)
            n = uids.count()
            if n:
                env = {"v": uids}
                set_obj = inp.get("set") or {}
                rm_obj = inp.get("remove") or {}
                if set_obj:
                    nq = "\n".join(_obj_nquads("uid(v)", None, set_obj))
                    g = set_triples(g, expand_template(g, nq, env))
                if rm_obj:
                    rm_lines = []
                    for field, val in rm_obj.items():
                        rm_lines.append(
                            f"uid(v) <{field}> * ." if val is None
                            else f"uid(v) <{field}> {_nq_value(val)} .")
                    g = delete_triples(g, expand_template(g, "\n".join(rm_lines), env))
            data[key] = {"numUids": n}
        else:  # delete
            filt = args.get("filter")
            uids = _matched_uids(g, typ, filt)
            n = uids.count()
            if n:
                env = {"v": uids}
                preds = [p for p in g.preds if g.has_pred(p)]
                nq = "\n".join(f"uid(v) <{p}> * ." for p in preds)
                g = delete_triples(g, expand_template(g, nq, env))
            data[key] = {"msg": "Deleted", "numUids": n}
    return {"data": data}, g


def _triples(graph: Graph, nquads: str):
    from dgraph_spark.mutations import _triples_from_nquads

    return _triples_from_nquads(graph, nquads)


def _reselect(g: Graph, op: dict, uids: list) -> dict:
    """Optional selection of the mutated nodes (the lowercase type field
    in the mutation payload, e.g. addPerson { person { name } })."""
    out: dict = {}
    want = [f for f in op["fields"]
            if f["fields"] is not None and f["name"].lower() == op["type"].lower()]
    if not want or not uids:
        return out
    body = _selection_to_dql(want[0]["fields"], "    ")
    uid_list = ", ".join(str(u) for u in uids)
    r = Executor(g).execute(f"{{ q(func: uid({uid_list})) {{\n{body}\n  }} }}")
    out[want[0]["name"]] = r.get("q", [])
    return out
