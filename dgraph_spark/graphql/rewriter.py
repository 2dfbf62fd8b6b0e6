"""GraphQL -> DQL rewriter (reference: graphql/resolve/query_rewriter.go
:105 Rewrite — get/query/aggregate -> []*dql.GraphQuery; filter
translation buildFilter :1964).

Supported surface (the generated-API core):
  - queryT(filter: {...}, first, offset, order: {asc|desc: field}) { fields }
  - getT(uid: "0x1") { fields }
  - aggregateT(filter: {...}) { count fMin fMax fSum fAvg }
  - nested field selections traverse uid predicates; filter ops:
    eq, in, le, lt, ge, gt, between, anyofterms, allofterms, anyoftext,
    alloftext, regexp; and / or / not combinators.

The rewrite emits DQL text and executes through the standard pipeline —
exactly the reference's architecture (GraphQL is a rewrite layer, not a
second engine).
"""

from __future__ import annotations

import re

from dgraph_spark.dql.parser import Token, tokenize
from dgraph_spark.model import Graph
from dgraph_spark.plans import Executor

_FILTER_OPS = {
    "eq", "in", "le", "lt", "ge", "gt", "between",
    "anyofterms", "allofterms", "anyoftext", "alloftext", "regexp",
}


class _P:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"GraphQL parse error: expected {text!r}, got {t.text!r}")
        return t

    def accept(self, text: str) -> bool:
        if self.peek().text == text:
            self.next()
            return True
        return False

    # ---------------------------------------------------------- structure
    def parse(self) -> list[dict]:
        if self.peek().text == "query":
            self.next()
            if self.peek().kind == "name":
                self.next()
        self.expect("{")
        ops = []
        while not self.accept("}"):
            ops.append(self.parse_operation())
        return ops

    def parse_operation(self) -> dict:
        name = self.next().text
        kind, typ = None, None
        for prefix in ("query", "get", "aggregate"):
            if name.startswith(prefix) and len(name) > len(prefix):
                kind, typ = prefix, name[len(prefix):]
                break
        if kind is None:
            raise SyntaxError(f"unsupported GraphQL field {name!r}")
        args = self.parse_args() if self.peek().text == "(" else {}
        fields = self.parse_selection()
        return {"kind": kind, "type": typ, "args": args, "fields": fields}

    def parse_args(self) -> dict:
        self.expect("(")
        out = {}
        while not self.accept(")"):
            self.accept(",")
            key = self.next().text
            self.expect(":")
            out[key] = self.parse_value()
        return out

    def parse_value(self):
        t = self.peek()
        if t.text == "{":
            self.next()
            obj = {}
            while not self.accept("}"):
                self.accept(",")
                k = self.next().text
                self.expect(":")
                obj[k] = self.parse_value()
            return obj
        if t.text == "[":
            self.next()
            arr = []
            while not self.accept("]"):
                self.accept(",")
                arr.append(self.parse_value())
            return arr
        self.next()
        if t.kind == "string":
            return t.text[1:-1]
        if t.kind == "number":
            return float(t.text) if "." in t.text else int(t.text)
        if t.text in ("true", "false"):
            return t.text == "true"
        if t.text == "null":
            return None
        return t.text

    def parse_selection(self) -> list[dict]:
        self.expect("{")
        out = []
        while not self.accept("}"):
            name = self.next().text
            args = self.parse_args() if self.peek().text == "(" else {}
            sub = self.parse_selection() if self.peek().text == "{" else None
            out.append({"name": name, "args": args, "fields": sub})
        return out


# ------------------------------------------------------------- rewriting
def _lit(v) -> str:
    if isinstance(v, str):
        return '"' + v.replace('"', '\\"') + '"'
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _filter_to_dql(f: dict) -> str:
    parts = []
    for key, val in f.items():
        if key == "and":
            sub = val if isinstance(val, list) else [val]
            parts.append("(" + " AND ".join(_filter_to_dql(s) for s in sub) + ")")
        elif key == "or":
            sub = val if isinstance(val, list) else [val]
            parts.append("(" + " OR ".join(_filter_to_dql(s) for s in sub) + ")")
        elif key == "not":
            parts.append("NOT (" + _filter_to_dql(val) + ")")
        else:
            # field: {op: value}
            for op, v in val.items():
                if op not in _FILTER_OPS:
                    raise ValueError(f"unsupported filter op {op!r}")
                if op == "between":
                    parts.append(f"between({key}, {_lit(v['min'])}, {_lit(v['max'])})")
                elif op == "in":
                    vals = ", ".join(_lit(x) for x in v)
                    parts.append(f"eq({key}, {vals})")
                else:
                    parts.append(f"{op}({key}, {_lit(v)})")
    return " AND ".join(parts)


def _selection_to_dql(fields: list[dict], indent: str) -> str:
    lines = []
    for f in fields:
        name = "uid" if f["name"] == "id" else f["name"]
        args = []
        if "first" in f["args"]:
            args.append(f"first: {f['args']['first']}")
        if "offset" in f["args"]:
            args.append(f"offset: {f['args']['offset']}")
        if "order" in f["args"]:
            o = f["args"]["order"]
            if "asc" in o:
                args.append(f"orderasc: {o['asc']}")
            if "desc" in o:
                args.append(f"orderdesc: {o['desc']}")
        arg_s = f" ({', '.join(args)})" if args else ""
        filt = ""
        if "filter" in f["args"]:
            filt = f" @filter({_filter_to_dql(f['args']['filter'])})"
        if f["fields"] is None:
            lines.append(f"{indent}{name}{arg_s}{filt}")
        else:
            lines.append(
                f"{indent}{name}{arg_s}{filt} {{\n"
                + _selection_to_dql(f["fields"], indent + "  ")
                + f"\n{indent}}}"
            )
    return "\n".join(lines)


_AGG_SUFFIX = {"Min": "min", "Max": "max", "Sum": "sum", "Avg": "avg"}


def graphql_to_dql(query: str) -> str:
    """Rewrite a GraphQL query document into one DQL query."""
    ops = _P(query).parse()
    blocks = []
    var_blocks = []
    for i, op in enumerate(ops):
        typ, args = op["type"], op["args"]
        alias = f"{op['kind']}{typ}"
        if op["kind"] == "get":
            uid = args.get("uid") or args.get("id")
            uid_val = int(uid, 0) if isinstance(uid, str) else int(uid)
            func = f"uid({uid_val})"
        else:
            func = f"type({typ})"
        filt = f" @filter({_filter_to_dql(args['filter'])})" if "filter" in args else ""
        params = [f"func: {func}"]
        if "first" in args:
            params.append(f"first: {args['first']}")
        if "offset" in args:
            params.append(f"offset: {args['offset']}")
        if "order" in args:
            o = args["order"]
            if "asc" in o:
                params.append(f"orderasc: {o['asc']}")
            if "desc" in o:
                params.append(f"orderdesc: {o['desc']}")

        if op["kind"] == "aggregate":
            # aggregate fields -> var block + agg-only block (+ a count
            # helper block merged by execute_graphql)
            var_alias = f"_v{i}"
            agg_attrs = []
            var_attrs = set()
            want_count = False
            for f in op["fields"]:
                name = f["name"]
                if name == "count":
                    want_count = True
                    continue
                for suffix, fn in _AGG_SUFFIX.items():
                    if name.endswith(suffix):
                        pred = name[: -len(suffix)]
                        var_attrs.add(pred)
                        agg_attrs.append(f"{name}: {fn}(val(_{pred}))")
                        break
            var_body = "\n    ".join(f"_{p} as {p}" for p in sorted(var_attrs)) or "uid"
            var_blocks.append(
                f"  {var_alias} as var(func: {func}){filt} {{\n    {var_body}\n  }}"
            )
            if agg_attrs:
                body = "\n    ".join(agg_attrs)
                blocks.append(f"  {alias}() {{\n    {body}\n  }}")
            if want_count:
                blocks.append(
                    f"  {alias}__count(func: uid({var_alias})) {{ count(uid) }}"
                )
            continue

        body = _selection_to_dql(op["fields"], "    ")
        blocks.append(f"  {alias}({', '.join(params)}){filt} {{\n{body}\n  }}")
    return "{\n" + "\n".join(var_blocks + blocks) + "\n}"


def execute_graphql(graph: Graph, query: str) -> dict:
    """Run a GraphQL query; returns {"data": {...}} like the reference's
    GraphQL endpoint (shape, not the full spec)."""
    dql = graphql_to_dql(query)
    result = Executor(graph).execute(dql)
    # DQL agg-only blocks emit one single-key node per aggregate; the
    # GraphQL response shape is ONE object with all aggregate fields
    agg_aliases = set()
    for m in re.finditer(r"(?:(\w+)\s*:\s*)?(aggregate\w+)\s*[({]", query):
        agg_aliases.add(m.group(1) or m.group(2))
    for k in agg_aliases & set(result):
        if isinstance(result[k], list) and all(
            isinstance(d, dict) and len(d) == 1 for d in result[k]
        ):
            result[k] = [{kk: vv for d in result[k] for kk, vv in d.items()}]
    # fold aggregate count helper blocks back into their aggregate result
    for key in [k for k in result if k.endswith("__count")]:
        target = key[: -len("__count")]
        n = result.pop(key)[0]["count"]
        if target in result and result[target]:
            result[target][0]["count"] = n
        else:
            result[target] = [{"count": n}]
    return {"data": result}
