"""GraphQL -> DQL query rewriting with the reference's exact output
(graphql/resolve/query_rewriter.go — Rewrite, addArgumentsToField,
buildFilter; text form pinned by graphql/resolve/query_test.yaml).

The rewrite consumes a parsed SDL schema (sdl.py) and emits the same
DQL text the reference emits: `Type.alias : Type.pred` selection lines,
`dgraph.uid : uid` tails, root-function promotion of eq/in/id filters,
alphabetical AND ordering, Go-style float rendering, aggregate
var-block splitting, password double blocks, cascades, fragments over
interfaces and unions.
"""

from __future__ import annotations

import json as _json
import math
import re

from dgraph_spark.graphql.sdl import GQLSchema

# ------------------------------------------------------------------ lexer
_TOK = re.compile(
    r'"(?:[^"\\]|\\.)*"'
    r"|#[^\n]*"
    r"|\.\.\."
    r"|[A-Za-z_$][A-Za-z0-9_]*"
    r"|-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+"
    r"|[{}()\[\]:,@!=|&]"
    r"|\S")


def _tokens(src: str) -> list[str]:
    return [t for t in _TOK.findall(src)
            if not t.startswith("#") and t != ","]


class _P:
    def __init__(self, src: str):
        self.t = _tokens(src)
        self.i = 0

    def peek(self, k=0):
        return self.t[self.i + k] if self.i + k < len(self.t) else ""

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, x):
        t = self.next()
        if t != x:
            raise SyntaxError(f"GraphQL parse: expected {x!r} got {t!r}")

    def accept(self, x):
        if self.peek() == x:
            self.i += 1
            return True
        return False


def _parse_value(p: _P):
    t = p.peek()
    if t == "{":
        p.next()
        out = {}
        while not p.accept("}"):
            k = p.next()
            p.expect(":")
            out[k] = _parse_value(p)
        return out
    if t == "[":
        p.next()
        arr = []
        while not p.accept("]"):
            arr.append(_parse_value(p))
        return arr
    p.next()
    if t.startswith('"'):
        return _json.loads(t)
    if re.match(r"^-?\d", t):
        return float(t) if ("." in t or "e" in t or "E" in t) else int(t)
    if t == "true":
        return True
    if t == "false":
        return False
    if t == "null":
        return None
    return ("$var", t[1:]) if t.startswith("$") else ("enum", t)


def _parse_args(p: _P) -> dict:
    out = {}
    p.expect("(")
    while not p.accept(")"):
        k = p.next()
        p.expect(":")
        out[k] = _parse_value(p)
    return out


def _parse_directives(p: _P) -> list[dict]:
    out = []
    while p.peek() == "@":
        p.next()
        name = p.next()
        args = _parse_args(p) if p.peek() == "(" else {}
        out.append({"name": name, "args": args})
    return out


def _parse_selection(p: _P) -> list[dict]:
    p.expect("{")
    out = []
    while not p.accept("}"):
        if p.accept("..."):
            if p.peek() == "on":
                p.next()
                typ = p.next()
                _parse_directives(p)
                out.append({"frag_on": typ, "fields": _parse_selection(p)})
            else:
                out.append({"frag_ref": p.next()})
            continue
        name = p.next()
        alias = None
        if p.accept(":"):
            alias = name
            name = p.next()
        args = _parse_args(p) if p.peek() == "(" else {}
        dirs = _parse_directives(p)
        sub = _parse_selection(p) if p.peek() == "{" else None
        out.append({"name": name, "alias": alias, "args": args,
                    "dirs": dirs, "fields": sub})
    return out


def _parse_query(src: str) -> dict:
    p = _P(src)
    if p.peek() == "query":
        p.next()
        if p.peek() not in ("{", "("):
            p.next()  # operation name
        if p.peek() == "(":  # variable declarations
            depth = 0
            while True:
                t = p.next()
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
                    if depth == 0:
                        break
    dirs = _parse_directives(p)
    ops = _parse_selection(p)
    # named fragments may follow
    frags = {}
    while p.peek() == "fragment":
        p.next()
        fname = p.next()
        p.expect("on")
        on = p.next()
        frags[fname] = {"on": on, "fields": _parse_selection(p)}
    return {"ops": ops, "frags": frags, "dirs": dirs}


# ------------------------------------------------------------ value render
def _go_float(x: float) -> str:
    """strconv.FormatFloat(x, 'g', -1, 64) — scientific when the decimal
    exponent is < -4 or > 6 (shortest-mode eprec)."""
    if x == int(x) and abs(x) < 1e15:
        digits = repr(int(x))
        exp = len(digits.lstrip("-"))
    else:
        s = repr(x)
        if "e" in s:
            m, e = s.split("e")
            exp = int(e) + 1
            digits = m.replace(".", "").replace("-", "").rstrip("0")
        else:
            neg = s.startswith("-")
            ip, _, fp = s.lstrip("-").partition(".")
            if ip != "0":
                exp = len(ip)
                digits = (ip + fp).rstrip("0")
            else:
                lead = len(fp) - len(fp.lstrip("0"))
                exp = -lead
                digits = fp.lstrip("0").rstrip("0")
            digits = ("-" if neg else "") + digits
    if exp < -3 or exp > 7:
        # scientific: d.ddd e+XX
        neg = digits.startswith("-")
        d = digits.lstrip("-")
        mant = d[0] + ("." + d[1:] if len(d) > 1 else "")
        e = exp - 1
        return f"{'-' if neg else ''}{mant}e{'+' if e >= 0 else '-'}{abs(e):02d}"
    return repr(x) if x != int(x) else (repr(int(x)) if abs(x) < 1e15 else repr(x))


def _render_scalar(v) -> str:
    """Filter argument rendering: everything string-quoted except bools;
    floats in Go shortest form."""
    if isinstance(v, tuple) and v and v[0] == "enum":
        return f'"{v[1]}"'
    if isinstance(v, bool):
        return '"true"' if v else '"false"'
    if isinstance(v, float):
        return f'"{_go_float(v)}"'
    if isinstance(v, int):
        return str(v)  # ints render unquoted (query_test.yaml int cases)
    return _json.dumps(v, ensure_ascii=False)


def _geo_coords(v) -> str:
    """[[[lng,lat],...],...] rendered dense (no spaces)."""
    def render(x):
        if isinstance(x, list):
            return "[" + ",".join(render(e) for e in x) + "]"
        return _num_str(x)
    return render(v)


def _num_str(x) -> str:
    if isinstance(x, float) and x == int(x):
        return repr(x)  # 20.0 stays 20.0? pinned by harness
    return repr(x)


def _poly_to_list(poly: dict) -> list:
    """{coordinates: [{points: [{latitude, longitude}...]}...]} ->
    [[[lng,lat],...],...]"""
    out = []
    for ring in poly["coordinates"]:
        out.append([[p["longitude"], p["latitude"]] for p in ring["points"]])
    return out


# ------------------------------------------------------------ filter AST
class _F:
    """Filter term tree with the reference's exact parenthesization."""

    def __init__(self, kind: str, text: str = "", kids=None, sep=" AND "):
        self.kind = kind      # leaf | and | or | not
        self.text = text
        self.kids = kids or []
        self.sep = sep

    def render(self) -> str:
        if self.kind == "leaf":
            return self.text
        if self.kind == "not":
            return f"NOT ({self.kids[0].render()})"
        parts = [k.render() for k in self.kids]
        return "(" + self.sep.join(parts) + ")"


class Rewriter:
    def __init__(self, schema: GQLSchema, variables: dict | None = None):
        self.s = schema
        self._union_dropped = False
        self.vars = variables or {}
        self.var_decl_extra = ""  # e.g. checkPwd($pwd0: string)
        self._pwd_blocks: list[str] = []
        self._agg_var_blocks: list[str] = []
        self._frags: dict = {}

    # ---------------------------------------------------------- filters
    def _resolve(self, v):
        if isinstance(v, tuple) and v and v[0] == "$var":
            if "$" + v[1] in self.vars:
                return self.vars["$" + v[1]]
            return self.vars.get(v[1])
        return v

    def _field_cond(self, typ: str, fname: str, cond, out: list[_F]) -> None:
        pred = self.s.pred_name(typ, fname)
        f = self.s.field(typ, fname)
        ftyp = f.typ if f else "String"
        if not isinstance(cond, dict):
            # boolean shorthand {isPublished: true} -> eq with bare value
            cond = self._resolve(cond)
            if isinstance(cond, bool):
                out.append(_F("leaf", f"eq({pred}, {str(cond).lower()})"))
            elif cond is not None:
                out.append(_F("leaf", f"eq({pred}, {_render_scalar(cond)})"))
            return
        for op, raw in cond.items():
            val = self._resolve(raw)
            if op == "eq" and val is None:
                out.append(_F("not", kids=[_F("leaf", f"has({pred})")]))
                continue
            if val is None and op != "between":
                continue  # non-eq null comparisons are dropped
            if op == "in":
                vlist = val if isinstance(val, list) else [val]
                vals = ", ".join(_render_scalar(self._resolve(x))
                                 for x in vlist)
                out.append(_F("leaf", f"eq({pred}, {vals})"))
            elif op in ("eq", "le", "lt", "ge", "gt", "allofterms",
                        "anyofterms", "alloftext", "anyoftext"):
                if op == "eq" and isinstance(val, list):
                    vals = ", ".join(_render_scalar(self._resolve(x))
                                     for x in val)
                    out.append(_F("leaf", f"eq({pred}, {vals})"))
                else:
                    out.append(_F("leaf", f"{op}({pred}, {_render_scalar(val)})"))
            elif op == "regexp":
                out.append(_F("leaf", f"regexp({pred}, {val})"))
            elif op == "between":
                lo = self._btw_val(ftyp, val.get("min"))
                hi = self._btw_val(ftyp, val.get("max"))
                out.append(_F("leaf", f"between({pred}, {lo}, {hi})"))
            elif op == "near":
                c = val["coordinate"]
                pt = _geo_coords([c["longitude"], c["latitude"]])
                out.append(_F("leaf",
                              f"near({pred}, {pt}, {_num_str(val['distance'])})"))
            elif op == "within":
                out.append(_F("leaf",
                              f"within({pred}, {_geo_coords(_poly_to_list(val['polygon']))})"))
            elif op == "contains":
                if "point" in val:
                    c = val["point"]
                    g = _geo_coords([c["longitude"], c["latitude"]])
                else:
                    g = _geo_coords(_poly_to_list(val["polygon"]))
                out.append(_F("leaf", f"contains({pred}, {g})"))
            elif op == "intersects":
                if "polygon" in val:
                    g = _geo_coords(_poly_to_list(val["polygon"]))
                else:
                    g = _geo_coords([_poly_to_list(p) for p in
                                     val["multiPolygon"]["polygons"]])
                out.append(_F("leaf", f"intersects({pred}, {g})"))

    def _btw_val(self, ftyp: str, v) -> str:
        v = self._resolve(v)
        if ftyp in ("Int", "Int64") and isinstance(v, (int, float)):
            return repr(int(v))
        return _render_scalar(v)

    def _filter_obj(self, typ: str, obj: dict) -> _F | None:
        """One GraphQL filter object -> filter tree (ids excluded —
        handled by the caller for root-func promotion)."""
        terms: list[_F] = []
        # and-children come FIRST (query_test.yaml cases 35/39/40/68):
        # an object child keeps its own parens, an and-ARRAY flattens
        if obj.get("and") is not None:
            av = obj["and"]
            av = av if isinstance(av, list) else [av]
            for a in av:
                if a is None:
                    continue
                sub = self._filter_obj(typ, a)
                if sub is not None:
                    terms.append(sub)
        def _is_idf(k: str) -> bool:
            f = self.s.field(typ, k)
            return f is not None and f.is_id
        if obj.get("not") is not None:
            sub = self._filter_obj(typ, obj["not"])
            if sub is not None:
                terms.append(_F("not", kids=[sub]))
        for fname in sorted(k for k in obj
                            if k not in ("and", "or", "not", "has")
                            and not _is_idf(k)):
            self._field_cond(typ, fname, obj[fname], terms)
        idf = next((k for k in obj if _is_idf(k)), None)
        if idf is not None:
            ids = self._id_list(obj[idf])
            if ids:
                terms.append(_F("leaf", f"uid({', '.join(ids)})"))
        if obj.get("has") is not None:
            hv = obj["has"]
            hv = hv if isinstance(hv, list) else [hv]
            for h in hv:
                h = h[1] if isinstance(h, tuple) else h
                terms.append(_F("leaf", f"has({self.s.pred_name(typ, h)})"))
        base = None
        if len(terms) == 1:
            base = terms[0]
        elif terms:
            base = _F("and", kids=terms)
        if obj.get("or") is not None:
            ov = obj["or"]
            if isinstance(ov, list):
                # or-array: one wrapped group, items joined by OR
                subs = [self._filter_obj(typ, o) for o in ov if o is not None]
                subs = [s_ for s_ in subs if s_ is not None]
                if subs:
                    inner = " OR ".join(s_.render() for s_ in subs)
                    group = _F("leaf", f"({inner})") if base is not None \
                        else _F("leaf", inner if len(subs) == 1 else f"({inner})")
                    if base is not None:
                        base = _F("or", kids=[base, group], sep=" OR ")
                    else:
                        base = group
            else:
                sub = self._filter_obj(typ, ov)
                if sub is not None:
                    wrapped = _F("leaf", f"({sub.render()})")
                    if base is not None:
                        base = _F("or", kids=[base, wrapped], sep=" OR ")
                    else:
                        base = wrapped
        return base

    def _id_list(self, ids) -> list[str]:
        ids = self._resolve(ids)
        if not isinstance(ids, list):
            ids = [ids]
        out = []
        for x in ids:
            x = self._resolve(x)
            try:
                out.append(f"0x{int(str(x), 0):x}")
            except (ValueError, TypeError):
                continue
        return out

    # ------------------------------------------------------- selections
    def _order_args(self, typ: str, order) -> list[str]:
        out = []
        while isinstance(order, dict):
            if "asc" in order:
                v = order["asc"]
                v = v[1] if isinstance(v, tuple) else v
                out.append(f"orderasc: {self.s.pred_name(typ, v)}")
            if "desc" in order:
                v = order["desc"]
                v = v[1] if isinstance(v, tuple) else v
                out.append(f"orderdesc: {self.s.pred_name(typ, v)}")
            order = order.get("then")
        return out

    def _dir_map(self, dirs) -> dict:
        return {d["name"]: d["args"] for d in (dirs or [])}

    def _skip(self, dirs) -> bool:
        dm = self._dir_map(dirs)
        if "skip" in dm and bool(self._resolve(dm["skip"].get("if"))):
            return True
        if "include" in dm and not bool(self._resolve(dm["include"].get("if"))):
            return True
        return False

    def _cascade_arg(self, typ: str, dirs) -> str | None:
        dm = self._dir_map(dirs)
        if "cascade" not in dm:
            return None
        fields = self._resolve(dm["cascade"].get("fields"))
        if not fields:
            return "@cascade"
        preds = []
        for f in fields:
            f = self._resolve(f)
            f = f[1] if isinstance(f, tuple) else f
            p = ("uid" if (self.s.field(typ, f) or type("x", (), {"is_id": False})).is_id
                 else self.s.pred_name(typ, f))
            preds.append(p)
        return "@cascade(" + ", ".join(preds) + ")"

    def _sel_lines(self, typ: str, fields: list[dict], indent: str,
                   path: str = "") -> tuple[list[str], bool]:
        """Render a selection set; returns (lines, saw_uid)."""
        lines: list[str] = []
        saw_uid = False
        seen_aliases: set[str] = set()
        required: list[str] = []  # @custom requiredFields, in order
        requested: set[str] = set()
        t_self = self.s.types.get(typ)
        if t_self is not None and t_self.kind == "interface":
            lines.append(f"{indent}dgraph.type")
        for fld in fields:
            if "frag_on" in fld or "frag_ref" in fld:
                sub, su = self._frag_lines(typ, fld, indent, path)
                lines.extend(sub)
                saw_uid = saw_uid or su
                continue
            if self._skip(fld.get("dirs")):
                continue
            name = fld["name"]
            alias = fld["alias"] or name
            if alias in seen_aliases:
                continue  # duplicate alias: first occurrence wins
            seen_aliases.add(alias)
            if name == "__typename":
                continue  # dgraph.type already rides on interface/union sets
            f = self.s.field(typ, name)
            if f is None and name.endswith("Aggregate"):
                lines.extend(self._child_aggregate(typ, fld, indent, path))
                continue
            if f is None:
                continue
            if f.custom or f.lambda_:
                # @custom fields resolve externally; their $-referenced
                # sibling fields are added at the end
                for r in f.custom_requires:
                    if r not in required:
                        required.append(r)
                continue
            requested.add(name)
            if f.is_id:
                lines.append(f"{indent}{typ}.{alias} : uid")
                saw_uid = True
                continue
            pred = self.s.pred_name(typ, name)
            if fld["fields"] is None or not self.s.is_object(f.typ):
                lines.append(f"{indent}{typ}.{alias} : {pred}")
                continue
            # object-valued: nested block
            child_t = f.typ
            ct = self.s.types.get(child_t)
            args = fld.get("args", {})
            suffix = ""
            filt = args.get("filter")
            if ct is not None and ct.kind == "union":
                tree = self._union_member_filter(ct, filt
                                                 if isinstance(filt, dict)
                                                 else None)
                if isinstance(filt, dict) and filt.get("memberTypes") == []:
                    self._union_dropped = True
                    continue  # empty memberTypes: field dropped entirely
            else:
                tree = self._filter_obj(child_t, filt) \
                    if isinstance(filt, dict) else None
            if pred.startswith("~"):
                # reverse @dgraph predicates can reach mixed types — pin
                # the child type (query_rewriter.go addTypeFilter)
                tl = _F("leaf", f"type({child_t})")
                tree = _F("and", kids=[tree, tl]) if tree is not None else tl
            if tree is not None:
                suffix += f" @filter({tree.render()})"
            extras = []
            if "order" in args:
                extras += self._order_args(child_t, args["order"])
            for k in ("first", "offset"):
                if k in args:
                    extras.append(f"{k}: {self._resolve(args[k])}")
            if extras:
                suffix += " (" + ", ".join(extras) + ")"
            casc = self._cascade_arg(child_t, fld.get("dirs"))
            if casc:
                suffix += f" {casc}"
            if ct is not None and ct.kind == "union":
                sub, su = self._union_lines(ct, fld, indent + "  ")
                if not su:
                    sub.append(f"{indent}  dgraph.uid : uid")
            else:
                sub, su = self._sel_lines(child_t, fld["fields"],
                                          indent + "  ",
                                          f"{typ}.{alias}")
                if not su:
                    sub.append(f"{indent}  dgraph.uid : uid")
            lines.append(f"{indent}{typ}.{alias} : {pred}{suffix} {{")
            lines.extend(sub)
            lines.append(f"{indent}}}")
        for r in sorted(required):
            if r in requested:
                continue
            rf = self.s.field(typ, r)
            if rf is None:
                continue
            if rf.is_id:
                lines.append(f"{indent}{typ}.{r} : uid")
                saw_uid = True
            else:
                lines.append(f"{indent}{typ}.{r} : {self.s.pred_name(typ, r)}")
        return lines, saw_uid

    def _frag_lines(self, typ: str, fld: dict, indent: str,
                    path: str) -> tuple[list[str], bool]:
        if "frag_ref" in fld:
            fr = self._frags.get(fld["frag_ref"])
            if fr is None:
                return [], False
            fld = {"frag_on": fr["on"], "fields": fr["fields"]}
        on = fld["frag_on"]
        # fragment on the same type or (under a CONCRETE type) one of its
        # interfaces renders in the current context; any other related
        # fragment renders in the fragment's own type context
        t = self.s.types.get(typ)
        if on == typ or (t is not None and t.kind == "type"
                         and on in t.interfaces):
            return self._sel_lines(typ, fld["fields"], indent, path)
        ot = self.s.types.get(on)
        if ot is not None:
            ls, su = self._sel_lines(on, fld["fields"], indent, path)
            ls = [l for l in ls if l != f"{indent}dgraph.type"]
            return ls, su
        return [], False

    def _union_member_filter(self, ut, filt: dict | None) -> _F | None:
        """memberTypes + per-type <t>Filter -> ORed type() terms
        (resolve/query_rewriter.go buildUnionFilter)."""
        if not isinstance(filt, dict):
            return None
        members = list(ut.members)
        per_type: dict[str, dict] = {}
        if isinstance(filt, dict):
            if "memberTypes" in filt:
                members = [m[1] if isinstance(m, tuple) else m
                           for m in filt["memberTypes"]]
            for k, v in filt.items():
                if k.endswith("Filter") and isinstance(v, dict):
                    tn = k[:-len("Filter")]
                    per_type[tn[0].upper() + tn[1:]] = v
        if not members:
            return None  # empty memberTypes: the field is dropped
        terms = []
        for m in members:
            tl = _F("leaf", f"type({m})")
            sub = self._filter_obj(m, per_type[m]) if m in per_type else None
            terms.append(_F("and", kids=[tl, sub]) if sub is not None else tl)
        if len(terms) == 1:
            return _F("leaf", f"({terms[0].render()})")
        return _F("or", kids=terms, sep=" OR ")

    def _union_lines(self, ut, fld, indent):
        lines = [f"{indent}dgraph.type"]
        saw_uid = False
        for sub in fld["fields"] or []:
            if "frag_on" not in sub and "frag_ref" not in sub:
                continue
            if "frag_ref" in sub:
                fr = self._frags.get(sub["frag_ref"])
                if fr is None:
                    continue
                sub = {"frag_on": fr["on"], "fields": fr["fields"]}
            on = sub["frag_on"]
            ot = self.s.types.get(on)
            if ot is None:
                continue
            ls, su = self._sel_lines(on, sub["fields"], indent)
            # drop nested auto dgraph.type from interface contexts
            ls = [l for l in ls if l != f"{indent}dgraph.type"]
            lines.extend(ls)
            saw_uid = saw_uid or su
        return lines, saw_uid

    def _child_aggregate(self, typ: str, fld: dict, indent: str,
                         path: str) -> list[str]:
        """statesAggregate { count nameMin ... } — counts fold to
        count(pred) lines; value aggs add a var child block."""
        base = fld["name"][:-len("Aggregate")]
        f = self.s.field(typ, base)
        if f is None:
            return []
        child_t = f.typ
        pred = self.s.pred_name(typ, base)
        alias = fld["alias"] or fld["name"]
        args = fld.get("args", {})
        fsuffix = ""
        filt = args.get("filter")
        tree = self._filter_obj(child_t, filt) \
            if isinstance(filt, dict) else None
        if pred.startswith("~"):
            tl = _F("leaf", f"type({child_t})")
            tree = _F("and", kids=[tree, tl]) if tree is not None else tl
        if tree is not None:
            fsuffix = f" @filter({tree.render()})"
        lines: list[str] = []
        # which value vars are needed?
        want_vars: list[str] = []
        agg_lines: list[tuple[str, str]] = []
        for sub in fld["fields"] or []:
            sname = sub["name"]
            salias = sub["alias"] or sname
            if sname == "count":
                agg_lines.append((salias, f"count({pred}){fsuffix}"))
                continue
            m = re.match(r"(.+?)(Min|Max|Sum|Avg)$", sname)
            if not m:
                continue
            fbase, agg = m.groups()
            var = f"{typ}.{alias}_{fbase}Var"
            if fbase not in want_vars:
                want_vars.append(fbase)
            agg_lines.append(
                (salias, f"{agg.lower()}(val({var}))"))
        if want_vars:
            lines.append(f"{indent}{typ}.{alias} : {pred}{fsuffix} {{")
            for fbase in want_vars:
                lines.append(
                    f"{indent}  {typ}.{alias}_{fbase}Var as "
                    f"{self.s.pred_name(child_t, fbase)}")
            lines.append(f"{indent}  dgraph.uid : uid")
            lines.append(f"{indent}}}")
        for salias, expr in agg_lines:
            lines.append(
                f"{indent}{child_t}AggregateResult.{salias}_{typ}.{alias} "
                f": {expr}")
        return lines

    # ------------------------------------------------------------- roots
    def rewrite(self, gql: str) -> str:
        doc = _parse_query(gql)
        self._frags = doc["frags"]
        blocks: list[str] = []
        for op in doc["ops"]:
            blocks.extend(self._rewrite_op(op))
        blocks.extend(self._pwd_blocks)
        header = "query" + self.var_decl_extra
        body = "\n".join(blocks)
        return f"{header} {{\n{body}\n}}"

    def _rewrite_op(self, op: dict) -> list[str]:
        name = op["name"]
        for prefix in ("queryAggregate",):
            pass
        if name == "_entities":
            return self._entities(op)
        vm = re.match(r"querySimilar(.+)By(Embedding|Id)$", name)
        if vm and vm.group(1) in self.s.types:
            return self._vector_query(op, vm.group(1), vm.group(2))
        m = re.match(r"(get|query|aggregate|check)(.+)", name)
        kind, rest = (m.groups() if m else (None, None))
        if kind == "check" and rest.endswith("Password"):
            return self._password(op, rest[:-len("Password")])
        if kind == "aggregate":
            return self._aggregate(op, rest)
        typ = rest
        # @auth rules the rewriter can't satisfy yield an EMPTY block
        # (resolver returns nothing without the auth variables)
        t = self.s.types.get(typ)
        if t is not None and (t.has_auth or (
                t.kind == "interface"
                and any(self.s.get(i).has_auth
                        for i in self.s.implementers(typ)))):
            return [f"  {name}()"]
        args = op.get("args", {})
        func, filt_tree = self._root_func(kind, typ, args)
        suffix = ""
        if filt_tree is not None:
            suffix += f" @filter({filt_tree.render()})"
        casc = self._cascade_arg(typ, op.get("dirs"))
        if casc:
            suffix += f" {casc}"
        self._union_dropped = False
        lines, saw_uid = self._sel_lines(typ, op["fields"] or [], "    ",
                                         f"{typ}")
        if not lines and not saw_uid and self._union_dropped:
            # every requested field vanished (empty union memberTypes):
            # the block renders bare, without braces
            return [f"  {name}({func})"]
        if not saw_uid:
            lines.append("    dgraph.uid : uid")
        out = [f"  {name}({func}){suffix} {{"]
        out.extend(lines)
        out.append("  }")
        return out

    def _root_func(self, kind: str, typ: str, args: dict):
        """(func text, residual filter tree or None)."""
        order_extra = []
        if "order" in args:
            order_extra = self._order_args(typ, args["order"])
        pag = []
        for k in ("first", "offset"):
            if k in args:
                pag.append(f"{k}: {self._resolve(args[k])}")
        type_leaf = _F("leaf", f"type({typ})")

        def with_extras(func: str) -> str:
            parts = [func] + order_extra + pag
            return ", ".join(parts)

        if kind == "get":
            # getT(id: ..) / getT(xidField: ..) / both
            idf = next((fn for fn, f in self.s.get(typ).fields.items()
                        if f.is_id), None)
            xids = [(fn, f) for fn, f in self.s.get(typ).fields.items()
                    if f.has_id_directive and fn in args]
            xids.sort(key=lambda kv: kv[0])

            def xid_group(pairs) -> _F:
                inner = " AND ".join(
                    f"eq({self.s.pred_name(typ, fn)}, "
                    f"{_render_scalar(self._resolve(args[fn]))})"
                    for fn, _ in pairs)
                return _F("leaf", f"({inner})")
            if idf is not None and idf in args:
                uid = self._id_list(args[idf])
                func = f"func: uid({', '.join(uid) or '0x0'})"
                if xids:
                    extra = _F("and", kids=[xid_group(xids), type_leaf])
                    return with_extras(func), extra
                return with_extras(func), type_leaf
            if xids:
                fn, f = xids[0]
                func = (f"func: eq({self.s.pred_name(typ, fn)}, "
                        f"{_render_scalar(self._resolve(args[fn]))})")
                if xids[1:]:
                    tree = _F("and", kids=[xid_group(xids[1:]), type_leaf])
                else:
                    tree = type_leaf
                return with_extras(func), tree
            return with_extras("func: uid(0x0)"), type_leaf

        filt = args.get("filter")
        if isinstance(filt, dict):
            filt = {k: v for k, v in filt.items()
                    if not (k in ("and", "or", "not") and v is None)}
        idf_name = next((fn for fn, f in self.s.get(typ).fields.items()
                         if f.is_id), None)
        if isinstance(filt, dict) and idf_name in filt:
            ids = self._id_list(filt[idf_name])
            rest = {k: v for k, v in filt.items() if k != idf_name}
            tree = self._filter_obj(typ, rest) if rest else None
            func = f"func: uid({', '.join(ids)})"
            full = _F("and", kids=[tree, type_leaf]) if tree else type_leaf
            return with_extras(func), full
        if isinstance(filt, dict):
            promoted, rest = self._promote(typ, filt)
            if promoted:
                tree = self._filter_obj(typ, rest) if rest else None
                full = _F("and", kids=[tree, type_leaf]) if tree else type_leaf
                return with_extras(f"func: {promoted}"), full
            tree = self._filter_obj(typ, filt)
            return with_extras(f"func: type({typ})"), tree
        return with_extras(f"func: type({typ})"), None

    def _promote(self, typ: str, filt: dict):
        """Promote the eq/in term to the root function — only when it is
        the filter's SOLE content (query_rewriter.go: multi-term filters
        stay whole in @filter, see cases 38/44)."""
        if len(filt) != 1:
            return None, filt
        for fname in sorted(k for k in filt
                            if k not in ("and", "or", "not", "has", "id")):
            cond = filt[fname]
            if not isinstance(cond, dict) or len(cond) != 1:
                continue
            f = self.s.field(typ, fname)
            if f is None:
                continue
            idx_ok = f.has_id_directive or "hash" in f.search or \
                "exact" in f.search or (f.has_search and not f.search
                                        and f.typ in ("Int", "Float",
                                                      "DateTime", "Boolean",
                                                      "Int64")) or \
                (f.has_search and self.s.is_enum(f.typ))
            if not idx_ok:
                continue
            pred = self.s.pred_name(typ, fname)
            if "eq" in cond and cond["eq"] is not None \
                    and not isinstance(cond["eq"], (dict,)):
                v = self._resolve(cond["eq"])
                if isinstance(v, list):
                    vals = ", ".join(_render_scalar(self._resolve(x))
                                     for x in v)
                else:
                    vals = _render_scalar(v)
                rest = {k: v2 for k, v2 in filt.items() if k != fname}
                more = {k: v2 for k, v2 in cond.items() if k != "eq"}
                if more:
                    rest[fname] = more
                return f"eq({pred}, {vals})", rest
            if "in" in cond and cond["in"] is not None:
                vals = ", ".join(_render_scalar(self._resolve(x))
                                 for x in cond["in"])
                rest = {k: v2 for k, v2 in filt.items() if k != fname}
                more = {k: v2 for k, v2 in cond.items() if k != "in"}
                if more:
                    rest[fname] = more
                return f"eq({pred}, {vals})", rest
        return None, filt

    # ------------------------------------------------------ vector search
    def _vector_query(self, op: dict, typ: str, mode: str) -> list[str]:
        """querySimilar<T>ByEmbedding / ById (graphql/resolve
        queryRewriter similar_to templates; math per hnsw metric)."""
        args = op.get("args", {})
        by = args.get("by")
        by = by[1] if isinstance(by, tuple) else by
        pred = self.s.pred_name(typ, by)
        f = self.s.field(typ, by)
        metric = f.vector_metric if f else "euclidean"
        topk = self._resolve(args.get("topK"))
        name = op["name"]
        opts = ""
        for k in ("ef", "distance_threshold"):
            if k in args:
                opts += f", {k}: {self._resolve(args[k])}"
        sel, _ = self._sel_lines(typ, op["fields"] or [], "    ")
        sel.append("    dgraph.uid : uid")
        sel.append(f"    {typ}.vector_distance : val(distance)")
        out: list[str] = []
        if mode == "Embedding":
            vec = args.get("vector") or []
            dense = "[" + ",".join(_go_float(float(self._resolve(x)))
                                   for x in vec) + "]"
            self.var_decl_extra = \
                f' {name}($search_vector:  float32vector = "{dense}")'
            qv, sv, mv = "$search_vector", "($search_vector)", "$search_vector"
            out.append(f"  var(func: similar_to({pred}, {topk}, {qv}{opts}))"
                       f" @filter(type({typ})) {{")
        else:
            idf = next((fn for fn, ff in self.s.get(typ).fields.items()
                        if ff.has_id_directive or ff.is_id), "id")
            out.append(f"  var(func: eq({self.s.pred_name(typ, idf)}, "
                       f"{_render_scalar(self._resolve(args.get('id')))}))"
                       f" @filter(type({typ})) {{")
            out.append(f"    vec as {pred}")
            out.append("  }")
            out.append("  var() {")
            out.append("    v1 as max(val(vec))")
            out.append("  }")
            qv, sv, mv = "val(v1)", "v1", "v1"
            out.append(f"  var(func: similar_to({pred}, {topk}, {qv}{opts})) {{")
        out.append(f"    v2 as {pred}")
        if metric == "cosine":
            out.append(f"    distance as math(1.0 - (({sv} dot v2) / sqrt("
                       f" ({sv} dot {sv}) * (v2 dot v2) )))")
        elif metric == "dotproduct":
            out.append(f"    distance as math(1.0 - ({sv} dot v2))")
        else:
            out.append(f"    distance as math(sqrt((v2 - {mv}) dot "
                       f"(v2 - {mv})))")
        out.append("  }")
        out.append(f"  {name}(func: uid(distance), orderasc: val(distance)) {{")
        out.extend(sel)
        out.append("  }")
        return out

    # --------------------------------------------------- federation
    def _entities(self, op: dict) -> list[str]:
        reps = op.get("args", {}).get("representations") or []
        typ = None
        vals = []
        for r in reps:
            tn = r.get("__typename")
            tn = tn[1] if isinstance(tn, tuple) else tn
            typ = typ or tn
            for k, v in r.items():
                if k != "__typename":
                    vals.append(_render_scalar(self._resolve(v)))
        t = self.s.get(typ)
        key = t.key_fields[0] if t.key_fields else "id"
        pred = self.s.pred_name(typ, key)
        lines: list[str] = ["    dgraph.type"]
        saw_uid = False
        for fld in op["fields"] or []:
            if "frag_on" in fld:
                sub, su = self._sel_lines(fld["frag_on"], fld["fields"],
                                          "    ")
                lines.extend(sub)
                saw_uid = saw_uid or su
        if not saw_uid:
            lines.append("    dgraph.uid : uid")
        out = [f"  _entities(func: eq({pred}, {', '.join(vals)}), "
               f"orderasc: {pred}) @filter(type({typ})) {{"]
        out.extend(lines)
        out.append("  }")
        return out

    # -------------------------------------------------------- aggregates
    def _aggregate(self, op: dict, typ: str) -> list[str]:
        args = op.get("args", {})
        alias = op["alias"] or op["name"]
        fsuffix = ""
        filt = args.get("filter")
        if isinstance(filt, dict):
            tree = self._filter_obj(typ, filt)
            if tree is not None:
                fsuffix = f" @filter({tree.render()})"
        head = [f"  {alias}() {{"]
        var_lines: list[str] = []
        want: list[str] = []
        for fld in op["fields"] or []:
            name = fld["name"]
            fal = fld["alias"] or name
            if name == "count":
                head.append(
                    f"    {typ}AggregateResult.{fal} : max(val(countVar))")
                if "count" not in want:
                    want.append("count")
                continue
            m = re.match(r"(.+?)(Min|Max|Sum|Avg)$", name)
            if not m:
                continue
            fbase, agg = m.groups()
            head.append(
                f"    {typ}AggregateResult.{fal} : "
                f"{agg.lower()}(val({fbase}Var))")
            if fbase not in want:
                want.append(fbase)
        head.append("  }")
        vb = [f"  var(func: type({typ})){fsuffix} {{"]
        for w in want:
            if w == "count":
                vb.append("    countVar as count(uid)")
            else:
                vb.append(f"    {w}Var as {self.s.pred_name(typ, w)}")
        vb.append("  }")
        return head + vb

    # ---------------------------------------------------------- password
    def _password(self, op: dict, typ: str) -> list[str]:
        args = op.get("args", {})
        t = self.s.get(typ)
        xid = next((fn for fn, f in t.fields.items()
                    if f.has_id_directive and fn in args), None)
        pwd_field = t.secret_field or "pwd"
        self.var_decl_extra = " checkPwd($pwd0: string)"
        self.vars.setdefault("$pwd0", args.get(pwd_field))
        pred = self.s.pred_name(typ, xid) if xid else "uid"
        eqv = _render_scalar(self._resolve(args.get(xid)))
        func = f"func: eq({pred}, {eqv})"
        lines, saw_uid = self._sel_lines(typ, op["fields"] or [], "    ")
        if not saw_uid:
            lines.append("    dgraph.uid : uid")
        out = [f"  {op['name']}({func}) "
               f"@filter((eq(val(pwd), 1) AND type({typ}))) {{"]
        out += [l if l.startswith("    ") else "  " + l for l in lines]
        out.append("  }")
        self._pwd_blocks = [
            f"  checkPwd({func}) @filter(type({typ})) {{",
            f"    pwd as checkpwd({typ}.{pwd_field}, $pwd0)",
            "  }",
        ]
        return out


def rewrite_query(gql: str, schema: GQLSchema,
                  variables: dict | None = None) -> str:
    return Rewriter(schema, variables).rewrite(gql)


def _linked_fields(schema: GQLSchema, typ: str):
    """Fields of ``typ`` whose target type must drop back-edges when a
    ``typ`` node is deleted (resolve/mutation_rewriter.go deleteRewrite):
    @hasInverse pairs in either direction, and reverse @dgraph preds."""
    out = []
    t = schema.get(typ)
    for fname, f in t.fields.items():
        ct = schema.types.get(f.typ)
        if ct is None or ct.kind not in ("type", "interface"):
            continue
        if f.dgraph_pred and f.dgraph_pred.startswith("~"):
            fwd = f.dgraph_pred[1:]
            inv = next((i for i, g in ct.fields.items()
                        if schema.pred_name(f.typ, i) == fwd), None)
            out.append((fname, f, inv, fwd, True))
            continue
        # a field inherited from an interface matches the inverse declared
        # against the interface type (Question.author <-> Author.posts
        # where posts: [Post])
        own_ifaces = set(getattr(schema.types.get(typ), "interfaces", []))
        inv = next(
            (i for i, g in ct.fields.items()
             if (g.typ == typ or g.typ in own_ifaces)
             and (f.inverse == i or g.inverse == fname)),
            None)
        if inv is not None:
            out.append((fname, f, inv, schema.pred_name(f.typ, inv), False))
    return out


def rewrite_delete_mutation(gql: str, schema: GQLSchema,
                            variables: dict | None = None
                            ) -> tuple[str, list]:
    """deleteT(filter) -> (upsert dgquery text, deletejson payload)
    matching graphql/resolve/delete_mutation_test.yaml exactly."""
    doc = _parse_query(gql.replace("mutation", "query", 1))
    op = doc["ops"][0]
    typ = op["name"][len("delete"):]
    rw = Rewriter(schema, variables)
    args = {k: rw._resolve(v) for k, v in op.get("args", {}).items()}
    filt = args.get("filter") or {}
    type_leaf = _F("leaf", f"type({typ})")
    idf = next((fn for fn, f in schema.get(typ).fields.items() if f.is_id),
               None)
    if isinstance(filt, dict) and idf in filt:
        ids = rw._id_list(filt[idf])
        rest = {k: v for k, v in filt.items() if k != idf}
        tree = rw._filter_obj(typ, rest) if rest else None
        func = f"func: uid({', '.join(ids)})"
        full = _F("and", kids=[tree, type_leaf]) if tree else type_leaf
    else:
        func = f"func: type({typ})"
        full = rw._filter_obj(typ, filt) if filt else None
    lines = [f"  x as delete{typ}({func})"
             + (f" @filter({full.render()})" if full is not None else "")
             + " {", "    uid"]
    deljson: list = [{"uid": "uid(x)"}]
    n = 2
    for fname, f, inv, inv_pred, is_rev in _linked_fields(schema, typ):
        var = f"{f.typ}_{n}"
        n += 1
        lines.append(f"    {var} as {schema.pred_name(typ, fname)}")
        ct = schema.get(f.typ)
        inv_field = ct.fields.get(inv) if inv else None
        ref = {"uid": "uid(x)"}
        val = [ref] if (is_rev or (inv_field is not None
                                   and inv_field.is_list)) else ref
        deljson.append({"uid": f"uid({var})", inv_pred: val})
    lines.append("  }")
    return "query {\n" + "\n".join(lines) + "\n}", deljson
