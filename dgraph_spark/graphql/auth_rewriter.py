"""@auth query rewriting with reference parity
(graphql/resolve/query_rewriter.go:1032 addAuthQueries, :1283
rewriteAuthQueries, :1640 addSelectionSetFrom auth paths; rules parsed
per graphql/schema/auth.go).

JWT claims statically evaluate RBAC rules (Positive/Negative) and gate
graph rules (a rule whose declared variable is missing from the claims
is Negative); surviving graph rules compile to @cascade var blocks and
uid(...) filters chained through TypeRoot/Type_N variables. Validated
byte-for-byte against the reference's auth_query_test.yaml corpus.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dfield

from dgraph_spark.graphql.ref_rewriter import Rewriter, _F, _parse_query
from dgraph_spark.graphql.sdl import GQLSchema

POSITIVE, NEGATIVE, UNCERTAIN = 1, -1, 0


# ------------------------------------------------------------- rule parsing
@dataclass
class RBACRule:
    variable: str           # without $
    operator: str           # eq | in | regexp
    operand: object

    def evaluate(self, jwt: dict) -> int:
        val = jwt.get(self.variable)
        vals = val if isinstance(val, list) else [val]
        for v in vals:
            if self._match(v):
                return POSITIVE
        return NEGATIVE

    def _match(self, value) -> bool:
        if self.operator == "regexp":
            return isinstance(value, str) and re.search(
                self.operand, value) is not None
        if isinstance(self.operand, list):  # in
            return any(value == o for o in self.operand)
        return value == self.operand


@dataclass
class RuleNode:
    and_: list = dfield(default_factory=list)
    or_: list = dfield(default_factory=list)
    not_: "RuleNode | None" = None
    rbac: RBACRule | None = None
    rule_gql: str | None = None      # graph rule query text
    rule_vars: list = dfield(default_factory=list)  # declared $vars

    def evaluate_static(self, jwt: dict) -> int:
        # graphql/schema/auth.go:129 EvaluateStatic
        uncertain = False
        for r in self.or_:
            v = r.evaluate_static(jwt)
            if v == POSITIVE:
                return POSITIVE
            if v == UNCERTAIN:
                uncertain = True
        if self.or_ and not uncertain:
            return NEGATIVE
        for r in self.and_:
            v = r.evaluate_static(jwt)
            if v == NEGATIVE:
                return NEGATIVE
            if v == UNCERTAIN:
                uncertain = True
        if self.and_ and not uncertain:
            return POSITIVE
        if self.not_ is not None:
            res = self.not_.evaluate_static(jwt)
            if self.not_.rbac is None:
                return res
            return {UNCERTAIN: UNCERTAIN, POSITIVE: NEGATIVE,
                    NEGATIVE: POSITIVE}[res]
        if self.rbac is not None:
            return self.rbac.evaluate(jwt)
        if self.rule_gql is not None:
            # a graph rule missing any of its declared variables can
            # never match (auth.go:120 staticEvaluation)
            for v in self.rule_vars:
                if jwt.get(v) is None:
                    return NEGATIVE
            return UNCERTAIN
        return UNCERTAIN


def _scan_string(src: str, i: int) -> tuple[str, int]:
    """Parse a GraphQL string (block or plain) starting at src[i]=='\"'."""
    if src.startswith('"""', i):
        j = src.index('"""', i + 3)
        return src[i + 3:j], j + 3
    j = i + 1
    out = []
    while src[j] != '"':
        if src[j] == "\\":
            nxt = src[j + 1]
            out.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
            j += 2
        else:
            out.append(src[j])
            j += 1
    return "".join(out), j + 1


def _skip_ws(src: str, i: int) -> int:
    while i < len(src):
        if src[i].isspace() or src[i] == ",":
            i += 1
        elif src[i] == "#":  # SDL comment inside the directive args
            while i < len(src) and src[i] != "\n":
                i += 1
        else:
            break
    return i


def _parse_rule_node(src: str, i: int) -> tuple[RuleNode, int]:
    """Parse one {and|or|not|rule: ...} group of an @auth argument."""
    node = RuleNode()
    i = _skip_ws(src, i)
    assert src[i] == "{", src[i:i + 20]
    i += 1
    while True:
        i = _skip_ws(src, i)
        if src[i] == "}":
            return node, i + 1
        m = re.match(r"(and|or|not|rule)\s*:\s*", src[i:])
        key = m.group(1)
        i += m.end()
        if key == "rule":
            text, i = _scan_string(src, i)
            text = text.strip()
            if text.startswith("{$") or text.startswith("{ $") \
                    or re.match(r"^\{\s*\$", text):
                rm = re.match(
                    r"^{[\s]?(.*?)[\s]?:[\s]?{[\s]?(\w*)[\s]?:[\s]?(.*)[\s]?}"
                    r"[\s]?}$", text)
                operand = json.loads(rm.group(3))
                node.rbac = RBACRule(rm.group(1).lstrip("$"), rm.group(2),
                                     operand)
            else:
                node.rule_gql = text
                node.rule_vars = re.findall(
                    r"\$(\w+)\s*:", text.split("{", 1)[0])
        elif key == "not":
            node.not_, i = _parse_rule_node(src, i)
        else:  # and / or
            assert src[i] == "["
            i += 1
            items = []
            while True:
                i = _skip_ws(src, i)
                if src[i] == "]":
                    i += 1
                    break
                sub, i = _parse_rule_node(src, i)
                items.append(sub)
            if key == "and":
                node.and_ = items
            else:
                node.or_ = items


def merge_interface_rules(rules: dict, schema: GQLSchema) -> dict:
    """auth.go:218-242 — implementing types AND-in each interface's
    rules (interface declaration order); interfaces then lose their own
    rules (operations on interfaces check the implementing types)."""
    out = {t: dict(r) for t, r in rules.items()}
    for t in schema.types.values():
        if t.kind != "type":
            continue
        for iface in t.interfaces:
            irules = rules.get(iface)
            if not irules:
                continue
            mine = out.setdefault(t.name, {})
            for action, inode in irules.items():
                own = mine.get(action)
                if own is None:
                    mine[action] = inode
                else:
                    mine[action] = RuleNode(and_=[own, inode])
    for t in schema.types.values():
        if t.kind == "interface":
            out[t.name] = {}
    return out


def parse_auth_rules(sdl_src: str) -> dict[str, dict[str, RuleNode]]:
    """{type name: {query/add/update/delete/password: RuleNode}} scanned
    from the raw SDL text (rule strings are block strings the main SDL
    tokenizer treats as docstrings)."""
    out: dict[str, dict[str, RuleNode]] = {}
    for m in re.finditer(
            r"\b(?:type|interface)\s+(\w+)[^{}]*?@auth\s*\(", sdl_src):
        typ = m.group(1)
        i = m.end()
        rules: dict[str, RuleNode] = {}
        while True:
            i = _skip_ws(sdl_src, i)
            if sdl_src[i] == ")":
                break
            am = re.match(r"(query|add|update|delete|password)\s*:\s*",
                          sdl_src[i:])
            if am is None:
                break
            i += am.end()
            node, i = _parse_rule_node(sdl_src, i)
            rules[am.group(1)] = node
        out[typ] = rules
    return out


# -------------------------------------------------------------- GraphQuery
class GQ:
    """Minimal dql.GraphQuery twin for auth-mode rendering."""

    __slots__ = ("attr", "alias", "var", "func", "filter", "args", "order",
                 "cascade", "children")

    def __init__(self, attr: str = "", alias: str = "", var: str = "",
                 func: str = "", filt=None):
        self.attr = attr
        self.alias = alias
        self.var = var
        self.func = func
        self.filter = filt            # _F tree or raw string
        self.args: list[str] = []     # first/offset ("first: 10")
        self.order: list[str] = []    # orderasc/orderdesc
        self.cascade: list[str] = []
        self.children: list[GQ] = []

    def filter_text(self):
        if self.filter is None:
            return None
        return self.filter if isinstance(self.filter, str) \
            else self.filter.render()


def _render_gq(q: GQ, indent: str, out: list[str], root: bool) -> None:
    head = indent
    if q.var:
        head += f"{q.var} as "
    if q.alias:
        head += f"{q.alias} : "
    head += q.attr
    if root:
        inner = []
        if q.func:
            inner.append(f"func: {q.func}")
        inner += q.order + q.args
        if inner:
            head += "(" + ", ".join(inner) + ")"
        ft = q.filter_text()
        if ft:
            head += f" @filter({ft})"
    else:
        ft = q.filter_text()
        if ft:
            head += f" @filter({ft})"
        extras = q.order + q.args
        if extras:
            head += " (" + ", ".join(extras) + ")"
    if q.cascade:
        if q.cascade == ["__all__"]:
            head += " @cascade"
        else:
            head += " @cascade(" + ", ".join(q.cascade) + ")"
    if q.children:
        out.append(head + " {")
        for c in q.children:
            _render_gq(c, indent + "  ", out, root=False)
        out.append(indent + "}")
    else:
        out.append(head)


def render_blocks(blocks: list[GQ]) -> str:
    out: list[str] = []
    for b in blocks:
        _render_gq(b, "  ", out, root=True)
    return "query {\n" + "\n".join(out) + "\n}"


class JWTRequiredError(Exception):
    """closedByDefault with no JWT token."""


# ------------------------------------------------------------ auth rewriter
class VarGen:
    def __init__(self):
        self.counter = 0

    def next(self, typ: str, auth: bool) -> str:
        self.counter += 1
        return f"{typ}_Auth{self.counter}" if auth else f"{typ}_{self.counter}"


class AuthState:
    def __init__(self, jwt: dict, selector: str, parent_var: str):
        self.jwt = jwt
        self.vg = VarGen()
        self.selector = selector      # which rule kind to apply
        self.parent_var = parent_var
        self.var_name = ""
        self.is_writing_auth = False
        self.has_auth_rules = False
        self.has_cascade = False


class AuthRewriter:
    """queryRewriter.Rewrite with auth (query_rewriter.go:66)."""

    def __init__(self, schema: GQLSchema, auth_rules: dict,
                 jwt: dict | None = None, closed_by_default: bool = False):
        # closedByDefault (x/config.go GraphQL flag): with no JWT token
        # at all, EVERY operation is denied before rewriting — even on
        # types without @auth (auth.go ExtractCustomClaims)
        if closed_by_default and jwt is None:
            raise JWTRequiredError(
                "a valid JWT is required but was not provided")
        self.s = schema
        self.rules = merge_interface_rules(auth_rules, schema)
        self.jwt = jwt or {}
        self.rw = Rewriter(schema)    # filter/order rendering helpers
        self.frags: dict = {}

    def _dgname(self, typ: str) -> str:
        t = self.s.types.get(typ)
        return (t.dgraph_name or typ) if t is not None else typ

    # ---- rule selection ----
    def rule_for(self, typ: str, kind: str) -> RuleNode | None:
        rules = self.rules.get(typ)
        if not rules:
            return None
        return rules.get(kind)

    def static_eval(self, auth: AuthState, typ: str) -> int:
        if auth is None or auth.is_writing_auth:
            return UNCERTAIN
        rn = self.rule_for(typ, auth.selector)
        if rn is None:
            return UNCERTAIN
        return rn.evaluate_static(auth.jwt)

    def _has_auth_in_selection(self, typ: str, fields: list, kind: str) -> bool:
        if self.rule_for(typ, kind) is not None:
            return True
        for fld in fields or []:
            if "frag_on" in fld:
                if self._has_auth_in_selection(fld["frag_on"],
                                               fld["fields"], kind):
                    return True
                continue
            if "frag_ref" in fld:
                fr = self.frags.get(fld["frag_ref"])
                if fr and self._has_auth_in_selection(fr["on"], fr["fields"],
                                                      kind):
                    return True
                continue
            fname = fld["name"]
            f = self.s.field(typ, fname)
            if f is None and fname.endswith("Aggregate"):
                f = self.s.field(typ, fname[:-len("Aggregate")])
            if f is None or not self.s.is_object(f.typ):
                continue
            ft = self.s.types.get(f.typ)
            targets = [f.typ]
            if ft is not None and ft.kind == "interface":
                targets += self.s.implementers(f.typ)
            if ft is not None and ft.kind == "union":
                targets = list(ft.members)
            for t in targets:
                if self._has_auth_in_selection(t, fld.get("fields"), kind):
                    return True
        return False

    def _has_cascade(self, op_or_field: dict) -> bool:
        for d in op_or_field.get("dirs") or []:
            if d["name"] == "cascade":
                return True
        for fld in op_or_field.get("fields") or []:
            if isinstance(fld, dict) and self._has_cascade(fld):
                return True
        return False

    # ---- entry ----
    def rewrite(self, gql: str) -> str:
        doc = _parse_query(gql)
        self.frags = doc["frags"]
        self._pwd_header = ""
        blocks: list[GQ] = []
        for op in doc["ops"]:
            blocks.extend(self._rewrite_op(op))
        text = render_blocks(blocks)
        if self._pwd_header:
            text = text.replace("query {",
                                f"query checkPwd{self._pwd_header} {{", 1)
        return text

    def _rewrite_op(self, op: dict) -> list[GQ]:
        name = op["name"]
        if name == "_entities":
            return self._entities(op)
        m = re.match(r"(get|query|aggregate|check)(.+)", name)
        kind, rest = (m.groups() if m else (None, None))
        if kind == "check" and rest.endswith("Password"):
            return self._password(op, rest[:-len("Password")])
        if kind == "aggregate":
            return self._aggregate(op, rest)
        typ = rest
        selector = "query"
        auth = AuthState(self.jwt, selector, typ + "Root")
        auth.has_auth_rules = self._has_auth_in_selection(
            typ, op.get("fields"), selector) or self._iface_impl_auth(typ)
        auth.has_cascade = self._has_cascade(op)
        if kind == "get":
            return self._as_get(op, typ, auth)
        return self._as_query(op, typ, auth)

    def _iface_impl_auth(self, typ: str) -> bool:
        t = self.s.types.get(typ)
        if t is None or t.kind != "interface":
            return False
        return any(self.rule_for(i, "query") is not None
                   for i in self.s.implementers(typ))

    # ---- common building (addCommonRules / rewriteAsQuery) ----
    def _as_query(self, op: dict, typ: str, auth: AuthState,
                  uids: list[str] | None = None,
                  extra_type_filter: bool = False) -> list[GQ]:
        rbac = self.static_eval(auth, typ)
        q = GQ(attr=op["name"])
        if rbac == NEGATIVE:
            q.attr += "()"
            return [q]
        args = {k: self.rw._resolve(v) for k, v in (op.get("args") or {}).items()}
        filt = args.get("filter") if isinstance(args.get("filter"), dict) \
            else None
        ids = None
        if uids is not None:
            ids = uids
        else:
            idf = next((fn for fn, f in self.s.get(typ).fields.items()
                        if f.is_id), None)
            if filt and idf in filt:
                got = self.rw._id_list(filt[idf])
                if got:
                    ids = got
        if auth is not None and (auth.is_writing_auth) and \
                (auth.var_name or auth.parent_var) and ids is None:
            q.func = f"uid({auth.var_name or auth.parent_var})"
        elif ids is not None:
            q.func = f"uid({', '.join(ids)})"
        else:
            q.func = f"type({self._dgname(typ)})"
        # user filter (ids excluded)
        self._add_field_args(q, typ, args, filt, skip_id=True)
        sel_auth = self._selection(q, typ, op.get("fields") or [], auth)
        if not auth.is_writing_auth:
            self._add_uid(q)
        casc = self.rw._cascade_arg(typ, op.get("dirs"))
        if casc:
            q.cascade = (["__all__"] if casc == "@cascade"
                         else [c.strip() for c in
                               casc[len("@cascade("):-1].split(",")])
        if extra_type_filter:
            tl = _F("leaf", f"type({typ})")
            q.filter = tl if q.filter is None else _F(
                "and", kids=[q.filter, tl])
        out = self._add_auth_queries(typ, [q], rbac, auth)
        out.extend(sel_auth)
        return out

    def _as_get(self, op: dict, typ: str, auth: AuthState) -> list[GQ]:
        rbac = self.static_eval(auth, typ)
        if rbac == NEGATIVE:
            return [GQ(attr=op["name"] + "()")]
        t = self.s.get(typ)
        if t.kind == "interface":
            ok = any(self.static_eval(auth, i) != NEGATIVE
                     for i in self.s.implementers(typ))
            if not ok:
                return [GQ(attr=op["name"] + "()")]
        args = {k: self.rw._resolve(v) for k, v in (op.get("args") or {}).items()}
        idf = next((fn for fn, f in t.fields.items() if f.is_id), None)
        ids = self.rw._id_list(args.get(idf)) if idf in args else []
        out = self._as_query(op, typ, auth, uids=ids or ["0x0"],
                             extra_type_filter=False)
        # addTopLevelTypeFilter on the user query
        tl = _F("leaf", f"type({typ})")
        q0 = out[0]
        q0.filter = tl if q0.filter is None else _F("and",
                                                    kids=[q0.filter, tl])
        return out

    def _add_field_args(self, q: GQ, typ: str, args: dict, filt,
                        skip_id: bool) -> None:
        if filt:
            use = filt
            id_at_root = False
            idf = next((fn for fn, f in self.s.get(typ).fields.items()
                        if f.is_id), None)
            if idf in filt and q.func.startswith("uid("):
                # addFilter: ids moved to the root func also pin the type
                use = {k: v for k, v in filt.items() if k != idf}
                id_at_root = True
            tree = self.rw._filter_obj(typ, use) if use else None
            if tree is not None:
                q.filter = tree
            if id_at_root:
                tl = _F("leaf", f"type({self._dgname(typ)})")
                q.filter = tl if q.filter is None else _F(
                    "and", kids=[q.filter, tl])
        if "order" in args:
            q.order = self.rw._order_args(typ, args["order"])
        for k in ("first", "offset"):
            if k in args:
                q.args.append(f"{k}: {self.rw._resolve(args[k])}")

    def _add_uid(self, q: GQ) -> None:
        """addUID (query_rewriter.go): every selection level that lacks a
        uid child gets `dgraph.uid : uid` appended, recursively."""
        if not q.children:
            return
        has_uid = False
        for c in q.children:
            has_uid = has_uid or c.attr == "uid"
            self._add_uid(c)
        if not has_uid:
            q.children.append(GQ(attr="uid", alias="dgraph.uid"))

    # ---- selection sets (addSelectionSetFrom) ----
    def _selection(self, q: GQ, typ: str, fields: list,
                   auth: AuthState) -> list[GQ]:
        auth_queries: list[GQ] = []
        t_self = self.s.types.get(typ)
        if fields and t_self is not None and t_self.kind in (
                "interface", "union"):
            q.children.append(GQ(attr="dgraph.type"))
        seen: set[str] = set()
        flat = self._flatten(typ, fields)
        for ftyp, fld in flat:
            if self._skip_dir(fld):
                continue
            name = fld["name"]
            alias = fld["alias"] or name
            f = self.s.field(ftyp, name)
            if f is None and name.endswith("Aggregate") and \
                    self.s.field(ftyp, name[:-len("Aggregate")]) is not None:
                auth_queries.extend(
                    self._child_aggregate(q, ftyp, fld, auth))
                continue
            if name == "__typename" or f is None:
                continue
            dg_alias = f"{ftyp}.{alias}"
            if dg_alias in seen:
                continue
            seen.add(dg_alias)
            child = GQ(alias=dg_alias)
            if f.is_id and not f.external:
                child.attr = "uid"
            else:
                child.attr = self.s.pred_name(ftyp, name)
                if child.attr.startswith("<"):
                    child.attr = child.attr[1:-1]
            cargs = {k: self.rw._resolve(v)
                     for k, v in (fld.get("args") or {}).items()}
            cfilt = cargs.get("filter") if isinstance(cargs.get("filter"),
                                                      dict) else None
            child_typ = f.typ
            has_sel = fld.get("fields") is not None and \
                self.s.is_object(f.typ)
            if has_sel or cfilt:
                if cfilt is not None:
                    ct_ = self.s.types.get(child_typ)
                    if ct_ is not None and ct_.kind == "union":
                        tree = self.rw._union_member_filter(ct_, cfilt)
                    else:
                        tree = self.rw._filter_obj(child_typ, cfilt)
                    if tree is not None:
                        child.filter = tree
            if child.attr.startswith("~"):
                tl = _F("leaf", f"type({child_typ})")
                child.filter = tl if child.filter is None else _F(
                    "and", kids=[child.filter, tl])
            if has_sel:
                if "order" in cargs:
                    child.order = self.rw._order_args(child_typ,
                                                      cargs["order"])
                for k in ("first", "offset"):
                    if k in cargs:
                        child.args.append(
                            f"{k}: {self.rw._resolve(cargs[k])}")
                casc = self.rw._cascade_arg(child_typ, fld.get("dirs"))
                if casc:
                    child.cascade = (
                        ["__all__"] if casc == "@cascade"
                        else [c.strip() for c in
                              casc[len("@cascade("):-1].split(",")])
            if not has_sel:
                q.children.append(child)
                continue
            rbac = self.static_eval(auth, child_typ)
            saved = None
            if fld.get("fields") and not auth.is_writing_auth \
                    and auth.has_auth_rules:
                saved = (auth.parent_var, auth.var_name)
                auth.parent_var = auth.vg.next(child_typ, False)
                auth.var_name = auth.vg.next(child_typ, False)
            sel_auth = self._selection(child, child_typ,
                                       fld.get("fields") or [], auth)
            self._maybe_uid_child(child, auth, fld)
            if rbac in (POSITIVE, UNCERTAIN):
                q.children.append(child)
            field_auth: list[GQ] = []
            auth_filter = None
            if rbac == NEGATIVE and auth.has_auth_rules and \
                    auth.has_cascade and not auth.is_writing_auth:
                q.children.append(child)
                var = auth.vg.next(child_typ, False)
                fq = GQ(attr="var", var=var, func="uid()")
                field_auth.append(fq)
                auth_filter = _F("leaf", f"uid({var})")
                rbac = POSITIVE
            elif rbac == NEGATIVE:
                if saved is not None:
                    auth.parent_var, auth.var_name = saved
                continue
            if rbac == UNCERTAIN:
                field_auth, auth_filter = self._rewrite_auth_queries(
                    child_typ, auth)
            if fld.get("fields") and not auth.is_writing_auth \
                    and auth.has_auth_rules:
                parent_qry = GQ(attr="var", func=f"uid({saved[0]})")
                edge_child = GQ(attr=child.attr, var=auth.var_name)
                edge_child.filter = child.filter
                parent_qry.children.append(edge_child)
                selection_qry = GQ(attr="var", var=auth.parent_var,
                                   func=f"uid({auth.var_name})")
                selection_qry.filter = auth_filter
                child.filter = _F("leaf", f"uid({selection_qry.var})")
                auth_queries.extend([parent_qry, selection_qry])
            auth_queries.extend(sel_auth)
            auth_queries.extend(field_auth)
            if saved is not None:
                auth.parent_var, auth.var_name = saved
        return auth_queries

    def _maybe_uid_child(self, child: GQ, auth: AuthState,
                         fld: dict) -> None:
        if auth.is_writing_auth:
            return  # auth rule queries never query uid for __typename
        names = [x.get("name") for x in (fld.get("fields") or [])
                 if isinstance(x, dict)]
        if len(names) == 1 and names == ["__typename"]:
            child.children.append(GQ(attr="uid", alias="dgraph.uid"))

    def _child_aggregate(self, q: GQ, typ: str, fld: dict,
                         auth: AuthState) -> list[GQ]:
        """buildAggregateFields (query_rewriter.go:1481) — child-level
        fooAggregate { count/xMin/... } with auth chains."""
        name = fld["name"]
        alias = fld["alias"] or name
        base = name[:-len("Aggregate")]
        bf = self.s.field(typ, base)
        ctype = bf.typ
        rtype = f"{ctype}AggregateResult"
        pred = self.s.pred_name(typ, base)
        f_alias = f"{typ}.{alias}"
        cargs = {k: self.rw._resolve(v)
                 for k, v in (fld.get("args") or {}).items()}
        cfilt = cargs.get("filter") if isinstance(cargs.get("filter"),
                                                  dict) else None
        field_filter = self.rw._filter_obj(ctype, cfilt) if cfilt else None

        def _with_type_filter(base_f):
            if not pred.startswith("~"):
                return base_f
            tl = _F("leaf", f"type({self._dgname(ctype)})")
            return tl if base_f is None else _F("and", kids=[base_f, tl])

        main = GQ(alias=f_alias, attr=pred)
        main.filter = _with_type_filter(field_filter)
        agg_children: list[GQ] = []
        other_children: list[GQ] = []
        var_added: set[str] = set()
        for sub in fld.get("fields") or []:
            sname = sub.get("name", "")
            salias = sub.get("alias") or sname
            if sname == "count":
                cq = GQ(alias=f"{rtype}.{salias}_{f_alias}",
                        attr=f"count({pred})")
                cq.filter = _with_type_filter(field_filter)
                agg_children.append(cq)
                continue
            for fn in ("Max", "Min", "Sum", "Avg"):
                if sname.endswith(fn):
                    sbase = sname[:-3]
                    if sbase not in var_added:
                        main.children.append(GQ(
                            attr=self.s.pred_name(ctype, sbase),
                            var=f"{f_alias}_{sbase}Var"))
                        var_added.add(sbase)
                    other_children.append(GQ(
                        alias=f"{rtype}.{salias}_{f_alias}",
                        attr=f"{fn.lower()}(val({f_alias}_{sbase}Var))"))
                    break
        if main.children:
            agg_children = [main] + agg_children
        rbac = self.static_eval(auth, ctype)
        if rbac == NEGATIVE:
            return []
        ret: list[GQ] = []
        saved = None
        if fld.get("fields") and not auth.is_writing_auth \
                and auth.has_auth_rules:
            saved = (auth.parent_var, auth.var_name)
            auth.parent_var = auth.vg.next(rtype, False)
            auth.var_name = auth.vg.next(rtype, False)
        field_auth: list[GQ] = []
        auth_filter = None
        if rbac == UNCERTAIN:
            field_auth, auth_filter = self._rewrite_auth_queries(ctype, auth)
        if fld.get("fields") and not auth.is_writing_auth \
                and auth.has_auth_rules:
            parent_qry = GQ(attr="var", func=f"uid({saved[0]})")
            edge_child = GQ(attr=pred, var=auth.var_name)
            selection_qry = GQ(attr="var", var=auth.parent_var,
                               func=f"uid({auth.var_name})")
            selection_qry.filter = auth_filter
            appended = False
            for ac in agg_children:
                if not appended:
                    edge_child.filter = ac.filter
                    ret.extend([parent_qry, selection_qry])
                    appended = True
                ac.filter = _F("leaf", f"uid({selection_qry.var})")
            parent_qry.children.append(edge_child)
            auth.parent_var, auth.var_name = saved
        q.children.extend(agg_children + other_children)
        ret.extend(field_auth)
        return ret

    def _skip_dir(self, fld: dict) -> bool:
        """@skip/@include; an UNBOUND variable fails safe (field dropped
        in both directions — matches the reference harness)."""
        dm = {d["name"]: d["args"] for d in (fld.get("dirs") or [])}
        if "skip" in dm:
            v = dm["skip"].get("if")
            rv = self.rw._resolve(v)
            if (rv is None and isinstance(v, tuple)) or bool(rv):
                return True
        if "include" in dm:
            v = dm["include"].get("if")
            rv = self.rw._resolve(v)
            if (rv is None and isinstance(v, tuple)) or not bool(rv):
                return True
        return False

    def _flatten(self, typ: str, fields: list) -> list:
        out = []
        for fld in fields or []:
            if "frag_on" in fld:
                out.extend(self._flatten(fld["frag_on"], fld["fields"]))
                continue
            if "frag_ref" in fld:
                fr = self.frags.get(fld["frag_ref"])
                if fr:
                    out.extend(self._flatten(fr["on"], fr["fields"]))
                continue
            out.append((typ, fld))
        return out

    # ---- auth query building ----
    def _rewrite_auth_queries(self, typ: str,
                              auth: AuthState) -> tuple[list[GQ], object]:
        if auth is None or auth.is_writing_auth:
            return [], None
        sub = AuthState(auth.jwt, auth.selector, auth.parent_var)
        sub.vg = auth.vg
        sub.is_writing_auth = True
        sub.var_name = auth.var_name
        sub.has_auth_rules = auth.has_auth_rules
        return self._rewrite_rule_node(typ, self.rule_for(typ, auth.selector),
                                       sub)

    def _rewrite_rule_node(self, typ: str, rn: RuleNode | None,
                           auth: AuthState) -> tuple[list[GQ], object]:
        if typ is None or rn is None:
            return [], None
        if rn.and_ or rn.or_:
            kids = rn.and_ or rn.or_
            qrys: list[GQ] = []
            filts = []
            for sub in kids:
                q, f = self._rewrite_rule_node(typ, sub, auth)
                qrys.extend(q)
                if f is not None:
                    filts.append(f)
            if rn.and_ and self_eval_negative(rn, auth.jwt):
                return [], None
            if not filts:
                return qrys, None
            if len(filts) == 1:
                return qrys, filts[0]
            sep = " AND " if rn.and_ else " OR "
            return qrys, _F("leaf", "(" + sep.join(
                f.render() for f in filts) + ")")
        if rn.not_ is not None:
            qrys, filt = self._rewrite_rule_node(typ, rn.not_, auth)
            if filt is None:
                return qrys, None
            return qrys, _F("leaf", f"NOT ({filt.render()})")
        if rn.rule_gql is not None:
            if rn.evaluate_static(auth.jwt) == NEGATIVE:
                return [], None
            var = auth.vg.next(typ, True)
            q = self._rule_as_query(rn, typ, auth)  # typ only names the var
            q.var = var
            q.attr = "var"
            if not q.cascade:
                q.cascade = ["__all__"]
            return [q], _F("leaf", f"uid({var})")
        return [], None

    def _rule_as_query(self, rn: RuleNode, typ: str, auth: AuthState) -> GQ:
        """rewriteAsQuery of the (JWT-substituted) rule query in
        writing-auth mode: func uid(varName), filter from the rule's
        root filter, children from its selection. The body renders
        against the rule's OWN queried type (an inherited interface
        rule queries the interface)."""
        doc = _parse_query(rn.rule_gql)
        op = doc["ops"][0]
        m = re.match(r"(?:query|get)(.+)", op["name"])
        if m and m.group(1) in self.s.types:
            typ = m.group(1)
        old_vars = self.rw.vars
        decls = dict(re.findall(r"\$(\w+)\s*:\s*([\[\]\w!]+)",
                                rn.rule_gql.split("{", 1)[0]))

        def _coerce(k, v):
            # JWT claims arrive as strings; the rule's declared variable
            # type decides the DQL literal form (Boolean -> bare true)
            t = decls.get(k, "").strip("[]!").lstrip("[")
            if t == "Boolean" and isinstance(v, str):
                return v.lower() == "true"
            if t in ("Int", "Int64") and isinstance(v, str) and v.isdigit():
                return int(v)
            return v

        self.rw.vars = {("$" + k): _coerce(k, v)
                        for k, v in auth.jwt.items()}
        try:
            q = GQ(attr="ignored")
            args = {k: self.rw._resolve(v)
                    for k, v in (op.get("args") or {}).items()}
            filt = args.get("filter") if isinstance(args.get("filter"),
                                                    dict) else None
            ids = None
            idf = next((fn for fn, f in self.s.get(typ).fields.items()
                        if f.is_id), None)
            if filt and idf in filt:
                got = self.rw._id_list(filt[idf])
                if got:
                    ids = got
            if ids is not None:
                q.func = f"uid({', '.join(ids)})"
            else:
                q.func = f"uid({auth.var_name or auth.parent_var})"
            self._add_field_args(q, typ, args, filt, skip_id=False)
            casc = self.rw._cascade_arg(typ, op.get("dirs"))
            if casc:
                q.cascade = (["__all__"] if casc == "@cascade"
                             else [c.strip() for c in
                                   casc[len("@cascade("):-1].split(",")])
            self._selection(q, typ, op.get("fields") or [], auth)
        finally:
            self.rw.vars = old_vars
        return q

    # ---- addAuthQueries (root) ----
    def _add_auth_queries(self, typ: str, dg: list[GQ], rbac: int,
                          auth: AuthState) -> list[GQ]:
        if auth is None or auth.is_writing_auth:
            return dg
        auth.var_name = auth.vg.next(typ, False)
        fld_auth, filt = self._rewrite_auth_queries_for_root(typ, auth)
        t = self.s.types.get(typ)
        if t is not None and t.kind == "interface":
            impls = self.s.implementers(typ)
            # AuthRules().Rules != nil — ANY action's rules count, not
            # just the current selector's (query_rewriter.go:1060)
            impl_has_rules = any(self.rules.get(i) for i in impls)
            qrys: list[GQ] = []
            filts = []
            for obj in impls:
                if self.static_eval(auth, obj) == NEGATIVE:
                    continue
                query_var = auth.vg.next(obj, False)
                var_qry = GQ(attr="var", var=query_var,
                             func=f"type({self._dgname(obj)})")
                qrys.append(var_qry)
                sub = AuthState(auth.jwt, auth.selector, auth.parent_var)
                sub.vg = auth.vg
                sub.is_writing_auth = True
                sub.var_name = query_var
                sub.has_auth_rules = auth.has_auth_rules
                obj_qrys, obj_filt = self._rewrite_rule_node(
                    obj, self.rule_for(obj, auth.selector), sub)
                if not obj_qrys or self.static_eval(auth, obj) == POSITIVE:
                    obj_filt = _F("leaf", f"uid({query_var})")
                else:
                    qrys.extend(obj_qrys)
                filts.append(obj_filt)
            if not filts and impl_has_rules:
                return [GQ(attr=dg[0].attr + "()", var=dg[0].var)]
            fld_auth = fld_auth + qrys
            if filts:
                # a single-child OR still renders parenthesized
                filt = _F("leaf", "(" + " OR ".join(
                    f.render() for f in filts) + ")")
            if t.kind == "interface" and not impl_has_rules \
                    and self.rule_for(typ, auth.selector) is None:
                return dg
        if not fld_auth and not auth.has_auth_rules:
            return dg
        if rbac != UNCERTAIN:
            fld_auth = []
            filt = None
        var_qry = GQ(attr="var", var=auth.var_name, func=dg[0].func)
        var_qry.filter = dg[0].filter
        root_qry = GQ(attr="var", var=auth.parent_var,
                      func=f"uid({auth.var_name})")
        root_qry.filter = filt
        dg[0].filter = None
        if not dg[0].cascade:
            root_qry.args = dg[0].args
            dg[0].args = []
            root_qry.order = list(dg[0].order)
        dg[0].func = f"uid({auth.parent_var})"
        return dg + [root_qry, var_qry] + fld_auth

    def _rewrite_auth_queries_for_root(self, typ, auth):
        t = self.s.types.get(typ)
        if t is not None and t.kind == "interface":
            return [], None
        return self._rewrite_auth_queries(typ, auth)

    # ---- password (passwordQuery, query_rewriter.go:335) ----
    def _password(self, op: dict, typ: str) -> list[GQ]:
        auth = AuthState(self.jwt, "password", typ + "Root")
        auth.has_auth_rules = (
            self.rule_for(typ, "password") is not None
            or self._has_auth_in_selection(typ, op.get("fields"), "query")
            or self._iface_impl_auth_kind(typ, "password"))
        auth.has_cascade = self._has_cascade(op)
        rbac = self.static_eval(auth, typ)
        if rbac == NEGATIVE:
            return [GQ(attr=op["name"] + "()")]
        t = self.s.get(typ)
        if t.kind == "interface":
            ok = any(self.static_eval(auth, i) != NEGATIVE
                     for i in self.s.implementers(typ))
            if not ok:
                return [GQ(attr=op["name"] + "()")]
        args = {k: self.rw._resolve(v)
                for k, v in (op.get("args") or {}).items()}
        idf = next((fn for fn, f in t.fields.items() if f.is_id), None)
        pwd_field = t.secret_field
        if pwd_field is None:  # @secret inherited from an interface
            for iface in t.interfaces:
                it = self.s.types.get(iface)
                if it is not None and it.secret_field:
                    pwd_field = it.secret_field
                    break
        pwd_pred = f"{typ}.{pwd_field or 'password'}"
        q = GQ(attr=op["name"])
        xid_type_filter = False
        if idf is not None and idf in args:
            ids = self.rw._id_list(args[idf])
            q.func = f"uid({', '.join(ids)})"
        else:
            # xid get: eq on the @id field used as the argument
            xname, xval = next(((k, v) for k, v in args.items()
                                if self.s.field(typ, k) is not None
                                and self.s.field(typ, k).has_id_directive),
                               (None, None))
            pred = self.s.pred_name(typ, xname)
            q.func = f'eq({pred}, {json.dumps(xval)})'
            xid_type_filter = True
        saved_sel = auth.selector
        auth.selector = "query"
        sel_auth = self._selection(q, typ, op.get("fields") or [], auth)
        auth.selector = saved_sel
        self._add_uid(q)
        if xid_type_filter:
            # type filter BEFORE auth: rides into the varQry
            tl = _F("leaf", f"type({self._dgname(typ)})")
            q.filter = tl if q.filter is None else _F("and",
                                                      kids=[q.filter, tl])
        dg = self._add_auth_queries(typ, [q], rbac, auth)
        dg.extend(sel_auth)
        if not xid_type_filter:
            # uid-get: type filter on the USER query after auth
            tl = _F("leaf", f"type({self._dgname(typ)})")
            q0 = dg[0]
            q0.filter = tl if q0.filter is None else _F(
                "and", kids=[q0.filter, tl])
        main = dg[0]
        self._pwd_header = "($pwd0: string)"
        chk = GQ(attr="checkPwd", func=main.func)
        chk.filter = main.filter
        chk.children.append(GQ(attr=f"checkpwd({pwd_pred}, $pwd0)",
                               var="pwd"))
        base = main.filter_text()
        main.filter = ("(eq(val(pwd), 1) AND " + base + ")") if base \
            else "(eq(val(pwd), 1))"
        return dg + [chk]

    def _entities(self, op: dict) -> list[GQ]:
        """Apollo _entities with auth (query_rewriter.go entitiesQuery):
        key-field root func + type filter, then the standard Root/var
        auth chain under the `_EntityRoot` parent variable."""
        reps = self.rw._resolve(op["args"].get("representations")) or []
        reps = [self.rw._resolve(r) for r in reps]
        typ = self.rw._resolve(reps[0]["__typename"]) if reps else ""
        if isinstance(typ, tuple):
            typ = typ[1]
        t = self.s.get(typ)
        key_name = (t.key_fields[0] if t.key_fields else
                    next(fn for fn, f in t.fields.items() if f.is_id))
        kf = t.fields[key_name]
        vals = []
        for r in reps:
            v = self.rw._resolve(r.get(key_name))
            vals.append(v[1] if isinstance(v, tuple) else v)
        auth = AuthState(self.jwt, "query", "_EntityRoot")
        fields = op.get("fields") or []
        auth.has_auth_rules = self._has_auth_in_selection(
            typ, self._strip_frags(fields), "query") \
            or self.rule_for(typ, "query") is not None
        auth.has_cascade = self._has_cascade(op)
        rbac = self.static_eval(auth, typ)
        q = GQ(attr="_entities")
        if rbac == NEGATIVE:
            q.attr += "()"
            return [q]
        pred = self.s.pred_name(typ, key_name)
        if kf.is_id and not kf.external:
            ids = self.rw._id_list(vals)
            q.func = f"uid({', '.join(ids)})"
        else:
            lits = ", ".join(json.dumps(str(v)) for v in vals)
            q.func = f"eq({pred}, {lits})"
            q.order = [f"orderasc: {pred}"]
        q.filter = _F("leaf", f"type({self._dgname(typ)})")
        q.children.append(GQ(attr="dgraph.type"))
        sel_auth = self._selection(q, typ, self._strip_frags(fields), auth)
        self._add_uid(q)
        dg = self._add_auth_queries(typ, [q], rbac, auth)
        dg.extend(sel_auth)
        return dg

    def _strip_frags(self, fields: list) -> list:
        out = []
        for fld in fields or []:
            if "frag_on" in fld:
                out.extend(fld["fields"])
            else:
                out.append(fld)
        return out

    def _iface_impl_auth_kind(self, typ: str, kind: str) -> bool:
        t = self.s.types.get(typ)
        if t is None or t.kind != "interface":
            return False
        return any(self.rule_for(i, kind) is not None
                   for i in self.s.implementers(typ))

    def _aggregate(self, op: dict, typ: str) -> list[GQ]:
        """aggregateQuery (query_rewriter.go) with auth chains."""
        auth = AuthState(self.jwt, "query", typ + "Root")
        auth.has_auth_rules = (self.rule_for(typ, "query") is not None
                               or self._iface_impl_auth(typ))
        auth.has_cascade = self._has_cascade(op)
        rbac = self.static_eval(auth, typ)
        q = GQ(attr=op["name"])
        if rbac == NEGATIVE:
            q.attr += "()"
            return [q]
        args = {k: self.rw._resolve(v)
                for k, v in (op.get("args") or {}).items()}
        filt = args.get("filter") if isinstance(args.get("filter"),
                                                dict) else None
        ids = None
        idf = next((fn for fn, f in self.s.get(typ).fields.items()
                    if f.is_id), None)
        if filt and idf in filt:
            got = self.rw._id_list(filt[idf])
            if got:
                ids = got
        q.func = f"uid({', '.join(ids)})" if ids else \
            f"type({self._dgname(typ)})"
        self._add_field_args(q, typ, args, filt, skip_id=False)
        dg = self._add_auth_queries(typ, [q], rbac, auth)
        main = dg[0]
        main.attr = "var"
        final = GQ(attr=op["name"] + "()")
        agg_added: set[str] = set()
        count_added = False
        for fld in op.get("fields") or []:
            fname = fld.get("name", "")
            alias = fld.get("alias") or fname
            if fname == "count":
                if not count_added:
                    main.children.append(GQ(attr="count(uid)",
                                            var="countVar"))
                    count_added = True
                final.children.append(GQ(
                    attr="max(val(countVar))",
                    alias=f"{typ}AggregateResult.{alias}"))
                continue
            for fn in ("Max", "Min", "Sum", "Avg"):
                if fname.endswith(fn):
                    base = fname[:-3]
                    if base not in agg_added:
                        main.children.append(GQ(
                            attr=self.s.pred_name(typ, base),
                            var=base + "Var"))
                        agg_added.add(base)
                    final.children.append(GQ(
                        attr=f"{fn.lower()}(val({base}Var))",
                        alias=f"{typ}AggregateResult.{alias}"))
                    break
        return [final] + dg


def self_eval_negative(rn: RuleNode, jwt: dict) -> bool:
    return rn.evaluate_static(jwt) == NEGATIVE


def rewrite_query_with_auth(gql: str, schema: GQLSchema, auth_rules: dict,
                            jwt: dict | None = None,
                            closed_by_default: bool = False) -> str:
    return AuthRewriter(schema, auth_rules, jwt,
                        closed_by_default=closed_by_default).rewrite(gql)


# ----------------------------------------------------- delete mutations
class AuthDeleteRewriter(AuthRewriter):
    """deleteRewriter.Rewrite with auth (mutation_rewriter.go:1048):
    the x-as upsert query gets the TypeRoot auth chain, @hasInverse
    back-edge cleanup vars number after the auth allocations, and a
    payload selection re-query (filterByUid) forms the second upsert."""

    def rewrite_delete(self, gql: str, variables: dict | None = None):
        doc = _parse_query(gql.replace("mutation", "query", 1))
        self.frags = doc["frags"]
        self._pwd_header = ""
        op = doc["ops"][0]
        typ = op["name"][len("delete"):]
        self.rw.vars = {("$" + k): v for k, v in (variables or {}).items()}
        auth = AuthState(self.jwt, "delete", typ + "Root")
        auth.has_auth_rules = self._payload_has_auth(typ, op, "delete")
        auth.has_cascade = self._has_cascade(op)
        rbac = self.static_eval(auth, typ)
        q = GQ(attr=op["name"], var="x")
        dg = [q]
        iface_dead = False
        t0 = self.s.types.get(typ)
        if t0 is not None and t0.kind == "interface":
            iface_dead = not any(self.static_eval(auth, i) != NEGATIVE
                                 for i in self.s.implementers(typ))
        if rbac == NEGATIVE or iface_dead:
            q.attr += "()"
        else:
            args = {k: self.rw._resolve(v)
                    for k, v in (op.get("args") or {}).items()}
            filt = args.get("filter") if isinstance(args.get("filter"),
                                                    dict) else None
            ids = None
            idf = next((fn for fn, f in self.s.get(typ).fields.items()
                        if f.is_id), None)
            if filt and idf in filt:
                got = self.rw._id_list(filt[idf])
                if got:
                    ids = got
            q.func = f"uid({', '.join(ids)})" if ids else \
                f"type({self._dgname(typ)})"
            q.children.append(GQ(attr="uid"))
            if ids and not (filt and len(filt) > 1):
                # only the uid func came from the filter: type filter
                tl = _F("leaf", f"type({self._dgname(typ)})")
                q.filter = tl
            else:
                self._add_field_args(q, typ, args, filt, skip_id=True)
                if ids:
                    pass  # type filter added by _add_field_args id logic
            dg = self._add_auth_queries(typ, [q], rbac, auth)
        deletes: list = [{"uid": "uid(x)"}]
        if not q.attr.endswith("()"):
            deletes.extend(self._remove_node_reference(typ, q, auth))
        mutations = [{"deletejson": deletes, "cond": ""}]
        dgquery = render_blocks(dg)
        # second upsert: re-query the payload selection before deletion
        qf = self._query_field(typ, op)
        dgquerysec = None
        if qf is not None:
            sec_auth = AuthState(self.jwt, "query",
                                 self.vg_next_for(auth, qf))
            sec_auth.vg = auth.vg
            sec_auth.var_name = "x"
            sec_auth.has_auth_rules = self._payload_field_has_auth(qf)
            sec_auth.has_cascade = self._has_cascade(qf)
            alias = qf["alias"] or qf["name"]
            qf_op = {"name": f"Delete{typ}Payload.{alias}",
                     "args": qf.get("args") or {},
                     "dirs": qf.get("dirs"), "fields": qf.get("fields")}
            sec = self._as_query_field_by_uid(qf_op, qf, sec_auth)
            qcopy = GQ(attr="var", var="x", func=q.func)
            qcopy.filter = q.filter
            if not qcopy.func:
                qcopy.attr += "()"
            if sec and sec[0].attr.endswith("()"):
                qcopy.var = ""
            blocks = [qcopy] + dg[1:] + sec
            dgquerysec = render_blocks(blocks)
        return dgquery, mutations, dgquerysec

    def vg_next_for(self, auth: AuthState, qf: dict) -> str:
        f = self.s.field(None, "")  # placeholder, not used
        ftyp = self._payload_field_type(qf)
        return auth.vg.next(ftyp, False)

    def _payload_field_type(self, qf: dict) -> str:
        return qf["_ftyp"]

    def _query_field(self, typ: str, op: dict):
        """The payload field whose type is the mutated type (QueryField)."""
        pl_typ_lower = typ[:1].lower() + typ[1:]
        for fld in op.get("fields") or []:
            if fld.get("name") in (pl_typ_lower, typ) and \
                    fld.get("fields") is not None:
                fld = dict(fld)
                fld["_ftyp"] = typ
                return fld
        return None

    def _payload_has_auth(self, typ: str, op: dict, kind: str) -> bool:
        # hasAuthRules(m.QueryField()): only the payload field that
        # queries the mutated type counts — a msg-only payload means no
        # auth chain even when the type itself has rules
        qf = self._query_field(typ, op)
        if qf is None:
            return False
        if self.rule_for(typ, kind) is not None or \
                self._iface_impl_auth_kind_any(typ, kind):
            return True
        return self._has_auth_in_selection(typ, qf.get("fields"), kind)

    def _iface_impl_auth_kind_any(self, typ: str, kind: str) -> bool:
        t = self.s.types.get(typ)
        if t is None or t.kind != "interface":
            return False
        return any(self.rule_for(i, kind) is not None
                   for i in self.s.implementers(typ))

    def _payload_field_has_auth(self, qf: dict) -> bool:
        typ = qf["_ftyp"]
        return (self.rule_for(typ, "query") is not None
                or self._has_auth_in_selection(typ, qf.get("fields"),
                                               "query"))

    def _as_query_field_by_uid(self, op: dict, qf: dict,
                               auth: AuthState) -> list[GQ]:
        """rewriteAsQuery of the payload field with filterByUid=True:
        root func is uid(x), then the standard query-auth chain."""
        typ = qf["_ftyp"]
        rbac = self.static_eval(auth, typ)
        q = GQ(attr=op["name"])
        if rbac == NEGATIVE:
            q.attr += "()"
            return [q]
        args = {k: self.rw._resolve(v)
                for k, v in (op.get("args") or {}).items()}
        filt = args.get("filter") if isinstance(args.get("filter"),
                                                dict) else None
        q.func = f"uid({auth.var_name})"
        auth.var_name = ""
        self._add_field_args(q, typ, args, filt, skip_id=True)
        sel_auth = self._selection(q, typ, op.get("fields") or [], auth)
        self._add_uid(q)
        casc = self.rw._cascade_arg(typ, op.get("dirs"))
        if casc:
            q.cascade = (["__all__"] if casc == "@cascade"
                         else [c.strip() for c in
                               casc[len("@cascade("):-1].split(",")])
        out = self._add_auth_queries(typ, [q], rbac, auth)
        out.extend(sel_auth)
        return out

    def _remove_node_reference(self, typ: str, qry: GQ,
                               auth: AuthState) -> list:
        """removeNodeReference (mutation_rewriter.go:1012)."""
        from dgraph_spark.graphql.ref_rewriter import _linked_fields

        deletes = []
        for fname, f, inv, inv_pred, is_rev in _linked_fields(self.s, typ):
            var = auth.vg.next(f.typ, False)
            qry.children.append(GQ(var=var,
                                   attr=self.s.pred_name(typ, fname)))
            ct = self.s.get(f.typ)
            inv_field = ct.fields.get(inv) if inv else None
            ref = {"uid": "uid(x)"}
            val = [ref] if (is_rev or (inv_field is not None
                                       and inv_field.is_list)) else ref
            deletes.append({"uid": f"uid({var})", inv_pred: val})
        return deletes


def rewrite_delete_mutation_with_auth(gql: str, schema: GQLSchema,
                                      auth_rules: dict, jwt: dict | None,
                                      variables: dict | None = None):
    return AuthDeleteRewriter(schema, auth_rules, jwt).rewrite_delete(
        gql, variables)


# ----------------------------------------------------- update mutations
class _VGAdapter:
    """Bridge the mutation VariableGenerator (xid-memoizing) to the
    auth module's (typ, auth_flag) calling convention — one shared
    counter, exactly like the reference's single VarGen."""

    def __init__(self, mvg):
        self.mvg = mvg

    def next(self, typ: str, auth: bool = False) -> str:
        return self.mvg.next(typ, "", "", auth=auth)


def rewrite_update_mutation_with_auth(gql: str, schema: GQLSchema,
                                      auth_rules: dict, jwt: dict | None,
                                      variables: dict | None = None,
                                      id_existence: dict | None = None):
    """UpdateRewriter.Rewrite with auth (mutation_rewriter.go:578 +
    query_rewriter.go RewriteUpsertQueryFromMutation/addAuthQueries):
    returns (dgquery_existence, mutations, dgquerysec)."""
    from dgraph_spark.graphql.mutation_rewriter import (
        UpdateMutationRewriter, _mutations_from_frag, _Errors as _MErrors,
        _wrap as _mwrap)

    vars_dollar = {("$" + k): v for k, v in (variables or {}).items()}
    urw = UpdateMutationRewriter(schema, vars_dollar)
    dgq, err = urw.rewrite_queries(gql)
    if err:
        return dgq, None, None, err
    arw = AuthRewriter(schema, auth_rules, jwt)
    auth = AuthState(arw.jwt, "update", urw.typ + "Root")
    auth.vg = _VGAdapter(urw.vg)
    payload = urw.op.get("fields") or []
    qf = next((f for f in payload
               if isinstance(f, dict) and f.get("fields") is not None
               and schema.field(urw.typ, "") is None
               and (f.get("name") in (urw.typ[:1].lower() + urw.typ[1:],
                                      urw.typ))), None)
    auth.has_auth_rules = False
    if qf is not None:
        auth.has_auth_rules = (
            arw.rule_for(urw.typ, "update") is not None
            or arw._has_auth_in_selection(urw.typ, qf.get("fields"),
                                          "update"))
    rbac = arw.static_eval(auth, urw.typ)

    def _delete_auth_hook(frag, target_var, ttyp):
        # addDelete auth tail (mutation_rewriter.go:2370): removing an
        # edge from a node of an update-auth type requires permission
        rn = arw.rule_for(ttyp, "update")
        if rn is None:
            return
        sub = AuthState(arw.jwt, "update", ttyp + "Root")
        sub.vg = auth.vg
        sub.is_writing_auth = True
        sub.var_name = target_var
        sub.has_auth_rules = True
        qrys, filt = arw._rewrite_rule_node(ttyp, rn, sub)
        if not qrys:
            return
        frag.queries.append({"attr": target_var,
                             "func": f"uid({target_var})",
                             "children": ["uid"]})
        frag.queries.append({"attr": target_var + ".auth",
                             "func": f"uid({target_var})", "filter": filt,
                             "children": ["uid"]})
        frag.queries.extend(qrys)

    urw.delete_auth_hook = _delete_auth_hook
    q = GQ(attr=urw.op["name"], var="x")
    if rbac == NEGATIVE:
        q.attr += "()"
        dg = [q]
    else:
        args = {k: urw.rw._resolve(v)
                for k, v in (urw.op.get("args") or {}).items()}
        filt = urw.filter
        ids = None
        idf = next((fn for fn, f in schema.get(urw.typ).fields.items()
                    if f.is_id), None)
        if filt and idf in filt:
            got = arw.rw._id_list(filt[idf])
            if got:
                ids = got
        q.children.append(GQ(attr="uid"))
        if ids and len(filt) == 1:
            q.func = f"uid({', '.join(ids)})"
            q.filter = _F("leaf", f"type({arw._dgname(urw.typ)})")
        else:
            q.func = (f"uid({', '.join(ids)})" if ids
                      else f"type({arw._dgname(urw.typ)})")
            arw._add_field_args(q, urw.typ, args, filt, skip_id=True)
        dg = arw._add_auth_queries(urw.typ, [q], rbac, auth)
    queries = dg
    src_uid = "uid(x)"
    obj_set = urw.set_arg if isinstance(urw.set_arg, dict) else None
    obj_del = urw.del_arg if isinstance(urw.del_arg, dict) else None
    if not obj_set and not obj_del:
        return dgq, [], "", None
    mutations = []
    errors: list[str] = []
    id_existence = dict(id_existence or {})
    for obj, mode, set_frag in ((obj_set, "update_set", True),
                                (obj_del, "update_remove", False)):
        if not obj:
            continue
        try:
            frag, _uv, errs = urw.rewrite_object(
                urw.typ, None, src_uid, obj, id_existence, mode)
        except _MErrors as ex:
            frag, errs = None, ex.msgs
        errors.extend(errs)
        if frag is not None:
            frag.conditions.append("gt(len(x), 0)")
            mutations.append(_mutations_from_frag(frag,
                                                  set_is_fragment=set_frag))
            for fq in frag.queries:
                queries.append(fq if isinstance(fq, GQ)
                               else _frag_query_to_gq(fq))
    err2 = _mwrap(errors) if errors else None
    return dgq, mutations, render_blocks(queries), err2


def _frag_query_to_gq(fq: dict) -> GQ:
    g = GQ(attr=fq.get("attr", "var"), var=fq.get("var") or "",
           func=fq.get("func") or "")
    if fq.get("filter"):
        g.filter = fq["filter"]
    for c in fq.get("children") or []:
        if isinstance(c, str):
            g.children.append(GQ(attr=c))
        else:
            cg = GQ(attr=c.get("attr", ""), var=c.get("var") or "")
            if c.get("filter"):
                cg.filter = c["filter"]
            g.children.append(cg)
    return g


# ------------------------------------------------------- add mutations
def rewrite_add_mutation_with_auth(gql: str, schema: GQLSchema,
                                   auth_rules: dict, jwt: dict | None,
                                   variables: dict | None = None,
                                   id_existence: dict | None = None):
    """AddRewriter.Rewrite with auth: upsert roots get the real
    update-selector auth chain; additional deletes carry per-edge auth
    checks. Returns (dgquery, mutations, dgquerysec, new_nodes, err)."""
    from dgraph_spark.graphql.mutation_rewriter import (
        AddMutationRewriter, _mutations_from_frag, _Errors as _MErrors,
        _wrap as _mwrap, _as_uid)

    vars_dollar = {("$" + k): v for k, v in (variables or {}).items()}
    arw_mut = AddMutationRewriter(schema, vars_dollar)
    dgq, err = arw_mut.rewrite_queries(gql)
    if err:
        return dgq, None, None, {}, err
    arw = AuthRewriter(schema, auth_rules, jwt)
    auth = AuthState(arw.jwt, "update", arw_mut.typ + "Root")
    auth.vg = _VGAdapter(arw_mut.vg)
    payload = arw_mut.op.get("fields") or []
    qf = next((f for f in payload
               if isinstance(f, dict) and f.get("fields") is not None), None)
    auth.has_auth_rules = qf is not None and (
        arw.rule_for(arw_mut.typ, "update") is not None
        or arw._has_auth_in_selection(arw_mut.typ, qf.get("fields"),
                                      "update"))

    def _delete_auth_hook(frag, target_var, ttyp):
        rn = arw.rule_for(ttyp, "update")
        if rn is None:
            return
        sub = AuthState(arw.jwt, "update", ttyp + "Root")
        sub.vg = auth.vg
        sub.is_writing_auth = True
        sub.var_name = target_var
        sub.has_auth_rules = True
        qrys, filt = arw._rewrite_rule_node(ttyp, rn, sub)
        if not qrys:
            return
        frag.queries.append({"attr": target_var,
                             "func": f"uid({target_var})",
                             "children": ["uid"]})
        frag.queries.append({"attr": target_var + ".auth",
                             "func": f"uid({target_var})", "filter": filt,
                             "children": ["uid"]})
        frag.queries.extend(qrys)

    arw_mut.delete_auth_hook = _delete_auth_hook
    mutation_type = "add_upsert" if arw_mut.upsert else "add"
    id_existence = dict(id_existence or {})
    queries: list[GQ] = []
    frags = []
    errors: list[str] = []
    new_nodes: dict[str, str] = {}
    for obj in arw_mut.inputs:
        try:
            frag, upsert_var, errs = arw_mut.rewrite_object(
                arw_mut.typ, None, "", obj, id_existence, mutation_type)
        except _MErrors as ex:
            frag, upsert_var, errs = None, "", ex.msgs
        errors.extend(errs)
        if upsert_var:
            rbac = arw.static_eval(auth, arw_mut.typ)
            if rbac == NEGATIVE:
                queries.append(GQ(attr=arw_mut.op["name"] + "()",
                                  var=upsert_var))
            else:
                q = GQ(attr=upsert_var, var=upsert_var)
                try:
                    uid = _as_uid(id_existence.get(upsert_var))
                    q.func = f"uid({uid:#x})"
                    q.filter = _F("leaf",
                                  f"type({arw._dgname(arw_mut.typ)})")
                    q.children.append(GQ(attr="uid"))
                    queries.extend(arw._add_auth_queries(
                        arw_mut.typ, [q], rbac, auth))
                except _MErrors:
                    queries.append(GQ(attr=arw_mut.op["name"] + "()",
                                      var=upsert_var))
            frag.conditions.append(f"gt(len({upsert_var}), 0)")
        if frag is not None:
            frags.append(frag)
            new_nodes.update(frag.new_nodes)
    mutations = []
    for frag in frags:
        mutations.append(_mutations_from_frag(frag, set_is_fragment=True))
        for fq in frag.queries:
            queries.append(fq if isinstance(fq, GQ)
                           else _frag_query_to_gq(fq))
    err2 = _mwrap(errors) if errors else None
    return dgq, mutations, render_blocks(queries), new_nodes, err2


def build_new_node_auth_query(schema: GQLSchema, auth_rules: dict,
                              jwt: dict | None, uids: dict,
                              new_nodes: dict) -> str | None:
    """authorizeNewNodes (resolve/mutation.go:598): the post-mutation
    check that every node created by an add/update passes its type's
    add-auth rules. Returns the check query text, '' when no auth
    applies, or raises _AuthFailed when RBAC statically denies."""
    arw = AuthRewriter(schema, auth_rules, jwt)
    vg = VarGen()
    by_type: dict[str, list[int]] = {}
    for var, typ in new_nodes.items():
        if var in uids:
            by_type.setdefault(typ, []).append(int(uids[var], 0))
    blocks: list[GQ] = []
    for typ in sorted(by_type):
        var_name = vg.next(typ, False)
        sub = AuthState(arw.jwt, "add", typ + "Root")
        sub.vg = vg
        sub.is_writing_auth = True
        sub.var_name = var_name
        sub.has_auth_rules = True
        rn = arw.rule_for(typ, "add")
        qrys, filt = arw._rewrite_rule_node(typ, rn, sub)
        rbac = rn.evaluate_static(arw.jwt) if rn is not None else UNCERTAIN
        if rbac == NEGATIVE:
            raise AuthFailedError("authorization failed")
        if rbac == POSITIVE or not qrys:
            continue
        typ_q = GQ(attr=typ, func=f"uid({var_name})")
        typ_q.filter = filt
        typ_q.children.append(GQ(attr="uid"))
        nodes = sorted(by_type[typ])
        var_q = GQ(attr="var", var=var_name,
                   func="uid(" + ", ".join(f"{u:#x}" for u in nodes) + ")")
        blocks.extend([typ_q, var_q] + qrys)
    if not blocks:
        return None
    return render_blocks(blocks)


class AuthFailedError(Exception):
    pass


# ------------------------------------------ post-mutation payload query
def rewrite_payload_query(gql: str, schema: GQLSchema, uids: list[str],
                          auth_rules: dict | None = None,
                          jwt: dict | None = None) -> str:
    """FromMutationResult -> rewriteAsQueryByIds: the query that fetches
    a mutation's payload selection over the mutated root uids
    (mutation_rewriter.go:751/805, query_rewriter.go:453)."""
    arw = AuthRewriter(schema, auth_rules or {}, jwt)
    doc = _parse_query(gql.replace("mutation", "query", 1))
    arw.frags = doc["frags"]
    arw._pwd_header = ""
    op = doc["ops"][0]
    m = re.match(r"(add|update|delete)(.+)", op["name"])
    prefix, typ = m.group(1), m.group(2)
    payload_type = prefix.capitalize() + typ + "Payload"
    qf = next((f for f in op.get("fields") or []
               if isinstance(f, dict) and f.get("fields") is not None), None)
    if qf is None:
        return ""
    alias = qf["alias"] or qf["name"]
    auth = AuthState(arw.jwt, "query", typ + "Root")
    auth.has_auth_rules = (
        arw.rule_for(typ, "query") is not None
        or arw._has_auth_in_selection(typ, qf.get("fields"), "query"))
    rbac = arw.static_eval(auth, typ)
    q = GQ(attr=f"{payload_type}.{alias}")
    if rbac == NEGATIVE:
        q.attr += "()"
        return render_blocks([q])
    ordered = [f"{int(u, 0):#x}" for u in uids]
    q.func = f"uid({', '.join(ordered)})"
    args = {k: arw.rw._resolve(v) for k, v in (qf.get("args") or {}).items()}
    filt = args.get("filter") if isinstance(args.get("filter"),
                                            dict) else None
    idf = next((fn for fn, f in schema.get(typ).fields.items()
                if f.is_id), None)
    if filt and idf in filt:
        ids = set(arw.rw._id_list(filt[idf]))
        inter = [u for u in ordered if u in ids]
        q.func = f"uid({', '.join(inter)})"
    arw._add_field_args(q, typ, args, filt, skip_id=False)
    sel_auth = arw._selection(q, typ, qf.get("fields") or [], auth)
    arw._add_uid(q)
    casc = arw.rw._cascade_arg(typ, qf.get("dirs"))
    if casc:
        q.cascade = (["__all__"] if casc == "@cascade"
                     else [c.strip() for c in
                           casc[len("@cascade("):-1].split(",")])
    # @cascade on the MUTATION itself (any form) propagates to the
    # payload re-query root as a bare @cascade
    if any(d["name"] == "cascade" for d in op.get("dirs") or []):
        q.cascade = ["__all__"]
    dg = arw._add_auth_queries(typ, [q], rbac, auth)
    dg.extend(sel_auth)
    return render_blocks(dg)
