"""GraphQL add/update mutation -> DQL upsert rewriting, reference-exact.

Ports the semantics of the reference's mutation rewriter
(graphql/resolve/mutation_rewriter.go) for add and update mutations:

- phase 1 (``rewrite_queries``): walk the input object depth-first and
  emit existence-check queries for every referenced ID and @id (XID)
  value (mutation_rewriter.go:265 AddRewriter.RewriteQueries, :315
  UpdateRewriter.RewriteQueries, :1813 existenceQueries).
- phase 2 (``rewrite``): given the existence results (variable name ->
  uid), build the upsert mutations — setjson/deletejson payloads with
  blank-node uids, ``dgraph.type`` arrays, inverse-edge maintenance and
  the additional-delete var blocks (mutation_rewriter.go:421 Rewrite,
  :1337 rewriteObject, :2168 addAdditionalDeletes).

Validated byte-for-byte (query text, cond) / JSON-equal (payloads)
against the reference's own 95-case add_mutation_test.yaml and 50-case
update_mutation_test.yaml corpora (tests/test_graphql_rewrite.py).
"""

from __future__ import annotations

import json

from dgraph_spark.graphql.ref_rewriter import Rewriter, _F, _parse_query
from dgraph_spark.graphql.sdl import GField, GQLSchema

_GEO_TYPES = ("Point", "Polygon", "MultiPolygon")

# Injectable clock for @default(add/update: {value: "$now"}).  The
# reference substitutes time.Now() in production and pins the constant
# "2000-01-01T00:00:00.00Z" only under `go test`
# (graphql/schema/wrappers.go:2355).  Golden-parity tests call
# set_now_clock(GOLDEN_NOW) to pin it; production gets real UTC time.
GOLDEN_NOW = "2000-01-01T00:00:00.00Z"
_now_clock = None  # Callable[[], str] | None


def set_now_clock(value) -> None:
    """Pin (str or callable) or reset (None) the `$now` clock."""
    global _now_clock
    _now_clock = (lambda: value) if isinstance(value, str) else value


def _now_rfc3339() -> str:
    if _now_clock is not None:
        return _now_clock()
    import datetime
    return (datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%S.%f")[:-4] + "Z")


class _Errors(Exception):
    """Accumulated rewrite errors; message already reference-formatted."""

    def __init__(self, msgs: list[str]):
        super().__init__("\n".join(msgs))
        self.msgs = msgs


def _wrap(msgs: list[str]) -> str:
    # schema.GQLWrapf(errs, "failed to rewrite mutation payload") wraps
    # EACH error; GqlErrorList joins with newlines
    return "\n".join("failed to rewrite mutation payload because " + m
                     for m in msgs)


def _quote(s: str) -> str:
    """Go %q on a string (existence-query eq argument)."""
    return json.dumps(s, ensure_ascii=False)


# ---------------------------------------------------------------- schema ops
def _id_field(schema: GQLSchema, typ: str) -> GField | None:
    t = schema.types.get(typ)
    if t is None:
        return None
    return next((f for f in t.fields.values() if f.is_id), None)


def _xid_fields(schema: GQLSchema, typ: str) -> list[GField]:
    """@id fields (plus external ID fields), sorted by name — wrappers.go
    XIDFields sorts for consistency."""
    t = schema.types.get(typ)
    if t is None:
        return []
    out = [f for f in t.fields.values()
           if f.has_id_directive or (f.external and f.is_id)]
    return sorted(out, key=lambda f: f.name)


def _pred(schema: GQLSchema, typ: str, fname: str) -> str:
    t = schema.types.get(typ)
    if t is not None and t.secret_field == fname:
        return f"{typ}.{fname}"
    p = schema.pred_name(typ, fname)
    if p.startswith("<") and p.endswith(">"):
        p = p[1:-1]
    return p


def _dgraph_types(schema: GQLSchema, typ: str) -> list[str]:
    t = schema.get(typ)
    return [typ] + list(t.interfaces)


class _Src:
    """The srcField context of rewriteObject/existenceQueries: which
    field of which parent we descended through, and the (possibly
    union-member-narrowed) target type."""

    __slots__ = ("owner", "fname", "f", "target")

    def __init__(self, owner: str, fname: str, f: GField, target: str | None = None):
        self.owner = owner
        self.fname = fname
        self.f = f
        self.target = target or f.typ


def _inverse(schema: GQLSchema, src: _Src | None):
    """(inv_fname, inv_GField) of src's @hasInverse pair on the target
    type, or None (FieldDefinition.Inverse() — the directive is present
    on either side after schema completion, so look both ways)."""
    if src is None:
        return None
    tt = schema.types.get(src.target)
    if tt is None or tt.kind not in ("type", "interface"):
        return None
    if src.f.inverse:
        g = tt.fields.get(src.f.inverse)
        if g is not None:
            return (src.f.inverse, g)
        return None
    for gname, g in tt.fields.items():
        if g.inverse == src.fname and (
                g.typ == src.owner
                or src.owner in getattr(schema.types.get(g.typ), "interfaces", [])
                or g.typ in schema.get(src.owner).interfaces):
            return (gname, g)
    return None


def _originated_from(schema: GQLSchema, typ: str, fname: str):
    """(origin type name, inherited-from-interface?) — wrappers.go
    FieldOriginatedFrom."""
    f = schema.field(typ, fname)
    if f is None:
        return typ, False
    owner = f.owner or typ
    t = schema.types.get(owner)
    return owner, (owner != typ and t is not None and t.kind == "interface")


class VarGen:
    """mutation_rewriter.go:112 VariableGenerator — `Type_N` counters
    with per-(origin-type, xid-name, xid-value) memoization."""

    def __init__(self, schema: GQLSchema):
        self.s = schema
        self.counter = 0
        self.xid_map: dict[str, str] = {}

    def next(self, typ: str, xid_name: str = "", xid_val: str = "",
             auth: bool = False) -> str:
        flag = xid_name
        if "." in flag:
            xid_name = flag.split(".")[1]
        key = None
        if xid_name and xid_val:
            origin, _ = _originated_from(self.s, typ, xid_name)
            key = f"{origin}.{flag}.{xid_val}"
            if key in self.xid_map:
                return self.xid_map[key]
        self.counter += 1
        name = (f"{typ}_Auth{self.counter}" if auth
                else f"{typ}_{self.counter}")
        if key:
            self.xid_map[key] = name
        return name


class _XidMeta:
    def __init__(self):
        self.variable_obj_map: dict[str, dict] = {}
        self.seen_at_top: dict[str, bool] = {}
        self.seen_uids: dict[str, bool] = {}

    def is_duplicate(self, at_top: bool, var: str, new_obj: dict,
                     schema: GQLSchema, src: _Src | None) -> bool:
        if at_top and self.seen_at_top.get(var):
            return True
        if src is not None:
            inv = _inverse(schema, src)
            if inv is not None and not inv[1].is_list:
                return True
        old = self.variable_obj_map.get(var)
        if len(new_obj) > 1 and old is not None and len(old) > 1 and old != new_obj:
            return True
        return False


def _extract_val(xid_val, xid_name: str, type_name: str) -> str:
    if type_name == "Int":
        if isinstance(xid_val, int) and not isinstance(xid_val, bool):
            return str(xid_val)
        raise _Errors([f"encountered an XID {xid_name} with {type_name} that "
                       f"isn't a Int but data type in schema is Int"])
    if type_name == "Int64":
        if isinstance(xid_val, int) and not isinstance(xid_val, bool):
            return str(xid_val)
        if isinstance(xid_val, str):
            return xid_val
        raise _Errors([f"encountered an XID {xid_name} with {type_name} that "
                       f"isn't a Int64 but data type in schema is Int64"])
    if type_name in ("String", "ID"):
        if isinstance(xid_val, str):
            return xid_val
        raise _Errors([f"encountered an XID {xid_name} with {type_name} that "
                       f"isn't a String"])
    raise _Errors([f"encountered an XID {xid_name} with {type_name} that "
                   f"isn'tallowed as Xid"])


def _as_uid(val) -> int:
    if val is None:
        raise _Errors(["ID value was null"])
    try:
        if isinstance(val, str):
            return int(val, 0)
    except ValueError:
        pass
    raise _Errors([f"ID argument ({val}) was not able to be parsed"])


def _geo_obj(schema: GQLSchema, val: dict, typ: str):
    def pt(p):
        return [p["longitude"], p["latitude"]]

    def poly(v):
        return [[pt(p) for p in ring["points"]] for ring in v["coordinates"]]

    if typ == "Point":
        coords = pt(val)
    elif typ == "Polygon":
        coords = poly(val)
    else:
        coords = [poly(p) for p in val["polygons"]]
    return {"type": typ, "coordinates": coords}


class _Frag:
    """mutationFragment — the partially-built mutation payload plus its
    companion queries / deletes / upsert conditions."""

    def __init__(self, fragment):
        self.fragment = fragment
        self.queries: list[dict] = []
        self.conditions: list[str] = []
        self.deletes: list = []
        self.new_nodes: dict[str, str] = {}


def _render_blocks(blocks: list[dict]) -> str:
    if not blocks:
        return ""
    lines = ["query {"]
    for b in blocks:
        head = "  "
        if b.get("var"):
            head += f"{b['var']} as "
        head += b["attr"]
        if b.get("func"):
            head += f"(func: {b['func']})"
        if b.get("filter"):
            head += f" @filter({b['filter']})"
        kids = b.get("children") or []
        if kids:
            lines.append(head + " {")
            for c in kids:
                if isinstance(c, str):
                    lines.append("    " + c)
                else:
                    ln = "    "
                    if c.get("var"):
                        ln += f"{c['var']} as "
                    ln += c["attr"]
                    if c.get("filter"):
                        ln += f" @filter({c['filter']})"
                    lines.append(ln)
            lines.append("  }")
        else:
            lines.append(head)
    lines.append("}")
    return "\n".join(lines)


class _MutRewriter:
    """Shared machinery of the Add/Update rewriters."""

    def __init__(self, schema: GQLSchema, variables: dict | None = None):
        self.s = schema
        self.rw = Rewriter(schema, variables)
        self.vg = VarGen(schema)
        self.meta = _XidMeta()
        self.errors: list[str] = []
        # optional: auth layer appends per-delete auth check blocks
        # (mutation_rewriter.go:2370 addDelete auth tail)
        self.delete_auth_hook = None

    # ------------------------------------------------------------ parsing
    def _deep(self, v):
        v = self.rw._resolve(v)
        if isinstance(v, tuple):
            return v[1]  # ("enum", name)
        if isinstance(v, dict):
            return {k: self._deep(x) for k, x in v.items()}
        if isinstance(v, list):
            return [self._deep(x) for x in v]
        return v

    def _parse(self, gql: str) -> dict:
        doc = _parse_query(gql.replace("mutation", "query", 1))
        return doc["ops"][0]

    def _mutated_type(self, mname: str, prefix: str) -> str:
        rest = mname[len(prefix):]
        if rest in self.s.types:
            return rest
        low = rest[:1].lower() + rest[1:]
        if low in self.s.types:
            return low
        return rest

    # --------------------------------------------------- inverse plumbing
    def _delete_inverse_object(self, obj: dict, src: _Src | None) -> None:
        inv = _inverse(self.s, src)
        if inv is not None and not inv[1].is_list:
            obj.pop(inv[0], None)

    def _add_inverse_link(self, new_obj: dict, src: _Src | None,
                          src_uid: str) -> None:
        inv = _inverse(self.s, src)
        if src is None or inv is None:
            return
        inv_name, inv_f = inv
        pred = _pred(self.s, src.target, inv_name)
        ref = {"uid": src_uid}
        new_obj[pred] = [ref] if inv_f.is_list else ref

    def _add_additional_deletes(self, frag: _Frag, src: _Src | None,
                                src_uid: str, variable: str) -> None:
        inv = _inverse(self.s, src)
        if src is None or inv is None:
            return
        inv_name, inv_f = inv
        inv_src = _Src(src.target, inv_name, inv_f)
        self._add_delete(frag, variable, src_uid, inv_src, src)
        self._add_delete(frag, src_uid, variable, src, inv_src)

    def _add_delete(self, frag: _Frag, qry_var: str, exclude_var: str,
                    qry_fld: _Src, del_fld: _Src) -> None:
        # only for singular edges (mutation_rewriter.go:2228 addDelete)
        if qry_fld.f.is_list:
            return
        if qry_var.startswith("_:"):
            return
        if qry_var.startswith("uid("):
            qry_var = qry_var[4:-1]
        target_var = self.vg.next(qry_fld.target)
        del_fld_name = _pred(self.s, qry_fld.target, del_fld.fname)
        child_attr = _pred(self.s, del_fld.target, qry_fld.fname)
        exclude = exclude_var
        if exclude.startswith("uid("):
            exclude = exclude[4:-1]
        filt = None
        if not exclude_var.startswith("_:"):
            filt = f"NOT (uid({exclude}))"
        frag.queries.append({
            "attr": "var", "func": f"uid({qry_var})",
            "children": [{"var": target_var, "attr": child_attr,
                          "filter": filt}],
        })
        try:
            _as_uid(qry_var)
            del_ref = qry_var
        except _Errors:
            del_ref = f"uid({qry_var})"
        ref = {"uid": del_ref}
        frag.deletes.append({
            "uid": f"uid({target_var})",
            del_fld_name: [ref] if del_fld.f.is_list else ref,
        })
        if self.delete_auth_hook is not None:
            self.delete_auth_hook(frag, target_var, qry_fld.target)

    # ------------------------------------------------- existence queries
    def _interface_variable(self, typ: str, xid: GField, xid_string: str):
        origin, inherited = _originated_from(self.s, typ, xid.name)
        if inherited and xid.id_interface_arg:
            return origin, self.vg.next(typ, "Int." + xid.name, xid_string)
        return None, ""

    def _xid_exists_query(self, var: str, xid_string: str, xid_name: str,
                          typ: str) -> dict:
        return {"var": None, "attr": var,
                "func": f"eq({_pred(self.s, typ, xid_name)}, {_quote(xid_string)})",
                "children": ["uid", "dgraph.type"]}

    def existence_queries(self, typ: str, src: _Src | None,
                          obj: dict) -> tuple[list[dict], list[str]]:
        at_top = src is None
        ret: list[dict] = []
        errs: list[str] = []

        self._delete_inverse_object(obj, src)

        idf = _id_field(self.s, typ)
        if idf is not None and idf.name in obj:
            id_val = obj[idf.name]
            if id_val is not None:
                if self.meta.seen_uids.get(id_val):
                    return ret, errs
                self.meta.seen_uids[id_val] = True
                var = self.vg.next(typ, idf.name, id_val)
                try:
                    uid = _as_uid(id_val)
                except _Errors as e:
                    return ret, errs + e.msgs
                ret.append({"var": None, "attr": var, "func": f"uid({uid:#x})",
                            "children": ["uid", "dgraph.type"]})
                return ret, errs
            del obj[idf.name]

        for xid in _xid_fields(self.s, typ):
            xid_val = obj.get(xid.name)
            if xid.name in obj and xid_val is not None:
                try:
                    xid_string = _extract_val(xid_val, xid.name, xid.typ)
                except _Errors as e:
                    return [], errs + e.msgs
                var = self.vg.next(typ, xid.name, xid_string)
                if var in self.meta.variable_obj_map:
                    if self.meta.is_duplicate(at_top, var, obj, self.s, src):
                        return [], errs + [f"duplicate XID found: {xid_string}"]
                    old = self.meta.variable_obj_map[var]
                    if len(old) == 1 and len(obj) > 1:
                        self.meta.variable_obj_map[var] = obj
                    else:
                        return ret, errs  # pure reference, stop descending
                else:
                    self.meta.variable_obj_map[var] = obj
                    self.meta.seen_at_top[var] = at_top
                    ret.append(self._xid_exists_query(var, xid_string,
                                                      xid.name, typ))
                    iface, ivar = self._interface_variable(typ, xid, xid_string)
                    if iface is not None:
                        ret.append(self._xid_exists_query(
                            ivar, xid_string, xid.name, typ))

        for field in sorted(obj):
            val = obj[field]
            fdef = self.s.field(typ, field)
            fname = _pred(self.s, typ, field)
            ftyp = self.s.types.get(fdef.typ) if fdef is not None else None
            if (fdef is not None and fdef.is_list and val is not None
                    and not isinstance(val, list)):
                val = obj[field] = [val]  # GraphQL list-input coercion
            if not isinstance(val, (dict, list)):
                # scalar: @id fields cannot carry empty values
                if (fdef is not None and fdef.has_id_directive and val == ""):
                    return [], errs + [
                        f"encountered an empty value for @id field `{fname}`"]
                continue
            # geo-valued and scalar/unknown-typed fields hold plain
            # structures — nothing inside can be an ID/XID reference
            if fdef is None or ftyp is None or fdef.typ in _GEO_TYPES:
                continue
            if isinstance(val, dict):
                if ftyp is not None and ftyp.kind == "union":
                    q, e = self._existence_union(typ, field, fdef, val, -1)
                else:
                    q, e = self.existence_queries(
                        fdef.typ, _Src(typ, field, fdef), val)
                ret.extend(q)
                errs.extend(e)
            elif isinstance(val, list):
                for i, item in enumerate(val):
                    if not isinstance(item, dict):
                        continue
                    if ftyp is not None and ftyp.kind == "union":
                        q, e = self._existence_union(typ, field, fdef, item, i)
                    else:
                        q, e = self.existence_queries(
                            fdef.typ, _Src(typ, field, fdef), item)
                    ret.extend(q)
                    errs.extend(e)
        return ret, errs

    def _union_member(self, parent_typ: str, field: str, fdef: GField,
                      obj: dict, list_index: int):
        if len(obj) != 1:
            if list_index >= 0:
                raise _Errors([
                    f"value for field `{field}` in type `{parent_typ}` index "
                    f"`{list_index}` must have exactly one child, found "
                    f"{len(obj)} children"])
            raise _Errors([
                f"value for field `{field}` in type `{parent_typ}` must have "
                f"exactly one child, found {len(obj)} children"])
        member_ref, member_val = next(iter(obj.items()))
        member = member_ref[:1].upper() + member_ref[1:-3]
        return _Src(parent_typ, field, fdef, target=member), member_val

    def _existence_union(self, parent_typ: str, field: str, fdef: GField,
                         obj: dict, list_index: int):
        try:
            src, val = self._union_member(parent_typ, field, fdef, obj,
                                          list_index)
        except _Errors as e:
            return [], e.msgs
        return self.existence_queries(src.target, src, val)

    # --------------------------------------------------- rewrite objects
    def _as_id_reference(self, val, src: _Src, src_uid: str,
                         is_remove: bool) -> _Frag:
        result = {"uid": val}
        frag = _Frag(result)
        self._add_inverse_link(result, src, src_uid)
        if not is_remove:
            self._add_additional_deletes(frag, src, src_uid, val)
        return frag

    def rewrite_object(self, typ: str, src: _Src | None, src_uid: str,
                       obj: dict, id_existence: dict,
                       mutation_type: str) -> tuple[_Frag | None, str, list[str]]:
        """mutation_rewriter.go:1337 rewriteObject. mutation_type is one
        of 'add', 'add_upsert', 'update_set', 'update_remove'."""
        upsert_var = ""
        at_top = src is None
        errs: list[str] = []
        variable = ""
        s = self.s

        idf = _id_field(s, typ)
        if idf is not None and idf.name in obj:
            id_val = obj[idf.name]
            variable = self.vg.next(typ, idf.name, id_val)
            if variable in id_existence:
                if at_top:
                    if s.get(typ).has_auth:
                        errs.append(f"GraphQL debug: id already exists for "
                                    f"type {typ}")
                    else:
                        errs.append(f"id {id_val} already exists for type {typ}")
                    return None, upsert_var, errs
                return (self._as_id_reference(
                    id_val, src, src_uid,
                    mutation_type == "update_remove"), upsert_var, [])
            errs.append(f'ID "{id_val}" isn\'t a '
                        f'{src.target if src is not None else typ}')
            return None, upsert_var, errs

        xids = _xid_fields(s, typ)
        if xids:
            multiple = self._got_multiple_existing(xids, obj, typ, id_existence)
            existence_error = ("multiple nodes found for given xid values,"
                              " updation not possible")
            xid_variables: list[str] = []
            for xid in xids:
                xid_val = obj.get(xid.name)
                if xid.name in obj and xid_val is not None:
                    xid_string = _extract_val(xid_val, xid.name, xid.typ)
                    variable = self.vg.next(typ, xid.name, xid_string)
                    iface, ivar = self._interface_variable(typ, xid, xid_string)
                    iface_exists = ivar in id_existence if ivar else False
                    typ_uid = id_existence.get(variable)
                    if iface_exists or typ_uid is not None:
                        if at_top:
                            if mutation_type == "add_upsert":
                                if multiple:
                                    return None, "", errs + [existence_error]
                                if typ_uid is not None:
                                    upsert_var = variable
                                    src_uid = f"uid({variable})"
                                else:
                                    return None, "", errs + [
                                        self._xid_iface_error(typ, xid_string,
                                                              xid, iface)]
                            else:
                                if typ_uid is not None:
                                    if s.get(typ).has_auth:
                                        errs.append(
                                            f"GraphQL debug: id {xid_string} "
                                            f"already exists for field "
                                            f"{xid.name} inside type {typ}")
                                    else:
                                        errs.append(
                                            f"id {xid_string} already exists "
                                            f"for field {xid.name} inside "
                                            f"type {typ}")
                                    return None, upsert_var, errs
                                return None, upsert_var, errs + [
                                    self._xid_iface_error(typ, xid_string,
                                                          xid, iface)]
                        else:
                            if multiple:
                                return None, "", errs + [existence_error]
                            if typ_uid is not None:
                                return (self._as_id_reference(
                                    typ_uid, src, src_uid,
                                    mutation_type == "update_remove"),
                                    upsert_var, [])
                            return None, upsert_var, errs + [
                                self._xid_iface_error(typ, xid_string, xid,
                                                      iface)]
                    else:
                        xid_variables.append(variable)

            if xid_variables:
                exclude = ""
                if src is not None:
                    inv = _inverse(s, src)
                    if inv is not None:
                        exclude = inv[0]
                obj = self.meta.variable_obj_map[xid_variables[0]]
                err = self._ensure_non_nulls(typ, obj, exclude)
                if err is not None and not (mutation_type == "update_set"
                                            and at_top):
                    return None, upsert_var, errs + [err]
                for xv in xid_variables:
                    id_existence[xv] = f"_:{variable}"

            if upsert_var == "":
                for xid in xids:
                    if xid.name in obj and obj[xid.name] is not None:
                        continue
                    if ((mutation_type in ("add", "add_upsert") or not at_top)
                            and xid.nonnull
                            and xid.typ in ("String", "Int", "Int64")):
                        return None, upsert_var, errs + [
                            f"field {xid.name} cannot be empty"]

        action = "update"
        if variable == "":
            variable = self.vg.next(typ)
        my_uid = f"_:{variable}"
        new_obj: dict = {}

        if (mutation_type not in ("add", "add_upsert") and at_top) \
                or upsert_var != "":
            new_obj["uid"] = src_uid
            my_uid = src_uid
        elif mutation_type == "update_remove":
            return None, upsert_var, errs + ["id is not provided"]
        else:
            new_obj["dgraph.type"] = _dgraph_types(s, typ)
            new_obj["uid"] = my_uid
            action = "add"

        for f in s.get(typ).fields.values():
            p = _pred(s, typ, f.name)
            if new_obj.get(p) is not None:
                continue
            dv = f.default_add if action == "add" else f.default_update
            if dv is not None:
                new_obj[p] = (_now_rfc3339() if dv == "$now" else dv)

        self._delete_inverse_object(obj, src)
        self._add_inverse_link(new_obj, src, src_uid)

        frag = _Frag(new_obj)
        frag.new_nodes[variable] = typ

        def from_children(child: _Frag):
            frag.new_nodes.update(child.new_nodes)
            frag.queries.extend(child.queries)
            frag.deletes.extend(child.deletes)

        for field in sorted(obj):
            val = obj[field]
            fdef = s.field(typ, field)
            fname = _pred(s, typ, field)
            ftyp = s.types.get(fdef.typ) if fdef is not None else None
            if (fdef is not None and fdef.is_list and val is not None
                    and not fdef.is_embedding
                    and not isinstance(val, list)):
                val = obj[field] = [val]  # GraphQL list-input coercion
            if fdef is not None and fdef.is_embedding:
                val = json.dumps(val, separators=(",", ":"))
            if isinstance(val, dict):
                if ftyp is not None and ftyp.kind == "union":
                    cf, err = self._rewrite_union(typ, field, fdef, my_uid,
                                                  val, id_existence,
                                                  mutation_type, -1)
                    if cf is not None:
                        new_obj[fname] = cf.fragment
                        from_children(cf)
                    errs.extend(err)
                elif fdef is not None and fdef.typ in _GEO_TYPES:
                    new_obj[fname] = _geo_obj(s, val, fdef.typ)
                else:
                    cf, _uv, err = self.rewrite_object(
                        fdef.typ, _Src(typ, field, fdef), my_uid, val,
                        id_existence, mutation_type)
                    if cf is not None:
                        new_obj[fname] = cf.fragment
                        from_children(cf)
                    errs.extend(err)
            elif isinstance(val, list):
                frags: list = []
                for item in val:
                    if isinstance(item, dict):
                        if ftyp is not None and ftyp.kind == "union":
                            cf, err = self._rewrite_union(
                                typ, field, fdef, my_uid, item, id_existence,
                                mutation_type, -1)
                        elif fdef is not None and fdef.typ in _GEO_TYPES:
                            cf, err = _Frag(_geo_obj(s, item, fdef.typ)), []
                        else:
                            cf, _uv, err = self.rewrite_object(
                                fdef.typ, _Src(typ, field, fdef), my_uid,
                                item, id_existence, mutation_type)
                        if cf is not None:
                            frags.append(cf.fragment)
                            from_children(cf)
                        errs.extend(err)
                    else:
                        frags.append(item)
                if new_obj.get(fname) is not None and isinstance(
                        new_obj.get(fname), list):
                    new_obj[fname] = new_obj[fname] + frags
                else:
                    new_obj[fname] = frags
            else:
                new_obj[fname] = val

        return frag, upsert_var, errs

    def _rewrite_union(self, parent_typ: str, field: str, fdef: GField,
                       src_uid: str, obj: dict, id_existence: dict,
                       mutation_type: str, list_index: int):
        try:
            src, val = self._union_member(parent_typ, field, fdef, obj,
                                          list_index)
        except _Errors as e:
            return None, e.msgs
        frag, _uv, errs = self.rewrite_object(src.target, src, src_uid, val,
                                              id_existence, mutation_type)
        return frag, errs

    def _xid_iface_error(self, typ: str, xid_string: str, xid: GField,
                         iface: str | None) -> str:
        if self.s.get(typ).has_auth:
            return (f"GraphQL debug: id {xid_string} already exists for field "
                    f"{xid.name} in some other implementing type of "
                    f"interface {iface}")
        return (f"id {xid_string} already exists for field {xid.name} in some "
                f"other implementing type of interface {iface}")

    def _got_multiple_existing(self, xids: list[GField], obj: dict, typ: str,
                               id_existence: dict) -> bool:
        seen_uid = ""
        for xid in xids:
            xid_val = obj.get(xid.name)
            if xid.name in obj and xid_val is not None:
                xid_string = _extract_val(xid_val, xid.name, xid.typ)
                var = self.vg.next(typ, xid.name, xid_string)
                uid = id_existence.get(var)
                if uid is not None:
                    if seen_uid == "":
                        seen_uid = uid
                    elif seen_uid != uid:
                        return True
        return False

    def _ensure_non_nulls(self, typ: str, obj: dict,
                          exclusion: str) -> str | None:
        t = self.s.get(typ)
        for f in t.fields.values():
            if (f.nonnull and not f.is_id and f.default_add is None
                    and f.default_update is None and f.name != exclusion
                    and not f.custom and not f.lambda_):
                if obj.get(f.name) is None:
                    return (f"type {typ} requires a value for field {f.name}, "
                            f"but no value present")
        return None

    # ----------------------------------------- upsert-root query (shared)
    def _auth_allocations(self, typ: str) -> None:
        """addAuthQueries (query_rewriter.go:1032) burns variable names
        even when the schema has no auth rules: one for the type, one per
        implementing type of an interface. Replicated for exact `Type_N`
        numbering parity."""
        self.vg.next(typ)
        t = self.s.types.get(typ)
        if t is not None and t.kind == "interface":
            for impl in self.s.implementers(typ):
                self.vg.next(impl)

    def _root_query_from_filter(self, typ: str, attr: str, var: str,
                                filt: dict) -> dict:
        """RewriteUpsertQueryFromMutation with nodeID == '' — uid func
        from the filter's id list, else type func; rest of the filter
        plus the type filter rendered like the delete rewriter."""
        rw = self.rw
        type_leaf = _F("leaf", f"type({typ})")
        idf = next((fn for fn, f in self.s.get(typ).fields.items()
                    if f.is_id), None)
        if isinstance(filt, dict) and idf in filt:
            ids = rw._id_list(filt[idf])
            rest = {k: v for k, v in filt.items() if k != idf}
            tree = rw._filter_obj(typ, rest) if rest else None
            func = f"uid({', '.join(ids)})"
            full = _F("and", kids=[tree, type_leaf]) if tree else type_leaf
        else:
            func = f"type({typ})"
            full = rw._filter_obj(typ, filt) if filt else None
        return {"var": var, "attr": attr, "func": func,
                "filter": full.render() if full is not None else None,
                "children": ["uid"]}


def _mutations_from_frag(frag: _Frag, set_is_fragment: bool) -> dict:
    m: dict = {}
    cond = ""
    if frag.conditions:
        cond = "@if(" + " AND ".join(frag.conditions) + ")"
    if set_is_fragment:
        m["setjson"] = frag.fragment
        if frag.deletes:
            m["deletejson"] = frag.deletes
    else:
        m["deletejson"] = frag.fragment
    m["cond"] = cond
    return m


class AddMutationRewriter(_MutRewriter):
    """addT(input: [...], upsert: bool) — AddRewriter."""

    def rewrite_queries(self, gql: str) -> tuple[str, str | None]:
        op = self._parse(gql)
        self.op = op
        self.typ = self._mutated_type(op["name"], "add")
        val = self._deep(op["args"].get("input"))
        if not isinstance(val, list):
            val = [val] if val is not None else []
        self.inputs = val
        upsert = self.rw._resolve(op["args"].get("upsert"))
        self.upsert = bool(upsert) if not isinstance(upsert, tuple) else False
        ret: list[dict] = []
        errors: list[str] = []
        for obj in val:
            try:
                q, e = self.existence_queries(self.typ, None, obj)
            except _Errors as ex:
                q, e = [], ex.msgs
            ret.extend(q)
            errors.extend(e)
        if errors:
            return _render_blocks(ret), _wrap(errors)
        return _render_blocks(ret), None

    def rewrite(self, id_existence: dict) -> tuple[list[dict], str, str | None]:
        mutation_type = "add_upsert" if self.upsert else "add"
        queries: list[dict] = []
        frags: list[_Frag] = []
        errors: list[str] = []
        for obj in self.inputs:
            try:
                frag, upsert_var, errs = self.rewrite_object(
                    self.typ, None, "", obj, id_existence, mutation_type)
            except _Errors as ex:
                frag, upsert_var, errs = None, "", ex.msgs
            errors.extend(errs)
            if upsert_var:
                self._auth_allocations(self.typ)
                try:
                    uid = _as_uid(id_existence.get(upsert_var))
                    queries.append({
                        "var": upsert_var, "attr": upsert_var,
                        "func": f"uid({uid:#x})", "filter": f"type({self.typ})",
                        "children": ["uid"]})
                except _Errors:
                    queries.append({"var": upsert_var,
                                    "attr": self.op["name"] + "()"})
                frag.conditions.append(f"gt(len({upsert_var}), 0)")
            if frag is not None:
                frags.append(frag)
        mutations = []
        for frag in frags:
            mutations.append(_mutations_from_frag(frag, set_is_fragment=True))
            queries.extend(frag.queries)
        err = _wrap(errors) if errors else None
        return mutations, _render_blocks(queries), err


class UpdateMutationRewriter(_MutRewriter):
    """updateT(input: {filter, set, remove}) — UpdateRewriter."""

    def rewrite_queries(self, gql: str) -> tuple[str, str | None]:
        op = self._parse(gql)
        self.op = op
        self.typ = self._mutated_type(op["name"], "update")
        inp = self._deep(op["args"].get("input")) or {}
        self.filter = inp.get("filter") or {}
        self.set_arg = inp.get("set")
        self.del_arg = inp.get("remove")
        ret: list[dict] = []
        errors: list[str] = []
        for arg in (self.set_arg, self.del_arg):
            if arg is not None and isinstance(arg, dict) and len(arg) != 0:
                try:
                    q, e = self.existence_queries(self.typ, None, arg)
                except _Errors as ex:
                    q, e = [], ex.msgs
                ret.extend(q)
                errors.extend(e)
        if errors:
            return _render_blocks(ret), _wrap(errors)
        return _render_blocks(ret), None

    def rewrite(self, id_existence: dict) -> tuple[list[dict], str, str | None]:
        queries: list[dict] = []
        errors: list[str] = []
        self._auth_allocations(self.typ)
        queries.append(self._root_query_from_filter(
            self.typ, self.op["name"], "x", self.filter))
        src_uid = "uid(x)"
        obj_set = self.set_arg if isinstance(self.set_arg, dict) else None
        obj_del = self.del_arg if isinstance(self.del_arg, dict) else None
        if ((self.set_arg is None or (obj_set is not None and not obj_set))
                and (self.del_arg is None
                     or (obj_del is not None and not obj_del))):
            return [], "", None
        set_frag = del_frag = None
        if obj_set:
            try:
                set_frag, _uv, errs = self.rewrite_object(
                    self.typ, None, src_uid, obj_set, id_existence,
                    "update_set")
            except _Errors as ex:
                set_frag, errs = None, ex.msgs
            errors.extend(errs)
        if obj_del:
            try:
                del_frag, _uv, errs = self.rewrite_object(
                    self.typ, None, src_uid, obj_del, id_existence,
                    "update_remove")
            except _Errors as ex:
                del_frag, errs = None, ex.msgs
            errors.extend(errs)
        mutations = []
        if set_frag is not None:
            set_frag.conditions.append("gt(len(x), 0)")
            mutations.append(_mutations_from_frag(set_frag,
                                                  set_is_fragment=True))
            queries.extend(set_frag.queries)
        if del_frag is not None:
            del_frag.conditions.append("gt(len(x), 0)")
            mutations.append(_mutations_from_frag(del_frag,
                                                  set_is_fragment=False))
            queries.extend(del_frag.queries)
        err = _wrap(errors) if errors else None
        if not mutations:
            return [], "", err
        return mutations, _render_blocks(queries), err
