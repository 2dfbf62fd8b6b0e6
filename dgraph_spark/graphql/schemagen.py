"""GraphQL API schema generation — reference-exact.

Given a user SDL schema, generates the complete query/mutation/aggregate
API schema the reference serves, byte-for-byte equal to the reference's
generator (graphql/schema/gqlschema.go completeSchema:940 +
Stringify:2809, pipeline graphql/schema/schemagen.go:313 NewHandler).
Validated against the reference's public schemagen golden corpus
(graphql/schema/testdata/schemagen/ input/output pairs) in
tests/test_schemagen.py.

Structure:
- a small SDL parser that keeps everything printing needs (descriptions,
  directive argument values with their value kinds, field arguments);
- the completion algorithm (filters, orderables, refs, patches, payloads,
  aggregates, queries, mutations, unions, apollo federation);
- the printer (generate*String twins, gqlparser Value.String semantics,
  Go strconv.Quote string escaping).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from dgraph_spark.graphql.schema_boilerplate import (
    apolloSchemaExtras,
    apolloSchemaQueries,
    apolloSupportedDirectiveDefs,
    directiveDefs,
    filterInputs,
    schemaInputs,
)

# ============================================================== AST

OBJECT = "OBJECT"
INTERFACE = "INTERFACE"
UNION = "UNION"
ENUM = "ENUM"
INPUT = "INPUT_OBJECT"
SCALAR = "SCALAR"


@dataclass
class TypeRef:
    named: str | None = None          # named type (mutually exclusive w/ elem)
    elem: "TypeRef | None" = None     # list element
    nonnull: bool = False

    def name(self) -> str:
        if self.named is not None:
            # the reference stores pre-bracketed names like "[AddTInput!]"
            return self.named.strip("[]!")
        return self.elem.name()

    def copy(self) -> "TypeRef":
        return TypeRef(self.named, self.elem.copy() if self.elem else None,
                       self.nonnull)

    def __str__(self) -> str:
        if self.named is not None:
            return self.named + ("!" if self.nonnull else "")
        return "[" + str(self.elem) + "]" + ("!" if self.nonnull else "")


@dataclass
class Value:
    kind: str                 # str | block | enum | int | float | bool | null | var | list | obj
    raw: str = ""
    children: list = dc_field(default_factory=list)  # [(name|None, Value)]

    def __str__(self) -> str:
        if self.kind == "var":
            return "$" + self.raw
        if self.kind in ("int", "float", "enum", "bool", "null"):
            return self.raw
        if self.kind in ("str", "block"):
            return go_quote(self.raw)
        if self.kind == "list":
            return "[" + ",".join(str(v) for _n, v in self.children) + "]"
        if self.kind == "obj":
            return "{" + ",".join(f"{n}:{v}" for n, v in self.children) + "}"
        raise ValueError(self.kind)

    def child(self, name: str) -> "Value | None":
        for n, v in self.children:
            if n == name:
                return v
        return None


@dataclass
class Arg:
    name: str
    value: Value


@dataclass
class Directive:
    name: str
    args: list = dc_field(default_factory=list)

    def arg(self, name: str) -> Arg | None:
        for a in self.args:
            if a.name == name:
                return a
        return None


@dataclass
class ArgDef:
    name: str
    type: TypeRef
    default: Value | None = None


@dataclass
class Field:
    name: str
    type: TypeRef
    desc: str = ""
    args: list = dc_field(default_factory=list)          # [ArgDef]
    directives: list = dc_field(default_factory=list)    # [Directive]

    def directive(self, name: str) -> Directive | None:
        for d in self.directives:
            if d.name == name:
                return d
        return None


@dataclass
class Defn:
    kind: str
    name: str
    desc: str = ""
    directives: list = dc_field(default_factory=list)
    interfaces: list = dc_field(default_factory=list)
    fields: list = dc_field(default_factory=list)        # [Field]
    enum_values: list = dc_field(default_factory=list)   # [(name, desc)]
    types: list = dc_field(default_factory=list)         # union members
    built_in: bool = False

    def directive(self, name: str) -> Directive | None:
        for d in self.directives:
            if d.name == name:
                return d
        return None

    def field(self, name: str) -> Field | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None


# ============================================================== lexing

def _tokenize(src: str):
    """Yield (kind, value) tokens: name, punct, str, block, int, float."""
    i, n = 0, len(src)
    out = []
    while i < n:
        c = src[i]
        if c in " \t\r\n,":
            i += 1
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if src.startswith('"""', i):
            j = src.find('"""', i + 3)
            while j != -1 and src[j - 1] == "\\":
                j = src.find('"""', j + 1)
            raw = src[i + 3:j]
            out.append(("block", _block_string_value(raw)))
            i = j + 3
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and src[j] != '"':
                if src[j] == "\\":
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r", "b": "\b",
                                "f": "\f", '"': '"', "\\": "\\", "/": "/"}.get(
                                    esc, "\\" + esc)
                               if esc != "u" else chr(int(src[j + 2:j + 6], 16)))
                    j += 6 if esc == "u" else 2
                else:
                    buf.append(src[j])
                    j += 1
            out.append(("str", "".join(buf)))
            i = j + 1
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            out.append(("name", src[i:j]))
            i = j
            continue
        if c.isdigit() or (c == "-" and i + 1 < n and src[i + 1].isdigit()):
            j = i + 1
            isf = False
            while j < n and (src[j].isdigit() or src[j] in ".eE+-"):
                if src[j] in ".eE":
                    isf = True
                j += 1
            out.append(("float" if isf else "int", src[i:j]))
            i = j
            continue
        if c == "$":
            j = i + 1
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            out.append(("var", src[i + 1:j]))
            i = j
            continue
        out.append(("punct", c))
        i += 1
    return out


def _block_string_value(raw: str) -> str:
    """GraphQL spec block-string semantics (common indent + blank trim)."""
    lines = raw.split("\n")
    indent = None
    for ln in lines[1:]:
        stripped = ln.lstrip(" \t")
        if stripped:
            ind = len(ln) - len(stripped)
            indent = ind if indent is None else min(indent, ind)
    if indent:
        lines = [lines[0]] + [ln[indent:] for ln in lines[1:]]
    while lines and not lines[0].strip():
        lines.pop(0)
    while lines and not lines[-1].strip():
        lines.pop()
    return "\n".join(lines)


def go_quote(s: str) -> str:
    """Go strconv.Quote — used by gqlparser's Value.String for strings."""
    out = ['"']
    for ch in s:
        o = ord(ch)
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\a":
            out.append("\\a")
        elif ch == "\b":
            out.append("\\b")
        elif ch == "\f":
            out.append("\\f")
        elif ch == "\v":
            out.append("\\v")
        elif o < 0x20 or o == 0x7F:
            out.append(f"\\x{o:02x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


# ============================================================== parsing

class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k] if self.i + k < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")

    def parse_doc(self):
        defs, extensions = [], []
        while self.peek()[0] != "eof":
            desc = ""
            if self.peek()[0] in ("str", "block"):
                desc = self.next()[1]
            k, v = self.peek()
            if v == "extend":
                self.next()
                d = self.parse_definition("")
                extensions.append(d)
            elif v == "schema":
                # schema { query: ... } block — skip
                self.next()
                while self.peek()[1] != "{":
                    self.next()
                depth = 0
                while True:
                    t = self.next()
                    if t[1] == "{":
                        depth += 1
                    elif t[1] == "}":
                        depth -= 1
                        if depth == 0:
                            break
            elif v == "directive":
                # directive @name(args...) on LOC | LOC
                self.next()
                self.expect("@")
                self.next()  # name
                if self.peek()[1] == "(":
                    self.skip_balanced()
                self.expect("on")
                self.next()
                while self.peek()[1] == "|":
                    self.next()
                    self.next()
            else:
                defs.append(self.parse_definition(desc))
        return defs, extensions

    def skip_balanced(self):
        depth = 0
        while True:
            t = self.next()
            if t[1] == "(":
                depth += 1
            elif t[1] == ")":
                depth -= 1
                if depth == 0:
                    return

    def parse_definition(self, desc: str) -> Defn:
        kw = self.next()[1]
        kind = {"type": OBJECT, "interface": INTERFACE, "union": UNION,
                "enum": ENUM, "input": INPUT, "scalar": SCALAR}[kw]
        name = self.next()[1]
        d = Defn(kind=kind, name=name, desc=desc)
        if kind == SCALAR:
            d.directives = self.parse_directives()
            return d
        if kind == UNION:
            d.directives = self.parse_directives()
            if self.peek()[1] == "=":
                self.next()
                d.types.append(self.next()[1])
                while self.peek()[1] == "|":
                    self.next()
                    d.types.append(self.next()[1])
            return d
        if self.peek()[1] == "implements":
            self.next()
            d.interfaces.append(self.next()[1])
            while self.peek()[1] in ("&", ","):
                self.next()
                d.interfaces.append(self.next()[1])
        d.directives = self.parse_directives()
        if self.peek()[1] != "{":
            return d
        self.expect("{")
        while self.peek()[1] != "}":
            fdesc = ""
            if self.peek()[0] in ("str", "block"):
                fdesc = self.next()[1]
            if kind == ENUM:
                ename = self.next()[1]
                self.parse_directives()  # enum value directives dropped
                d.enum_values.append((ename, fdesc))
            else:
                d.fields.append(self.parse_field(fdesc))
        self.expect("}")
        return d

    def parse_field(self, desc: str) -> Field:
        name = self.next()[1]
        args = []
        if self.peek()[1] == "(":
            self.next()
            while self.peek()[1] != ")":
                if self.peek()[0] in ("str", "block"):
                    self.next()  # arg description
                aname = self.next()[1]
                self.expect(":")
                atype = self.parse_type()
                default = None
                if self.peek()[1] == "=":
                    self.next()
                    default = self.parse_value()
                self.parse_directives()  # arg directives dropped
                args.append(ArgDef(aname, atype, default))
            self.next()
        self.expect(":")
        ftype = self.parse_type()
        dirs = self.parse_directives()
        return Field(name=name, type=ftype, desc=desc, args=args,
                     directives=dirs)

    def parse_type(self) -> TypeRef:
        if self.peek()[1] == "[":
            self.next()
            elem = self.parse_type()
            self.expect("]")
            t = TypeRef(elem=elem)
        else:
            t = TypeRef(named=self.next()[1])
        if self.peek()[1] == "!":
            self.next()
            t.nonnull = True
        return t

    def parse_directives(self) -> list:
        out = []
        while self.peek()[1] == "@":
            self.next()
            name = self.next()[1]
            args = []
            if self.peek()[1] == "(":
                self.next()
                while self.peek()[1] != ")":
                    aname = self.next()[1]
                    self.expect(":")
                    args.append(Arg(aname, self.parse_value()))
                self.next()
            out.append(Directive(name, args))
        return out

    def parse_value(self) -> Value:
        k, v = self.peek()
        if v == "[":
            self.next()
            ch = []
            while self.peek()[1] != "]":
                ch.append((None, self.parse_value()))
            self.next()
            return Value("list", children=ch)
        if v == "{":
            self.next()
            ch = []
            while self.peek()[1] != "}":
                n = self.next()[1]
                self.expect(":")
                ch.append((n, self.parse_value()))
            self.next()
            return Value("obj", children=ch)
        self.next()
        if k in ("str", "block"):
            return Value(k, v)
        if k == "var":
            return Value("var", v)
        if k in ("int", "float"):
            return Value(k, v)
        if v in ("true", "false"):
            return Value("bool", v)
        if v == "null":
            return Value("null", v)
        return Value("enum", v)


# ============================================================== tables
# (gqlschema.go:447-560)

supportedSearches = {
    "int": ("Int", "int"), "int64": ("Int64", "int"), "float": ("Float", "float"),
    "bool": ("Boolean", "bool"), "hash": ("String", "hash"),
    "exact": ("String", "exact"), "term": ("String", "term"),
    "fulltext": ("String", "fulltext"), "trigram": ("String", "trigram"),
    "regexp": ("String", "trigram"), "ngram": ("String", "ngram"),
    "year": ("DateTime", "year"), "month": ("DateTime", "month"),
    "day": ("DateTime", "day"), "hour": ("DateTime", "hour"),
    "point": ("Point", "geo"), "polygon": ("Polygon", "geo"),
    "multiPolygon": ("MultiPolygon", "geo"), "hnsw": ("Float", "hnsw"),
}

defaultSearches = {
    "Boolean": "bool", "Int": "int", "Int64": "int64", "Float": "float",
    "String": "term", "DateTime": "year", "Point": "point",
    "Polygon": "polygon", "MultiPolygon": "multiPolygon",
}

orderable = {"Int", "Int64", "Float", "String", "DateTime"}
summable = {"Int", "Int64", "Float"}

builtInFilters = {
    "bool": "Boolean", "int": "IntFilter", "int64": "Int64Filter",
    "float": "FloatFilter", "year": "DateTimeFilter", "month": "DateTimeFilter",
    "day": "DateTimeFilter", "hour": "DateTimeFilter",
    "term": "StringTermFilter", "trigram": "StringRegExpFilter",
    "regexp": "StringRegExpFilter", "ngram": "StringNgramFilter",
    "fulltext": "StringFullTextFilter", "exact": "StringExactFilter",
    "hash": "StringHashFilter", "point": "PointGeoFilter",
    "polygon": "PolygonGeoFilter", "multiPolygon": "PolygonGeoFilter",
    "hnsw": "HNSWSearchFilter",
}

inbuiltTypeToDgraph = {
    "ID": "uid", "Boolean": "bool", "Int": "int", "Int64": "int",
    "Float": "float", "String": "string", "DateTime": "dateTime",
    "Password": "password", "Point": "geo", "Polygon": "geo",
    "MultiPolygon": "geo",
}

# directives printed by genDirectivesString (gqlschema.go:570 keys of
# directiveValidators — note @cascade is NOT printable)
printableDirectives = {
    "hasInverse", "search", "embedding", "dgraph", "id", "withSubscription",
    "secret", "auth", "custom", "remote", "deprecated", "lambda", "default",
    "lambdaOnMutate", "generate", "key", "extends", "external", "requires",
    "provides", "remoteResponse",
}


def camel_case(x: str) -> str:
    return x[:1].lower() + x[1:] if x else ""


# ============================================================== helpers

def has_external(f: Field) -> bool:
    return f.directive("external") is not None


def is_key_field(f: Field, defn: Defn) -> bool:
    key = defn.directive("key")
    if key is None or not key.args:
        return False
    return f.name == key.args[0].value.raw


def non_external_and_key_fields(defn: Defn) -> list:
    return [f for f in defn.fields
            if not (has_external(f) and not is_key_field(f, defn))]


def external_and_non_key(f: Field, defn: Defn, provides: dict) -> bool:
    return has_external(f) and not is_key_field(f, defn) \
        and not provides.get(f.name, False)


def has_custom_or_lambda(f: Field) -> bool:
    return any(d.name in ("custom", "lambda") for d in f.directives)


def is_id(f: Field) -> bool:
    return f.type.name() == "ID"


def has_id_directive(f: Field) -> bool:
    return f.directive("id") is not None


def has_embedding_directive(f: Field) -> bool:
    return f.directive("embedding") is not None


def has_interface_arg(f: Field) -> bool:
    d = f.directive("id")
    if d is None:
        return False
    a = d.arg("interface")
    return a is not None and a.value.raw == "true"


def has_extends(defn: Defn) -> bool:
    return defn.directive("extends") is not None


def is_multi_lang_field(f: Field, is_mutation_input: bool) -> bool:
    d = f.directive("dgraph")
    if d is None:
        return False
    pred = d.arg("pred")
    if pred is None:
        return False
    raw = pred.value.raw
    if "@" in raw:
        langs = raw.split("@")[1]
        if is_mutation_input:
            return ":" in langs or langs == "."
        return ":" in langs
    return False


def field_pred_name(f: Field, typ_name: str) -> str:
    d = f.directive("dgraph")
    if d is not None:
        pred = d.arg("pred")
        if pred is not None:
            return pred.value.raw
    return typ_name + "." + f.name


def get_default_value(f: Field, action: str):
    d = f.directive("default")
    if d is None:
        return None
    arg = d.arg(action)
    if arg is None:
        return None
    return arg.value.child("value")


def parse_search_type(arg: str) -> str:
    return arg.split("(")[0].strip() if "(" in arg else arg


class Gen:
    """One generation run (ports the ast.Schema mutation pipeline)."""

    def __init__(self, apollo_service_query: bool = False):
        self.apollo = apollo_service_query
        self.types: dict[str, Defn] = {}
        self.query = Defn(OBJECT, "Query")
        self.mutation = Defn(OBJECT, "Mutation")
        self.subscription = Defn(OBJECT, "Subscription")
        self.provides_map: dict[str, dict] = {}

    # ---------------- helpers bound to the schema dict -------------

    def get_search_args(self, f: Field) -> list:
        search = f.directive("search")
        idd = f.directive("id")
        ftype = f.type.name()
        if search is None:
            if idd is None:
                return []
            if ftype == "String":
                return ["hash"]
            return [self.default_search_index(ftype)]
        by = search.arg("by")
        if by is None or not by.value.children:
            return [self.default_search_index(ftype)]
        res = [v.raw for _n, v in by.value.children]
        if idd is not None and "hash" not in res and "exact" not in res:
            res.append("hash")
        return sorted(res)

    def default_search_index(self, type_name: str) -> str:
        return defaultSearches.get(type_name, "hash")

    def has_filterable(self, defn: Defn) -> bool:
        return any(
            len(self.get_search_args(f)) != 0 or is_id(f)
            or not has_custom_or_lambda(f) or not is_multi_lang_field(f, False)
            for f in defn.fields)

    def is_type_list(self, f: Field) -> bool:
        return f.type.name() not in inbuiltTypeToDgraph and f.type.elem is not None

    def is_enum_list(self, f: Field) -> bool:
        t = self.types.get(f.type.name())
        return t is not None and t.kind == ENUM and f.type.elem is not None

    def is_orderable(self, f: Field, defn: Defn, provides: dict) -> bool:
        if not has_external(f):
            return (f.type.named in orderable and not has_custom_or_lambda(f)
                    and not is_multi_lang_field(f, False))
        return is_key_field(f, defn) or provides.get(f.name, False)

    def has_orderables(self, defn: Defn, provides: dict) -> bool:
        return any(self.is_orderable(f, defn, provides) for f in defn.fields)

    def is_summable(self, f: Field, defn: Defn, provides: dict) -> bool:
        if external_and_non_key(f, defn, provides):
            return False
        return (f.type.named in summable) and not has_custom_or_lambda(f)

    def has_id(self, defn: Defn) -> bool:
        return any(is_id(f) for f in non_external_and_key_fields(defn))

    def has_xid(self, defn: Defn) -> bool:
        return any(has_id_directive(f) for f in non_external_and_key_fields(defn))

    def has_embedding(self, defn: Defn) -> bool:
        return any(has_embedding_directive(f)
                   for f in non_external_and_key_fields(defn))

    def xids_count(self, fields: list) -> int:
        return sum(1 for f in fields if has_id_directive(f))

    # ---------------- pipeline -------------------------------------

    def run(self, input_sdl: str) -> str:
        p = _Parser(input_sdl)
        defs, extensions = p.parse_doc()
        for ext in extensions:
            if ext.name not in ("Query", "Mutation"):
                ext.directives.append(Directive("extends"))
                defs.append(ext)
            else:
                existing = next((d for d in defs if d.name == ext.name), None)
                if existing is not None:
                    existing.fields.extend(ext.fields)
                else:
                    defs.append(ext)

        defns = []            # original definition names, user order
        types_to_complete = []
        for d in defs:
            defns.append(d.name)
            if d.kind in (OBJECT, INTERFACE, UNION):
                if d.directive("remote") is not None:
                    continue
                for f in d.fields:
                    pd = f.directive("provides")
                    if pd is None:
                        continue
                    arg = pd.arg("fields")
                    tm = self.provides_map.setdefault(f.type.name(), {})
                    for fn in arg.value.raw.split():
                        tm[fn] = True
            types_to_complete.append(d.name)

        # expandSchema: interface field inheritance (gqlschema.go:719)
        interfaces = {d.name: d for d in defs if d.kind == INTERFACE}
        for d in defs:
            if d.kind != OBJECT or not d.interfaces:
                continue
            field_seen: dict[str, str] = {}
            def_fields: dict[str, int] = {}
            for f in d.fields:
                def_fields[f.name] = def_fields.get(f.name, 0) + 1
            initial = list(d.fields)
            for iname in d.interfaces:
                i = interfaces.get(iname)
                if i is None:
                    continue
                fields = []
                for f in i.fields:
                    if def_fields.get(f.name, 0) == 1:
                        own = next(x for x in initial if x.name == f.name)
                        if field_seen.get(f.name, "") == "":
                            # overwrite type's own def with interface's
                            # (*defn.Fields.ForName(name) = *field — full
                            # struct copy, keeps the description)
                            idx = d.fields.index(d.field(f.name))
                            d.fields[idx] = _full_copy_field(f)
                        elif f.type.named != "ID":
                            fields.append(_copy_field(f))
                        _ = own
                    elif f.type.named == "ID" and field_seen.get(f.name, ""):
                        pass
                    else:
                        fields.append(_copy_field(f))
                    field_seen[f.name] = i.name
                d.fields = fields + d.fields
                pw = i.directive("secret")
                if pw is not None:
                    d.directives.append(pw)

        # build the Types dict: user defs + extras + prelude scalars
        extras_src = schemaInputs + (
            apolloSupportedDirectiveDefs if self.apollo else directiveDefs
        ) + filterInputs
        extras_defs, _ = _Parser(extras_src).parse_doc()
        printed = {"_Service": True}
        for d in extras_defs:
            printed[d.name] = True
        for nm in ("Int", "Float", "String", "Boolean", "ID"):
            self.types[nm] = Defn(SCALAR, nm, built_in=True)
        for d in extras_defs:
            self.types[d.name] = d
        for d in defs:
            self.types[d.name] = d

        # expandSchemaWithApolloExtras (gqlschema.go:800)
        apollo_key_types = [d.name for d in defs
                            if d.directive("key") is not None]
        if apollo_key_types:
            self.types["_Entity"] = Defn(UNION, "_Entity",
                                         types=apollo_key_types)
            aq_defs, _ = _Parser(apolloSchemaQueries).parse_doc()
            qd = next((d for d in defs if d.name == "Query"), None)
            if qd is None:
                self.types["Query"] = aq_defs[0]
                defs.append(aq_defs[0])
                defns.append("Query")
                types_to_complete.append("Query")
            else:
                qd.fields.extend(aq_defs[0].fields)
            ax_defs, _ = _Parser(apolloSchemaExtras).parse_doc()
            for d in ax_defs:
                self.types[d.name] = d

        # hasInverseValidation side effect: add reciprocal directives
        for key in defns:
            d = self.types.get(key)
            if d is None or d.kind not in (OBJECT, INTERFACE):
                continue
            for f in d.fields:
                hi = f.directive("hasInverse")
                if hi is None:
                    continue
                self._link_inverse(d, f, hi)

        # completeSchema
        q = self.types.get("Query")
        if q is not None and q.fields:
            self.query = q
        m = self.types.get("Mutation")
        if m is not None and m.fields:
            self.mutation = m

        for key in types_to_complete:
            defn = self.types.get(key)
            if defn is None:
                continue
            if key == "Query":
                for f in defn.fields:
                    if (f.directive("withSubscription") is not None
                            and f.directive("custom") is not None):
                        self.subscription.fields.append(f)
                continue
            if key in ("Query", "Mutation"):
                continue
            if defn.kind == UNION:
                self.add_union_reference_type(defn)
                self.add_union_filter_type(defn)
                self.add_union_member_type_enum(defn)
                continue
            if defn.kind not in (OBJECT, INTERFACE):
                continue
            params = self.parse_generate_params(defn)
            provides = self.provides_map.get(key, {})

            self.add_reference_type(defn, provides)
            if params["update"]:
                self.add_patch_type(defn, provides)
                self.add_update_type(defn)
                self.add_update_payload_type(defn, provides)
            if params["delete"]:
                self.add_delete_payload_type(defn, provides)
            if defn.kind == INTERFACE:
                if params["update"]:
                    self.add_update_mutation(defn)
                if params["delete"]:
                    self.add_delete_mutation(defn)
            else:
                if params["add"]:
                    self.add_input_type(defn, provides)
                    self.add_add_payload_type(defn, provides)
                if params["add"]:
                    self.add_add_mutation(defn)
                if params["update"]:
                    self.add_update_mutation(defn)
                if params["delete"]:
                    self.add_delete_mutation(defn)

            self.add_filter_type(defn, provides)
            self.add_type_orderable(defn, provides)
            self.add_field_filters(defn, provides)
            self.add_aggregation_result_type(defn, provides)
            if not (self.apollo and has_extends(defn)):
                self.add_queries(defn, provides, params)
            self.add_type_has_filter(defn, provides)
            self.add_aggregate_fields(defn)

        self.clean_schema()

        self._defns, self._printed = defns, printed
        return self.stringify(defns, printed)

    # ------------- hasInverse reciprocal ---------------------------

    def _link_inverse(self, typ: Defn, f: Field, dir_: Directive):
        inv_type = self.types.get(f.type.name())
        if inv_type is None or inv_type.kind not in (OBJECT, INTERFACE):
            return
        arg = dir_.arg("field")
        if arg is None:
            return
        inv_field = inv_type.field(arg.value.raw)
        if inv_field is None:
            return
        if inv_field.directive("hasInverse") is None:
            def add(fld):
                fld.directives.append(Directive("hasInverse", [
                    Arg("field", Value("enum", f.name))]))
            add(inv_field)
            if inv_type.kind == INTERFACE:
                for t in self.types.values():
                    if t.kind == OBJECT and inv_type.name in t.interfaces:
                        tf = t.field(arg.value.raw)
                        if tf is not None and tf.directive("hasInverse") is None:
                            add(tf)

    # ------------- @generate --------------------------------------

    def parse_generate_params(self, defn: Defn) -> dict:
        ret = {"get": True, "query": True, "password": True, "aggregate": True,
               "add": True, "update": True, "delete": True,
               "subscription": False}
        d = defn.directive("generate")
        if d is None:
            return ret
        qa = d.arg("query")
        if qa is not None:
            for k in ("get", "query", "password", "aggregate"):
                v = qa.value.child(k)
                if v is not None:
                    ret[k] = v.raw == "true"
        ma = d.arg("mutation")
        if ma is not None:
            for k in ("add", "update", "delete"):
                v = ma.value.child(k)
                if v is not None:
                    ret[k] = v.raw == "true"
        sa = d.arg("subscription")
        if sa is not None:
            ret["subscription"] = sa.value.raw == "true"
        return ret

    # ------------- union types ------------------------------------

    def add_union_reference_type(self, defn: Defn):
        ref = Defn(INPUT, defn.name + "Ref")
        for tn in defn.types:
            ref.fields.append(Field(camel_case(tn) + "Ref",
                                    TypeRef(named=tn + "Ref")))
        self.types[ref.name] = ref

    def add_union_filter_type(self, defn: Defn):
        filt = Defn(INPUT, defn.name + "Filter")
        filt.fields.append(Field("memberTypes", TypeRef(
            elem=TypeRef(named=defn.name + "Type", nonnull=True))))
        for tn in defn.types:
            filt.fields.append(Field(camel_case(tn) + "Filter",
                                     TypeRef(named=tn + "Filter")))
        self.types[filt.name] = filt

    def add_union_member_type_enum(self, defn: Defn):
        enum = Defn(ENUM, defn.name + "Type")
        for tn in defn.types:
            enum.enum_values.append((tn, ""))
        self.types[enum.name] = enum

    # ------------- input/ref/patch/update -------------------------

    def get_id_field(self, defn: Defn, provides: dict) -> list:
        for f in defn.fields:
            if is_id(f):
                if external_and_non_key(f, defn, provides):
                    continue
                return [Field(f.name, f.type.copy(), desc=f.desc)]
        return []

    def get_xid_field(self, defn: Defn, provides: dict) -> list:
        for f in defn.fields:
            if has_id_directive(f):
                if external_and_non_key(f, defn, provides):
                    continue
                return [Field(f.name, f.type.copy(), desc=f.desc)]
        return []

    def get_password_field(self, defn: Defn) -> Field | None:
        out = None
        for d in defn.directives:
            if d.name != "secret":
                continue
            name = d.arg("field").value.raw
            dirs = []
            pred = d.arg("pred")
            if pred is not None:
                dirs = [Directive("dgraph", [Arg("pred",
                                                 Value("str", pred.value.raw))])]
            out = Field(name, TypeRef(named="String", nonnull=True),
                        directives=dirs)
        return out

    def create_field(self, f: Field) -> Field:
        kind = self.types[f.type.name()].kind if f.type.name() in self.types \
            else SCALAR
        if kind in (OBJECT, INTERFACE, UNION):
            t = TypeRef()
            t.nonnull = f.type.nonnull
            if f.type.named is not None:
                t.named = f.type.name() + "Ref"
            else:
                t.elem = TypeRef(named=f.type.name() + "Ref",
                                 nonnull=f.type.elem.nonnull)
            return Field(f.name, t)
        return Field(f.name, f.type.copy(), desc=f.desc)

    def get_fields_without_id_type(self, defn: Defn, provides: dict,
                                   is_adding_input: bool) -> list:
        out = []
        for f in defn.fields:
            if is_id(f):
                continue
            if external_and_non_key(f, defn, provides):
                continue
            if has_custom_or_lambda(f):
                continue
            if is_multi_lang_field(f, True) and is_adding_input:
                continue
            fname = field_pred_name(f, defn.name)
            if fname.startswith("~") or fname.startswith("<~"):
                continue
            ft = self.types.get(f.type.name())
            if ft is not None and ft.kind == INTERFACE and \
                    not self.has_id(ft) and not self.has_xid(ft):
                continue
            nf = self.create_field(f)
            if get_default_value(f, "add") is not None:
                nf.type.nonnull = False
            out.append(nf)
        pw = self.get_password_field(defn)
        if pw is not None:
            out.append(pw)
        return out

    def get_patch_fields(self, defn: Defn, provides: dict) -> list:
        out = []
        for f in defn.fields:
            if is_id(f):
                continue
            if external_and_non_key(f, defn, provides):
                continue
            if has_custom_or_lambda(f):
                continue
            if is_multi_lang_field(f, True):
                continue
            fname = field_pred_name(f, defn.name)
            if fname.startswith("~") or fname.startswith("<~"):
                continue
            ft = self.types.get(f.type.name())
            if ft is not None and ft.kind == INTERFACE and \
                    not self.has_id(ft) and not self.has_xid(ft):
                continue
            out.append(self.create_field(f))
        pw = self.get_password_field(defn)
        if pw is not None:
            out.append(pw)
        return out

    def add_input_type(self, defn: Defn, provides: dict):
        fields = self.get_fields_without_id_type(defn, provides, True)
        if has_extends(defn):
            fields = self.get_id_field(defn, provides) + fields
        if fields:
            self.types["Add" + defn.name + "Input"] = Defn(
                INPUT, "Add" + defn.name + "Input", fields=fields)

    def add_reference_type(self, defn: Defn, provides: dict):
        if defn.kind == INTERFACE:
            if not self.has_id(defn) and not self.has_xid(defn):
                return
            flds = self.get_id_field(defn, provides) + \
                self.get_xid_field(defn, provides)
        else:
            flds = self.get_id_field(defn, provides) + \
                self.get_fields_without_id_type(defn, provides, True)
        if len(flds) == 1 and (self.has_id(defn) or self.has_xid(defn)):
            flds[0].type.nonnull = True
        else:
            for f in flds:
                f.type.nonnull = False
        if flds:
            self.types[defn.name + "Ref"] = Defn(INPUT, defn.name + "Ref",
                                                 fields=flds)

    def add_update_type(self, defn: Defn):
        if not self.has_filterable(defn):
            return
        if defn.name + "Patch" not in self.types:
            return
        self.types["Update" + defn.name + "Input"] = Defn(
            INPUT, "Update" + defn.name + "Input", fields=[
                Field("filter", TypeRef(named=defn.name + "Filter",
                                        nonnull=True)),
                Field("set", TypeRef(named=defn.name + "Patch")),
                Field("remove", TypeRef(named=defn.name + "Patch")),
            ])

    def add_patch_type(self, defn: Defn, provides: dict):
        if not self.has_filterable(defn):
            return
        fields = self.get_patch_fields(defn, provides)
        if not fields:
            return
        patch = Defn(INPUT, defn.name + "Patch", fields=fields)
        self.types[patch.name] = patch
        for f in patch.fields:
            f.type.nonnull = False

    # ------------- filters / orderables ---------------------------

    def get_filter_types(self, f: Field, filter_name: str) -> list:
        search_args = self.get_search_args(f)
        names = []
        for search in search_args:
            search = parse_search_type(search)
            nm = builtInFilters.get(search, "")
            if (search in ("hash", "exact")) and \
                    self.types.get(f.type.name(), Defn(SCALAR, "")).kind == ENUM:
                sf = self.types["String" + search.title() + "Filter"]
                flds = []
                for sfld in sf.fields:
                    enum_name = f.type.name()
                    if sfld.type.elem is None:
                        t = TypeRef(named=enum_name)
                    else:
                        t = TypeRef(elem=TypeRef(named=enum_name))
                    flds.append(Field(sfld.name, t, desc=sfld.desc))
                nm = f.type.name() + "_" + search
                self.types[nm] = Defn(INPUT, nm, fields=flds)
            names.append(nm)
        return names

    def merge_and_add_filters(self, filter_types: list, filter_name: str):
        if len(filter_types) <= 1:
            return
        fields = []
        for tn in filter_types:
            fields.extend(self.types[tn].fields)
        self.types[filter_name] = Defn(INPUT, filter_name, fields=fields)

    def add_filter_type(self, defn: Defn, provides: dict):
        filter_name = defn.name + "Filter"
        filt = Defn(INPUT, filter_name)
        for f in defn.fields:
            if external_and_non_key(f, defn, provides):
                continue
            if is_id(f):
                filt.fields.append(Field(f.name, TypeRef(
                    elem=TypeRef(named="ID", nonnull=True))))
                continue
            ftypes = self.get_filter_types(f, filter_name)
            # empirical (golden corpus): hnsw/embedding search produces no
            # filter entry — HNSWSearchFilter does not exist as an input
            ftypes = [t for t in ftypes if t and t != "HNSWSearchFilter"]
            if ftypes:
                merged = "_".join(ftypes)
                filt.fields.append(Field(f.name, TypeRef(named=merged)))
                self.merge_and_add_filters(ftypes, merged)
        if len(self.get_fields_without_id_type(defn, provides, False)) > 0:
            filt.fields.append(Field("has", TypeRef(
                elem=TypeRef(named=defn.name + "HasFilter"))))
        if (len(filt.fields) == 1 and not is_id(filt.fields[0])) \
                or len(filt.fields) > 1:
            filt.fields.append(Field("and", TypeRef(
                elem=TypeRef(named=filter_name))))
            filt.fields.append(Field("or", TypeRef(
                elem=TypeRef(named=filter_name))))
        filt.fields.append(Field("not", TypeRef(named=filter_name)))
        self.types[filter_name] = filt

    def add_type_has_filter(self, defn: Defn, provides: dict):
        filt = Defn(ENUM, defn.name + "HasFilter")
        for f in defn.fields:
            if is_id(f) or has_custom_or_lambda(f) or \
                    is_multi_lang_field(f, False):
                continue
            if external_and_non_key(f, defn, provides):
                continue
            filt.enum_values.append((f.name, ""))
        if filt.enum_values:
            self.types[filt.name] = filt

    def add_type_orderable(self, defn: Defn, provides: dict):
        if not self.has_orderables(defn, provides):
            return
        order_name = defn.name + "Order"
        orderable_name = defn.name + "Orderable"
        self.types[order_name] = Defn(INPUT, order_name, fields=[
            Field("asc", TypeRef(named=orderable_name)),
            Field("desc", TypeRef(named=orderable_name)),
            Field("then", TypeRef(named=order_name)),
        ])
        enum = Defn(ENUM, orderable_name)
        for f in defn.fields:
            if self.is_orderable(f, defn, provides):
                enum.enum_values.append((f.name, ""))
        self.types[orderable_name] = enum

    def add_field_filters(self, defn: Defn, provides: dict):
        for f in defn.fields:
            if has_custom_or_lambda(f) or is_multi_lang_field(f, False):
                continue
            ft = self.types.get(f.type.name())
            if self.apollo and ft is not None and has_extends(ft):
                continue
            self.add_filter_argument(f)
            if self.is_type_list(f) and not self.is_enum_list(f):
                self.add_order_argument(f, provides)
                add_pagination_args(f)

    def add_filter_argument(self, f: Field):
        self.add_filter_argument_for_field(f, f.type.name())

    def add_filter_argument_for_field(self, f: Field, type_name: str):
        if type_name in inbuiltTypeToDgraph:
            return
        ft = self.types.get(type_name)
        if ft is None:
            return
        if ft.kind == UNION or self.has_filterable(ft):
            f.args.append(ArgDef("filter", TypeRef(named=type_name + "Filter")))

    def add_order_argument(self, f: Field, provides: dict):
        tname = f.type.name()
        ft = self.types.get(tname)
        if ft is not None and self.has_orderables(
                ft, self.provides_map.get(tname, {})):
            f.args.append(ArgDef("order", TypeRef(named=tname + "Order")))

    def add_aggregate_fields(self, defn: Defn):
        for f in list(defn.fields):
            ft = self.types.get(f.type.name())
            if self.apollo and ft is not None and has_extends(ft):
                continue
            if self.is_type_list(f) and not has_custom_or_lambda(f) and \
                    ft is not None and ft.kind in (OBJECT, INTERFACE):
                agg = Field(f.name + "Aggregate", TypeRef(
                    named=f.type.name() + "AggregateResult"))
                self.add_filter_argument_for_field(agg, f.type.name())
                defn.fields.append(agg)

    def add_aggregation_result_type(self, defn: Defn, provides: dict):
        name = defn.name + "AggregateResult"
        fields = [Field("count", TypeRef(named="Int"))]
        for f in defn.fields:
            aggregate_type = TypeRef(named=f.type.named)
            if self.is_orderable(f, defn, provides) or \
                    is_multi_lang_field(f, False):
                fields.append(Field(f.name + "Min", aggregate_type.copy()))
                fields.append(Field(f.name + "Max", aggregate_type.copy()))
            if self.is_summable(f, defn, provides):
                fields.append(Field(f.name + "Sum", aggregate_type.copy()))
                fields.append(Field(f.name + "Avg", TypeRef(named="Float")))
        self.types[name] = Defn(OBJECT, name, fields=fields)

    # ------------- payloads ---------------------------------------

    def _payload_query_field(self, defn: Defn, provides: dict,
                             as_list: bool = True) -> Field:
        qry = Field(camel_case(defn.name),
                    TypeRef(elem=TypeRef(named=defn.name)))
        self.add_filter_argument(qry)
        self.add_order_argument(qry, provides)
        add_pagination_args(qry)
        return qry

    def add_add_payload_type(self, defn: Defn, provides: dict):
        qry = self._payload_query_field(defn, provides)
        if "Add" + defn.name + "Input" in self.types:
            self.types["Add" + defn.name + "Payload"] = Defn(
                OBJECT, "Add" + defn.name + "Payload",
                fields=[qry, _num_uids()])

    def add_update_payload_type(self, defn: Defn, provides: dict):
        if not self.has_filterable(defn):
            return
        if defn.name + "Patch" not in self.types:
            return
        qry = self._payload_query_field(defn, provides)
        self.types["Update" + defn.name + "Payload"] = Defn(
            OBJECT, "Update" + defn.name + "Payload",
            fields=[qry, _num_uids()])

    def add_delete_payload_type(self, defn: Defn, provides: dict):
        if not self.has_filterable(defn):
            return
        qry = self._payload_query_field(defn, provides)
        msg = Field("msg", TypeRef(named="String"))
        self.types["Delete" + defn.name + "Payload"] = Defn(
            OBJECT, "Delete" + defn.name + "Payload",
            fields=[qry, msg, _num_uids()])

    # ------------- queries ----------------------------------------

    def add_get_query(self, defn: Defn, provides: dict, gen_subscription):
        has_id_f = self.has_id(defn)
        has_xid_f = self.has_xid(defn)
        xid_count = self.xids_count(defn.fields)
        if not has_id_f and not has_xid_f:
            return
        qry = Field("get" + defn.name, TypeRef(named=defn.name))
        if has_id_f:
            fields = self.get_id_field(defn, provides)
            qry.args.append(ArgDef(fields[0].name, TypeRef(
                named="ID", nonnull=not has_xid_f)))
        if has_xid_f:
            id_without_unique_arg = False
            for f in defn.fields:
                if has_id_directive(f):
                    if not has_interface_arg(f):
                        id_without_unique_arg = True
                    qry.args.append(ArgDef(f.name, TypeRef(
                        named=f.type.name(),
                        nonnull=not has_id_f and xid_count <= 1)))
            if defn.kind == INTERFACE and id_without_unique_arg:
                qry.directives.append(Directive("deprecated", [Arg(
                    "reason", Value("str",
                                    "@id argument for get query on interface"
                                    " is being deprecated. Only those @id"
                                    " fields which have interface argument"
                                    " set to true will be available in"
                                    " getQuery argument on interface post"
                                    " v21.11.0, please update your schema"
                                    " accordingly."))]))
        self.query.fields.append(qry)
        if defn.directive("withSubscription") is not None or gen_subscription:
            self.subscription.fields.append(qry)

    def _embedding_enum(self, defn: Defn) -> str:
        enum_name = defn.name + "Embedding"
        enum = Defn(ENUM, enum_name)
        for f in defn.fields:
            if has_embedding_directive(f):
                enum.enum_values.append((f.name, ""))
        self.types[enum_name] = enum
        return enum_name

    def _add_vector_distance(self, defn: Defn):
        if defn.field("vector_distance") is None:
            defn.fields.append(Field("vector_distance",
                                     TypeRef(named="Float")))

    def add_similar_by_id_query(self, defn: Defn, provides: dict):
        has_id_f = self.has_id(defn)
        has_xid_f = self.has_xid(defn)
        xid_count = self.xids_count(defn.fields)
        if not has_id_f and not has_xid_f:
            return
        qry = Field("querySimilar" + defn.name + "ById",
                    TypeRef(elem=TypeRef(named=defn.name)))
        self._add_vector_distance(defn)
        if has_id_f:
            fields = self.get_id_field(defn, provides)
            qry.args.append(ArgDef(fields[0].name, TypeRef(
                named="ID", nonnull=not has_xid_f)))
        if has_xid_f:
            id_without_unique_arg = False
            for f in defn.fields:
                if has_id_directive(f):
                    if not has_interface_arg(f):
                        id_without_unique_arg = True
                    qry.args.append(ArgDef(f.name, TypeRef(
                        named=f.type.name(),
                        nonnull=not has_id_f and xid_count <= 1)))
            if defn.kind == INTERFACE and id_without_unique_arg:
                qry.directives.append(Directive("deprecated"))
        enum_name = self._embedding_enum(defn)
        qry.args.append(ArgDef("by", TypeRef(named=enum_name, nonnull=True)))
        qry.args.append(ArgDef("topK", TypeRef(named="Int", nonnull=True)))
        qry.args.append(ArgDef("ef", TypeRef(named="Int")))
        qry.args.append(ArgDef("distance_threshold", TypeRef(named="Float")))
        self.add_filter_argument(qry)
        self.query.fields.append(qry)

    def add_similar_by_embedding_query(self, defn: Defn):
        qry = Field("querySimilar" + defn.name + "ByEmbedding",
                    TypeRef(elem=TypeRef(named=defn.name)))
        self._add_vector_distance(defn)
        enum_name = self._embedding_enum(defn)
        qry.args.append(ArgDef("by", TypeRef(named=enum_name, nonnull=True)))
        qry.args.append(ArgDef("topK", TypeRef(named="Int", nonnull=True)))
        qry.args.append(ArgDef("vector", TypeRef(
            elem=TypeRef(named="Float", nonnull=True), nonnull=True)))
        qry.args.append(ArgDef("ef", TypeRef(named="Int")))
        qry.args.append(ArgDef("distance_threshold", TypeRef(named="Float")))
        self.add_filter_argument(qry)
        self.query.fields.append(qry)

    def add_password_query(self, defn: Defn, provides: dict):
        has_id_f = self.has_id(defn)
        has_xid_f = self.has_xid(defn)
        if not has_id_f and not has_xid_f:
            return
        id_field = self.get_id_field(defn, provides)
        if not has_id_f:
            id_field = self.get_xid_field(defn, provides)
        pw = self.get_password_field(defn)
        if pw is None:
            return
        qry = Field("check" + defn.name + "Password",
                    TypeRef(named=defn.name), args=[
                        ArgDef(id_field[0].name, id_field[0].type),
                        ArgDef(pw.name, TypeRef(named="String", nonnull=True)),
                    ])
        self.query.fields.append(qry)

    def add_filter_query(self, defn: Defn, provides: dict, gen_subscription):
        qry = Field("query" + defn.name, TypeRef(elem=TypeRef(named=defn.name)))
        self.add_filter_argument(qry)
        self.add_order_argument(qry, provides)
        add_pagination_args(qry)
        self.query.fields.append(qry)
        if defn.directive("withSubscription") is not None or gen_subscription:
            self.subscription.fields.append(qry)

    def add_aggregation_query(self, defn: Defn, gen_subscription):
        qry = Field("aggregate" + defn.name,
                    TypeRef(named=defn.name + "AggregateResult"))
        self.add_filter_argument_for_field(qry, defn.name)
        self.query.fields.append(qry)
        if defn.directive("withSubscription") is not None or gen_subscription:
            self.subscription.fields.append(qry)

    def add_queries(self, defn: Defn, provides: dict, params: dict):
        if params["get"]:
            self.add_get_query(defn, provides, params["subscription"])
            if self.has_embedding(defn):
                self.add_similar_by_id_query(defn, provides)
                self.add_similar_by_embedding_query(defn)
        if params["password"]:
            self.add_password_query(defn, provides)
        if params["query"]:
            self.add_filter_query(defn, provides, params["subscription"])
        if params["aggregate"]:
            self.add_aggregation_query(defn, params["subscription"])

    # ------------- mutations --------------------------------------

    def add_add_mutation(self, defn: Defn):
        if "Add" + defn.name + "Input" not in self.types:
            return
        add = Field("add" + defn.name,
                    TypeRef(named="Add" + defn.name + "Payload"), args=[
                        ArgDef("input", TypeRef(
                            named="[Add" + defn.name + "Input!]",
                            nonnull=True)),
                    ])
        if self.has_xid(defn):
            add.args.append(ArgDef("upsert", TypeRef(named="Boolean")))
        self.mutation.fields.append(add)

    def add_update_mutation(self, defn: Defn):
        if not self.has_filterable(defn):
            return
        if defn.name + "Patch" not in self.types:
            return
        self.mutation.fields.append(Field(
            "update" + defn.name,
            TypeRef(named="Update" + defn.name + "Payload"), args=[
                ArgDef("input", TypeRef(named="Update" + defn.name + "Input",
                                        nonnull=True))]))

    def add_delete_mutation(self, defn: Defn):
        if not self.has_filterable(defn):
            return
        self.mutation.fields.append(Field(
            "delete" + defn.name,
            TypeRef(named="Delete" + defn.name + "Payload"), args=[
                ArgDef("filter", TypeRef(named=defn.name + "Filter",
                                         nonnull=True))]))

    # ------------- cleanup ----------------------------------------

    def cleanup_input(self, defn: Defn | None, seen: dict):
        if defn is None or seen.get(defn.name):
            return
        kept = []
        for f in defn.fields:
            nt = f.type.name()
            ft = self.types.get(nt)
            enum = ft is not None and ft.kind == ENUM
            if nt in inbuiltTypeToDgraph or enum:
                kept.append(f)
                continue
            seen[defn.name] = True
            self.cleanup_input(self.types.get(nt), seen)
            if self.types.get(nt) is None:
                continue
            kept.append(f)
        defn.fields = kept
        if not defn.fields:
            self.types.pop(defn.name, None)
        if defn.name.startswith("Update") and defn.name.endswith("Input") \
                and len(defn.fields) == 1:
            td = self.types.get(defn.name[6:-5])
            if td is not None and td.directive("remote") is None and \
                    td.kind in (OBJECT, INTERFACE):
                self.types.pop(defn.name, None)

    def clean_schema(self):
        for k in list(self.types):
            if k.endswith("Ref") or k.endswith("Patch") or \
                    ((k.startswith("Add") or k.startswith("Update"))
                     and k.endswith("Input")):
                self.cleanup_input(self.types.get(k), {})
        kept = []
        for f in self.mutation.fields:
            if f.directive("custom") is not None or not (
                    f.name.startswith("add") or f.name.startswith("update")):
                kept.append(f)
                continue
            if f.name.startswith("add"):
                input_name = "Add" + f.name[3:] + "Input"
            else:
                input_name = "Update" + f.name[6:] + "Input"
            if input_name not in self.types:
                self.types.pop(input_name, None)
                continue
            kept.append(f)
        self.mutation.fields = kept

    # ------------- printing ---------------------------------------

    def stringify(self, original_types: list, printed: dict) -> str:
        original, objects, inputs, enums = [], [], [], []
        for tn in original_types:
            if tn in ("Query", "Mutation"):
                continue
            t = self.types.get(tn)
            if t is None:
                printed[tn] = True
                continue
            if t.kind == INTERFACE:
                original.append(gen_interface_string(t) + "\n")
            elif t.kind == OBJECT:
                original.append(gen_object_string(t) + "\n")
            elif t.kind == UNION:
                original.append(gen_union_string(t) + "\n")
            elif t.kind == ENUM:
                original.append(gen_enum_string(t) + "\n")
            elif t.kind == INPUT:
                original.append(gen_input_string(t) + "\n")
            printed[tn] = True

        extras = schemaInputs + (
            apolloSupportedDirectiveDefs if self.apollo else directiveDefs
        ) + filterInputs

        type_names = sorted(
            tn for tn, td in self.types.items()
            if tn not in ("Query", "Mutation") and not td.built_in
            and not printed.get(tn))
        for tn in type_names:
            t = self.types[tn]
            if t.kind == OBJECT:
                objects.append(gen_object_string(t) + "\n")
            elif t.kind == INPUT:
                inputs.append(gen_input_string(t) + "\n")
            elif t.kind == ENUM:
                enums.append(gen_enum_string(t) + "\n")

        sch = []
        hdr = "#######################\n"
        sch.append(hdr + "# Input Schema\n" + hdr + "\n")
        sch.extend(original)
        sch.append(hdr + "# Extended Definitions\n" + hdr)
        sch.append(extras)
        sch.append("\n")
        if "_Entity" in self.types:
            sch.append(hdr + "# Extended Apollo Definitions\n" + hdr)
            sch.append(gen_union_string(self.types["_Entity"]))
            sch.append(apolloSchemaExtras)
            sch.append("\n")
        if objects:
            sch.append(hdr + "# Generated Types\n" + hdr + "\n")
            sch.extend(objects)
        if enums:
            sch.append(hdr + "# Generated Enums\n" + hdr + "\n")
            sch.extend(enums)
        if inputs:
            sch.append(hdr + "# Generated Inputs\n" + hdr + "\n")
            sch.extend(inputs)
        if any(not f.name.startswith("__") for f in self.query.fields):
            sch.append(hdr + "# Generated Query\n" + hdr + "\n")
            sch.append(gen_object_string(self.query) + "\n")
        if self.mutation.fields:
            sch.append(hdr + "# Generated Mutations\n" + hdr + "\n")
            sch.append(gen_object_string(self.mutation) + "\n")
        if self.subscription.fields:
            sch.append(hdr + "# Generated Subscriptions\n" + hdr + "\n")
            sch.append(gen_object_string(self.subscription))
        return "".join(sch)


def _num_uids() -> Field:
    return Field("numUids", TypeRef(named="Int"))


def add_pagination_args(f: Field):
    f.args.append(ArgDef("first", TypeRef(named="Int")))
    f.args.append(ArgDef("offset", TypeRef(named="Int")))


def _copy_field(f: Field) -> Field:
    """copyAstFieldDef (gqlschema.go:701): does NOT copy the description —
    inherited interface fields print without their docstring."""
    return Field(f.name, f.type.copy(), args=list(f.args),
                 directives=list(f.directives))


def _full_copy_field(f: Field) -> Field:
    return Field(f.name, f.type.copy(), desc=f.desc, args=list(f.args),
                 directives=list(f.directives))


# ============================================================== printing

def gen_description(desc: str) -> str:
    if not desc:
        return ""
    return f'"""{desc}"""\n'


def gen_directives_string(dirs: list) -> str:
    out = [f"@{d.name}{gen_arguments_string(d.args)}"
           for d in dirs if d.name in printableDirectives]
    if not out:
        return ""
    return " " + " ".join(out)


def gen_arguments_string(args: list) -> str:
    if not args:
        return ""
    return "(" + ", ".join(f"{a.name}: {a.value}" for a in args) + ")"


def gen_arguments_defn_string(args: list) -> str:
    if not args:
        return ""
    return "(" + ", ".join(f"{a.name}: {a.type}" for a in args) + ")"


def gen_fields_string(fields: list) -> str:
    out = []
    for f in fields:
        if f.name.startswith("__"):
            continue
        d = gen_description(f.desc)
        if d:
            out.append("\t" + d)
        out.append(f"\t{f.name}{gen_arguments_defn_string(f.args)}: "
                   f"{f.type}{gen_directives_string(f.directives)}\n")
    return "".join(out)


def gen_object_string(t: Defn) -> str:
    if t.interfaces:
        impl = " & ".join(t.interfaces)
        return (f"{gen_description(t.desc)}type {t.name} implements {impl}"
                f"{gen_directives_string(t.directives)} {{\n"
                f"{gen_fields_string(t.fields)}}}\n")
    return (f"{gen_description(t.desc)}type {t.name}"
            f"{gen_directives_string(t.directives)} {{\n"
            f"{gen_fields_string(t.fields)}}}\n")


def gen_interface_string(t: Defn) -> str:
    return (f"{gen_description(t.desc)}interface {t.name}"
            f"{gen_directives_string(t.directives)} {{\n"
            f"{gen_fields_string(t.fields)}}}\n")


def gen_input_string(t: Defn) -> str:
    return (f"{gen_description(t.desc)}input {t.name}"
            f"{gen_directives_string(t.directives)} {{\n"
            f"{gen_fields_string(t.fields)}}}\n")


def gen_enum_string(t: Defn) -> str:
    out = [f"{gen_description(t.desc)}enum {t.name} {{\n"]
    for name, desc in t.enum_values:
        if name.startswith("__"):
            continue
        d = gen_description(desc)
        if d:
            out.append("\t" + d)
        out.append(f"\t{name}\n")
    out.append("}\n")
    return "".join(out)


def gen_union_string(t: Defn) -> str:
    return (f"{gen_description(t.desc)}union {t.name}"
            f"{gen_directives_string(t.directives)} = "
            + " | ".join(t.types) + "\n")


def generate_api_schema(input_sdl: str, apollo_service_query: bool = False) -> str:
    """User SDL -> complete generated API schema text (reference-exact)."""
    return Gen(apollo_service_query).run(input_sdl)


def generate_apollo_service_schema(input_sdl: str) -> str:
    """The apollo `_service { sdl }` result: the generated schema with
    Apollo extras stripped (schemagen.go:78 GQLSchemaWithoutApolloExtras —
    drops _Entity, @custom on fields/queries, @generate/@auth on types,
    the _entities/_service queries, and — struct-copy side effects the
    golden corpus pins — type/field descriptions and `implements`
    clauses)."""
    g = Gen(apollo_service_query=True)
    g.run(input_sdl)
    g.types.pop("_Entity", None)
    for tn, t in list(g.types.items()):
        nt = Defn(t.kind, t.name,
                  directives=[d for d in t.directives
                              if d.name not in ("generate", "auth")],
                  built_in=t.built_in, enum_values=t.enum_values)
        nt.fields = [
            Field(f.name, f.type, args=f.args,
                  directives=[d for d in f.directives if d.name != "custom"])
            for f in t.fields]
        g.types[tn] = nt
    queries = []
    for q in g.query.fields:
        if q.name in ("_entities", "_service"):
            continue
        queries.append(Field(q.name, q.type, args=q.args,
                             directives=[d for d in q.directives
                                         if d.name != "custom"]))
    if "Query" in g.types:
        g.types["Query"].fields = queries
    g.query = Defn(OBJECT, "Query", fields=queries)
    return g.stringify(g._defns, dict(g._printed))
