"""GraphQL SDL schema parser (subset of graphql/schema/gqlschema.go).

Parses the schema-definition language the reference's generated API is
built from — types, interfaces, unions, enums, field types, and the
dgraph-relevant directives (@id, @search, @dgraph(pred:), @hasInverse,
@secret, @embedding, @custom, @lambda, @key/@extends/@external,
@deprecated, @default, @auth, @withSubscription) — into a small model
the query rewriter consumes. Directive arguments that don't affect
query rewriting are skipped as balanced token groups.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


_TOK = re.compile(
    r'"""(?:[^"]|"(?!""))*"""'      # block string (docstring)
    r'|"(?:[^"\\]|\\.)*"'           # string
    r"|#[^\n]*"                     # comment
    r"|[A-Za-z_][A-Za-z0-9_.]*"     # name
    r"|<[^>\s]+>"                   # IRI pred in @dgraph
    r"|~[A-Za-z_][A-Za-z0-9_.]*"    # reverse pred in @dgraph
    r"|[\[\]{}()!:@=&|,]"           # punctuation
    r"|\S", re.S)


def _tokens(src: str) -> list[str]:
    out = []
    for m in _TOK.finditer(src):
        t = m.group()
        if t.startswith("#") or t.startswith('"""'):
            continue
        if t == ",":
            continue
        out.append(t)
    return out


@dataclass
class GField:
    name: str
    typ: str                      # base type name (unwrapped)
    is_list: bool = False
    nonnull: bool = False
    is_id: bool = False           # ID type
    has_id_directive: bool = False  # @id
    id_interface_arg: bool = False  # @id(interface: true)
    search: list[str] = field(default_factory=list)
    has_search: bool = False
    dgraph_pred: str | None = None
    inverse: str | None = None
    is_embedding: bool = False
    vector_metric: str = "euclidean"
    # @default(add: {value: "..."}, update: {value: "..."})
    default_add: str | None = None
    default_update: str | None = None
    custom: bool = False
    custom_requires: list[str] = field(default_factory=list)
    lambda_: bool = False
    external: bool = False
    # which type DECLARED the field (interface fields keep their owner
    # for predicate naming: Human.name stores as Character.name)
    owner: str = ""


@dataclass
class GType:
    name: str
    has_auth: bool = False
    dgraph_name: str | None = None  # @dgraph(type: "...") override
    kind: str = "type"            # type | interface | union | enum | input
    fields: dict[str, GField] = field(default_factory=dict)
    interfaces: list[str] = field(default_factory=list)
    members: list[str] = field(default_factory=list)   # union members
    values: list[str] = field(default_factory=list)    # enum values
    secret_field: str | None = None
    is_extends: bool = False
    key_fields: list[str] = field(default_factory=list)


class GQLSchema:
    def __init__(self) -> None:
        self.types: dict[str, GType] = {}

    # ---- lookups the rewriter needs ----
    def get(self, name: str) -> GType:
        return self.types[name]

    def is_enum(self, name: str) -> bool:
        t = self.types.get(name)
        return t is not None and t.kind == "enum"

    def is_object(self, name: str) -> bool:
        t = self.types.get(name)
        return t is not None and t.kind in ("type", "interface", "union")

    def field(self, type_name: str, fname: str) -> GField | None:
        t = self.types.get(type_name)
        if t is None:
            return None
        return t.fields.get(fname)

    def pred_name(self, type_name: str, fname: str) -> str:
        """Storage predicate for a field: @dgraph(pred:) override, else
        `Owner.field` where Owner is the declaring type/interface."""
        f = self.field(type_name, fname)
        if f is None:
            return f"{type_name}.{fname}"
        if f.dgraph_pred:
            return f.dgraph_pred
        return f"{f.owner or type_name}.{fname}"

    def implementers(self, iface: str) -> list[str]:
        return [t.name for t in self.types.values()
                if t.kind == "type" and iface in t.interfaces]


def parse_sdl(src: str) -> GQLSchema:
    toks = _tokens(src)
    i = 0
    n = len(toks)
    schema = GQLSchema()

    def peek(k: int = 0) -> str:
        return toks[i + k] if i + k < n else ""

    def skip_balanced() -> None:
        """Skip a balanced (...) group starting at toks[i] == '('."""
        nonlocal i
        depth = 0
        while i < n:
            if toks[i] == "(":
                depth += 1
            elif toks[i] == ")":
                depth -= 1
                if depth == 0:
                    i += 1
                    return
            i += 1

    def grab_balanced() -> list[str]:
        nonlocal i
        start = i
        skip_balanced()
        return toks[start + 1: i - 1]

    def parse_directives(f: GField | None, t: GType | None) -> None:
        nonlocal i
        while peek() == "@":
            i += 1
            dname = toks[i]; i += 1
            args: list[str] = []
            if peek() == "(":
                args = grab_balanced()
            if f is not None:
                if dname == "id":
                    f.has_id_directive = True
                    if "interface" in args and "true" in args:
                        f.id_interface_arg = True
                elif dname == "search":
                    f.has_search = True
                    joined = " ".join(args)
                    m = re.search(r"metric\s*:\s*\"?([a-z]+)", joined)
                    if m:
                        f.vector_metric = m.group(1)
                    f.search = [a.strip('"').split("(")[0] for a in args
                                if a not in ("by", ":", "[", "]", "(", ")")
                                and not a.startswith(("metric", "exponent"))]
                elif dname == "dgraph":
                    for j, a in enumerate(args):
                        if a == "pred" and j + 2 < len(args):
                            v = args[j + 2]
                            f.dgraph_pred = v.strip('"').strip("<>") \
                                if v.startswith('"') or v.startswith("<") else v
                elif dname == "hasInverse":
                    for j, a in enumerate(args):
                        if a == "field" and j + 2 < len(args):
                            f.inverse = args[j + 2].strip('"')
                elif dname == "embedding":
                    f.is_embedding = True
                elif dname == "custom":
                    f.custom = True
                    # $var references in url/body become required sibling
                    # fields (resolve/query_rewriter.go requiredFields)
                    req = set()
                    for j, a in enumerate(args):
                        if a in ("url", "body") and j + 2 < len(args):
                            req |= set(re.findall(r"\$([A-Za-z_][A-Za-z0-9_]*)",
                                                  args[j + 2]))
                    f.custom_requires = sorted(req)
                elif dname == "lambda":
                    f.lambda_ = True
                elif dname == "default":
                    # token stream: add : { value : "v" } update : { ... }
                    act = None
                    for j, a in enumerate(args):
                        if a in ("add", "update"):
                            act = a
                        elif a == "value" and j + 2 < len(args):
                            v = args[j + 2].strip('"')
                            if act == "add":
                                f.default_add = v
                            elif act == "update":
                                f.default_update = v
                elif dname == "external":
                    f.external = True
            elif t is not None:
                if dname == "auth":
                    t.has_auth = True
                elif dname == "dgraph":
                    for j, a in enumerate(args):
                        if a == "type" and j + 2 < len(args):
                            t.dgraph_name = args[j + 2].strip('"')
                elif dname == "secret":
                    for j, a in enumerate(args):
                        if a == "field" and j + 2 < len(args):
                            t.secret_field = args[j + 2].strip('"')
                elif dname == "extends":
                    t.is_extends = True
                elif dname == "key":
                    for j, a in enumerate(args):
                        if a == "fields" and j + 2 < len(args):
                            t.key_fields = args[j + 2].strip('"').split()

    def parse_field(owner: GType) -> None:
        nonlocal i
        fname = toks[i]; i += 1
        if peek() == "(":
            skip_balanced()  # field arguments (custom Query/Mutation)
        if peek() != ":":
            return
        i += 1  # ':'
        is_list = False
        if peek() == "[":
            is_list = True
            i += 1
        typ = toks[i]; i += 1
        nonnull = False
        if peek() == "!":
            if not is_list:
                nonnull = True  # outer ! of a scalar field
            i += 1
        if is_list:
            if peek() == "]":
                i += 1
            if peek() == "!":
                nonnull = True  # outer ! of the list type
                i += 1
        f = GField(name=fname, typ=typ, is_list=is_list,
                   nonnull=nonnull, is_id=(typ == "ID"), owner=owner.name)
        parse_directives(f, None)
        owner.fields[fname] = f

    while i < n:
        t = peek()
        if t in ("type", "interface", "input"):
            kind = "type" if t == "type" else ("interface" if t == "interface" else "input")
            i += 1
            gt = GType(name=toks[i], kind=kind)
            i += 1
            if peek() == "implements":
                i += 1
                while peek() not in ("{", "@", ""):
                    if peek() != "&":
                        gt.interfaces.append(toks[i])
                    i += 1
            parse_directives(None, gt)
            if peek() == "{":
                i += 1
                while peek() != "}" and i < n:
                    parse_field(gt)
                i += 1
            schema.types[gt.name] = gt
        elif t == "enum":
            i += 1
            gt = GType(name=toks[i], kind="enum")
            i += 1
            if peek() == "{":
                i += 1
                while peek() != "}" and i < n:
                    gt.values.append(toks[i])
                    i += 1
                i += 1
            schema.types[gt.name] = gt
        elif t == "union":
            i += 1
            gt = GType(name=toks[i], kind="union")
            i += 1
            if peek() == "=":
                i += 1
                while True:
                    gt.members.append(toks[i])
                    i += 1
                    if peek() == "|":
                        i += 1
                    else:
                        break
            schema.types[gt.name] = gt
        else:
            i += 1

    # inherit interface fields into implementing types (owner preserved)
    for gt in schema.types.values():
        if gt.kind != "type":
            continue
        for iface in gt.interfaces:
            it = schema.types.get(iface)
            if it is None:
                continue
            for fn, f in it.fields.items():
                if fn not in gt.fields:
                    gt.fields[fn] = f  # shared GField keeps owner=iface
    return schema
