"""Schema registry — the Spark-side equivalent of dgraph's per-predicate
schema (reference: schema/parse.go:84 parseScalarPair, directives at
schema/parse.go:41-81).

Indexes are retained as *metadata only*: Spark replaces every secondary
index with scan strategies + Catalyst pushdown (SURVEY.md §4), so the
registry's job is (a) type information for casts/comparisons, (b) gating
function legality the way dgraph errors on un-indexed predicates
(worker/task.go:1089-1090) — we accept any filter and treat indexes as
performance hints, and (c) driving expand(_all_) via node types
(query/query.go:2038-2152).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


# Tokenizer properties, mirroring tok/tok.go IsSortable / IsLossy:
# exact/int/bigfloat and the datetime granularities sort; float is
# sortable but lossy; hash/bool are exact (non-lossy) but unsortable;
# term/fulltext/trigram/ngram/geo are lossy search indexes.
SORTABLE_TOKENIZERS = {
    "exact", "int", "float", "bigfloat", "year", "month", "day", "hour",
}
NONLOSSY_TOKENIZERS = {"exact", "hash", "int", "bool"}

# Scalar type names mirror types/scalar_types.go:67-80.
SCALAR_TYPES = {
    "default",
    "binary",
    "int",
    "float",
    "bool",
    "datetime",
    "geo",
    "uid",
    "password",
    "string",
    "float32vector",
    "bigfloat",
}

# dgraph type -> Spark SQL type string (SURVEY.md §1.2 mapping table).
SPARK_TYPE = {
    "default": "string",
    "binary": "binary",
    "int": "bigint",
    "float": "double",
    "bool": "boolean",
    "datetime": "timestamp",
    "geo": "string",
    "uid": "bigint",
    "password": "string",
    "string": "string",
    "float32vector": "array<float>",
    "bigfloat": "string",  # lexical storage; 200-bit ops in functions/bigfloat.py
}


@dataclass
class Predicate:
    """One predicate's schema line, e.g.
    ``name: string @index(term, exact) @count @lang .``"""

    name: str
    typ: str = "default"
    list: bool = False
    lang: bool = False
    reverse: bool = False
    count: bool = False
    upsert: bool = False
    unique: bool = False
    indexes: tuple[str, ...] = ()

    @property
    def is_uid(self) -> bool:
        return self.typ == "uid"

    @property
    def spark_type(self) -> str:
        return SPARK_TYPE.get(self.typ, "string")


@dataclass
class SchemaRegistry:
    """predicate -> Predicate, plus node-type -> [predicate] mapping
    (the ``type Person { ... }`` blocks; reference query/query.go:2780)."""

    predicates: dict[str, Predicate] = field(default_factory=dict)
    types: dict[str, list[str]] = field(default_factory=dict)
    # strict = a declared DQL schema (SchemaRegistry.parse): enforce the
    # reference's index/sortability requirements (worker/task.go:1089,
    # worker/tokens.go pickTokenizer, worker/sort.go processSort).
    # Programmatic registries (e.g. the TPC-H warehouse view) stay
    # permissive: there every parquet column IS the index.
    strict: bool = False

    def add(self, pred: Predicate) -> None:
        self.predicates[pred.name] = pred

    def get(self, name: str) -> Predicate:
        # Unknown predicates get type `default` on first touch, mirroring
        # worker/task.go:1104-1110. dgraph.type is always [string]
        # (schema.go initialSchema) — it renders as a LIST.
        if name not in self.predicates:
            if name == "dgraph.type":
                self.predicates[name] = Predicate(name=name, typ="string", list=True)
            else:
                self.predicates[name] = Predicate(name=name, typ="default")
        return self.predicates[name]

    def has(self, name: str) -> bool:
        return name in self.predicates

    # ---- strict-mode validation (reference error parity) ----
    def validate_func(self, fname: str, pred: str | None,
                      at_root: bool) -> None:
        """Reject function/index combinations the reference rejects.

        Mirrors worker/task.go:1080-1110 (parseSrcFn + needsIndex) and
        worker/tokens.go pickTokenizer/verifyStringIndex, including the
        exact error strings. No-op unless ``strict``.
        """
        if not self.strict or pred is None:
            return
        p = self.predicates.get(pred.lstrip("~"))
        if p is None:
            # undeclared predicate: stays an empty result, like dgraph's
            # type-default tablet (worker/task.go:1104)
            return
        lf = fname.lower()
        idx = {t.lower() for t in p.indexes}
        if lf in ("regexp", "match") and p.typ != "string":
            # worker/task.go:1259
            raise ValueError(
                "Got non-string type. Regex match is allowed only on "
                "string type.")
        # string-index functions require their tokenizer everywhere, even
        # under @filter (needsIndex: standardFn/fullTextSearchFn/matchFn
        # return true unconditionally; verifyStringIndex message)
        required = None
        if lf in ("anyofterms", "allofterms"):
            required = "term"
        elif lf in ("anyoftext", "alloftext"):
            required = "fulltext"
        elif lf == "ngram":
            required = "ngram"
        elif lf == "match":
            required = "trigram"
        if required is not None and required not in idx:
            raise ValueError(
                f"Attribute {pred} is not indexed with type {required}")
        if lf in ("near", "within", "contains", "intersects") \
                and "geo" not in idx:
            raise ValueError(f"Predicate {pred} is not indexed")
        if lf == "similar_to" and not any(t.startswith("hnsw") for t in idx):
            # needsIndex(similarToFn) — worker/task.go:1089
            raise ValueError(f"Predicate {pred} is not indexed")
        if not at_root:
            # compare/regexp filters evaluate by value fetch — no index
            # needed (worker/task.go:284-289)
            return
        if lf == "regexp" and "trigram" not in idx:
            # worker/task.go:1295-1298
            raise ValueError(
                f"Attribute {pred} does not have trigram index for regex "
                "matching. Please add a trigram index or use has/uid "
                "function with regexp() as filter.")
        if lf in ("eq", "le", "lt", "ge", "gt", "between"):
            if not idx:
                raise ValueError(f"Predicate {pred} is not indexed")
            if lf != "eq":
                # pickTokenizer: ineq needs a sortable tokenizer
                if not (idx & SORTABLE_TOKENIZERS):
                    raise ValueError(
                        f"Attribute:{pred} does not have proper index for "
                        "comparison")
                return
            # eq: pickTokenizer picks first non-lossy, else (strings) first
            # non-trigram, else tokenizers[0] — then getInequalityTokens
            # rejects multi-token picks other than term/fulltext
            # (worker/tokens.go:173-180)
            ordered = [t.lower() for t in p.indexes]
            picked = next((t for t in ordered if t in NONLOSSY_TOKENIZERS),
                          None)
            if picked is None and p.typ == "string":
                picked = next((t for t in ordered if t != "trigram"), None)
            if picked is None:
                picked = ordered[0]
            if picked in ("trigram", "ngram"):
                raise ValueError(
                    f"Attribute {pred} does not have a valid tokenizer.")

    def validate_sort(self, pred: str) -> None:
        """Reject sort keys the reference rejects (worker/sort.go
        processSort list check; both-sort-paths-fail cases). No-op
        unless ``strict``."""
        if not self.strict:
            return
        p = self.predicates.get(pred)
        if p is None:
            return
        if p.list:
            # worker/sort.go:517
            raise ValueError(
                f"Sorting not supported on attr: {pred} of type: [scalar]")
        if p.typ == "uid":
            # sortWithoutIndex: non-scalar; index path has no tokenizer
            raise ValueError(f"Cannot sort attribute {pred} of type object.")
        if p.typ == "bool":
            # bool tokenizer is unsortable AND types/sort.go can't order
            # bool values, so both sort paths fail
            raise ValueError(f"Attribute {pred} is not sortable.")

    def type_preds(self, type_name: str) -> list[str]:
        return self.types.get(type_name, [])

    def define_type(self, type_name: str, preds: list[str]) -> None:
        self.types[type_name] = list(preds)

    # ---- (de)serialization: the registry is a tiny JSON doc, the Spark
    # equivalent of dgraph's schema tablets. ----
    def to_json(self) -> str:
        return json.dumps(
            {
                "predicates": {
                    n: {
                        "typ": p.typ,
                        "list": p.list,
                        "lang": p.lang,
                        "reverse": p.reverse,
                        "count": p.count,
                        "upsert": p.upsert,
                        "unique": p.unique,
                        "indexes": list(p.indexes),
                    }
                    for n, p in self.predicates.items()
                },
                "types": self.types,
                "strict": self.strict,
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, text: str) -> "SchemaRegistry":
        raw = json.loads(text)
        reg = cls()
        for n, p in raw.get("predicates", {}).items():
            reg.add(Predicate(name=n, indexes=tuple(p.pop("indexes", ())), **p))
        reg.types = {k: list(v) for k, v in raw.get("types", {}).items()}
        reg.strict = bool(raw.get("strict", False))
        return reg

    def alter(self, schema_text: str) -> "SchemaRegistry":
        """Apply a user schema alter in place (edgraph/server.go Alter):
        user-defined names under the ``dgraph.`` namespace are rejected
        with the reference's exact messages."""
        frag = SchemaRegistry.parse(schema_text)
        for t in frag.types:
            if t.startswith("dgraph."):
                raise ValueError(
                    f"Can't alter type `{t}` as it is prefixed with "
                    "`dgraph.` which is reserved as the namespace for "
                    "dgraph's internal types/predicates.")
        names = set(frag.predicates)
        names.update(p for preds in frag.types.values() for p in preds)
        for n in sorted(names):
            if n.startswith("dgraph.") and n != "dgraph.type":
                raise ValueError(
                    f"Can't alter predicate `{n}` as it is prefixed with "
                    "`dgraph.` which is reserved as the namespace for "
                    "dgraph's internal types/predicates.")
        for p in frag.predicates.values():
            self.add(p)
        for t, preds in frag.types.items():
            self.define_type(t, preds)
        return self

    @classmethod
    def parse(cls, schema_text: str) -> "SchemaRegistry":
        """Parse dgraph schema lines, e.g.::

            name: string @index(term, exact, trigram) @count @lang .
            friend: [uid] @reverse @count .
            type Person { name friend age }

        Grammar follows schema/parse.go (subset: no @noconflict options).
        """
        reg = cls(strict=True)
        lines = schema_text.splitlines()
        i = 0
        while i < len(lines):
            line = lines[i].strip()
            i += 1
            if not line or line.startswith("#"):
                continue
            if line.startswith("type "):
                # type block: may span lines until `}`
                block = line
                while "}" not in block and i < len(lines):
                    block += " " + lines[i].strip()
                    i += 1
                name = block[len("type "):block.index("{")].strip()
                body = block[block.index("{") + 1 : block.index("}")]
                preds = [p.strip().rstrip(";").strip("<>") for p in body.replace("\n", " ").split()]
                reg.define_type(name, [p for p in preds if p])
                continue
            reg.add(_parse_pred_line(line))
        return reg


def _parse_pred_line(line: str) -> Predicate:
    line = line.rstrip(" .")
    name, _, rest = line.partition(":")
    rest = rest.strip()
    is_list = rest.startswith("[")
    if is_list:
        close = rest.index("]")
        typ = rest[1:close].strip()
        rest = rest[close + 1 :]
    else:
        parts = rest.split(None, 1)
        typ = parts[0] if parts else "default"
        rest = parts[1] if len(parts) > 1 else ""
    typ = typ.lower()  # schema accepts `dateTime` etc. (schema/parse.go lowercases)
    if typ not in SCALAR_TYPES:
        raise ValueError(f"unknown scalar type {typ!r} in schema line {line!r}")
    pred = Predicate(name=name.strip(), typ=typ, list=is_list)
    rest = rest.strip()
    # directives
    idx = rest.find("@index(")
    if idx >= 0:
        close = rest.index(")", idx)
        toks = rest[idx + len("@index(") : close]
        pred.indexes = tuple(t.strip() for t in toks.split(",") if t.strip())
    pred.lang = "@lang" in rest
    pred.reverse = "@reverse" in rest
    pred.count = "@count" in rest
    pred.upsert = "@upsert" in rest
    pred.unique = "@unique" in rest
    return pred


# ---------------------------------------------------------------- bigfloat
# The reference's bigfloat is 200-bit arbitrary precision
# (types/scalar_types.go:27 BigFloatPrecision). Values store as lexical
# strings; comparisons/sorting use an order-preserving 200-bit key and
# math/aggregation run through mpmath at prec=200 — see
# functions/bigfloat.py.
