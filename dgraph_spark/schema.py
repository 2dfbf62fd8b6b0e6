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
    "bigfloat": "decimal(38,10)",
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
        return reg

    @classmethod
    def parse(cls, schema_text: str) -> "SchemaRegistry":
        """Parse dgraph schema lines, e.g.::

            name: string @index(term, exact, trigram) @count @lang .
            friend: [uid] @reverse @count .
            type Person { name friend age }

        Grammar follows schema/parse.go (subset: no @noconflict options).
        """
        reg = cls()
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
