"""AST dataclasses — Python mirror of the reference IR surface
(dql/parser.go:40-81 GraphQuery, :156 FilterTree, dql/math.go MathTree).

The same IR serves logical and physical planning, like dgraph's SubGraph
(query/query.go:249); the executor walks it and emits DataFrame plans.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Arg:
    """A root/filter function argument."""

    value: object = None          # literal (str/int/float/bool)
    is_pred: bool = False         # bare identifier => predicate name
    lang: str | None = None       # name@en
    is_val_var: bool = False      # val(x)
    is_count: bool = False        # count(pred)
    is_len: bool = False          # len(var)


@dataclass
class FuncCall:
    """eq/le/gt/.../anyofterms/uid/type/has/similar_to... call."""

    name: str
    args: list[Arg] = field(default_factory=list)
    # named options (`similar_to(p, k, v, distance_threshold: 1.5, ef: 12)`)
    kwargs: dict = field(default_factory=dict)

    @property
    def pred(self) -> str | None:
        for a in self.args:
            if a.is_pred:
                return str(a.value)
        return None

    @property
    def pred_lang(self) -> str | None:
        for a in self.args:
            if a.is_pred:
                return a.lang
        return None

    def literals(self) -> list[object]:
        return [a.value for a in self.args if not a.is_pred and not a.is_val_var
                and not a.is_count and not a.is_len]


@dataclass
class FilterTree:
    """Boolean combinator tree over FuncCalls (dql/parser.go:1516-1520)."""

    op: str = "func"              # 'and' | 'or' | 'not' | 'func'
    children: list["FilterTree"] = field(default_factory=list)
    func: FuncCall | None = None


@dataclass
class MathNode:
    """math() expression tree (dql/math.go:148-157 op set)."""

    op: str | None = None         # operator or None for leaf
    children: list["MathNode"] = field(default_factory=list)
    const: object = None          # numeric literal leaf
    var: str | None = None        # value-variable leaf (val name)


@dataclass
class Order:
    key: str                      # predicate name, or variable name if is_var
    desc: bool = False
    is_var: bool = False          # orderasc: val(x)
    is_facet: bool = False        # @facets(orderasc: f)
    lang: str | None = None


@dataclass
class FacetsSpec:
    """@facets(...) on an attribute or block."""

    all: bool = False                       # @facets (no args) => all facets
    keys: list[tuple[str, str | None]] = field(default_factory=list)  # (key, alias)
    filter: FilterTree | None = None        # @facets(eq(close, true))
    order: list[Order] = field(default_factory=list)
    vars: dict[str, str] = field(default_factory=dict)  # varname -> facet key


@dataclass
class Attr:
    """A scalar leaf inside a block: `alias: name@en`, `count(friend)`,
    `val(v)`, `uid`, `alias: math(...)`, `v as age`."""

    name: str                     # predicate name, or 'uid'/'val'/'count'/'math'/'expand'
    alias: str | None = None
    langs: list[str] = field(default_factory=list)   # ['en','ru','.']
    is_count: bool = False        # count(pred)
    val_var: str | None = None    # val(v) read
    agg_pred: str | None = None   # min(pred) — aggregate over a predicate
                                  # (only legal inside @groupby,
                                  # query/groupby.go aggregateChild)
    pwd: str | None = None        # checkpwd(pred, "secret") candidate
    math: MathNode | None = None  # alias: math(expr)
    var: str | None = None        # `v as age` value-variable assignment
    facets: FacetsSpec | None = None
    expand: str | None = None     # expand(_all_) / expand(Type) / expand(val(v))
    expand_body: "Block | None" = None  # expand(...) { body } — copied into
                                        # every expanded predicate's child
                                        # block (query/query.go:2139-2143)
    filter: FilterTree | None = None
    # count(pred (first/offset/orderasc) @filter(...)): pagination applies
    # to the counted edge set (dql/parser.go parses count as a full child)
    count_first: int | None = None
    count_offset: int | None = None
    count_order: list = field(default_factory=list)

    @property
    def out_name(self) -> str:
        return self.alias or self.name


@dataclass
class GroupBy:
    attrs: list[Attr] = field(default_factory=list)


@dataclass
class RecurseArgs:
    depth: int | None = None
    loop: bool = False


@dataclass
class ShortestArgs:
    from_: object = None          # uid literal or var
    to: object = None
    numpaths: int = 1
    depth: int | None = None
    minweight: float | None = None
    maxweight: float | None = None
    # cap on candidate paths kept per search round
    # (query/query.go:170-173 MaxFrontierSize)
    maxfrontiersize: int | None = None


@dataclass
class Block:
    """One query block (child uid block or root block)."""

    alias: str = "q"
    func: FuncCall | None = None
    filter: FilterTree | None = None
    # traversal attr for child blocks (predicate name; '~pred' if reverse)
    attr: str | None = None
    reverse: bool = False
    children: list["Block | Attr"] = field(default_factory=list)
    order: list[Order] = field(default_factory=list)
    first: int | None = None
    offset: int | None = None
    after: int | None = None
    # variable assignment: `x as friend {...}` at block level => uid var
    var: str | None = None
    # directives
    cascade: list[str] | None = None       # [] == all, else listed preds
    normalize: bool = False
    ignorereflex: bool = False
    recurse: RecurseArgs | None = None
    shortest: ShortestArgs | None = None
    groupby: GroupBy | None = None
    facets: FacetsSpec | None = None
    is_var_block: bool = False             # `var(func: ...)`
    is_count_block: bool = False           # count(uid) only block
    is_schema: bool = False                # `schema(pred: [...]) { ... }`
    schema_preds: list[str] = field(default_factory=list)
    schema_types: list[str] = field(default_factory=list)  # `schema(type: [...])`


@dataclass
class ParsedQuery:
    blocks: list[Block] = field(default_factory=list)
    query_vars: dict[str, object] = field(default_factory=dict)  # $var -> value
