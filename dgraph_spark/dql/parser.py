"""Hand-rolled DQL lexer + recursive-descent parser.

Covers the query surface documented in SURVEY.md §2 (reference grammar:
dql/parser.go — lexer in lex/, parser entry dql/parser.go:615). Mutation
syntax is handled separately (mutations.py); this module parses read
queries: blocks, root functions, filter trees, directives, pagination,
variables, math, groupby, recurse, shortest.
"""

from __future__ import annotations

import re

from dgraph_spark.dql.ast import (
    Arg,
    Attr,
    Block,
    FacetsSpec,
    FilterTree,
    FuncCall,
    GroupBy,
    MathNode,
    Order,
    ParsedQuery,
    RecurseArgs,
    ShortestArgs,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<regex>/(?:\\.|[^/\\])+/[a-z]*)
  | (?P<number>0[xX][0-9a-fA-F]+|-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+)
  | (?P<name>[a-zA-Z_$][a-zA-Z0-9_.\-]*)
  | (?P<punct><=|>=|==|!=|&&|\|\||[{}()\[\]:,@~*/+\-%<>=.!|])
    """,
    re.VERBOSE,
)

_KEY_PARAMS = {"first", "offset", "after", "orderasc", "orderdesc", "func",
               "depth", "loop", "from", "to", "numpaths", "minweight", "maxweight",
               "maxfrontiersize"}


class Token:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind
        self.text = text
        self.pos = pos

    def __repr__(self):
        return f"Token({self.kind},{self.text!r})"


def tokenize(src: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise SyntaxError(f"DQL lex error at offset {i}: {src[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Token(kind, m.group(), m.start()))
    out.append(Token("eof", "", len(src)))
    return out


class Parser:
    def __init__(self, src: str, vars: dict | None = None):
        self.toks = tokenize(src)
        self.i = 0
        self.vars = vars or {}

    def _subst(self, text: str):
        """GraphQL-style query variables: `$a` -> bound value
        (dql/parser.go Vars)."""
        if text.startswith("$"):
            if text not in self.vars:
                raise ValueError(f"undefined query variable {text}")
            return self.vars[text]
        return text

    # ---- token helpers ----
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def accept(self, text: str) -> bool:
        if self.peek().text == text:
            self.next()
            return True
        return False

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"DQL parse error at {t.pos}: expected {text!r}, got {t.text!r}")
        return t

    def expect_kind(self, kind: str) -> Token:
        t = self.next()
        if t.kind != kind:
            raise SyntaxError(f"DQL parse error at {t.pos}: expected {kind}, got {t.text!r}")
        return t

    # ---- entry ----
    def parse(self) -> ParsedQuery:
        q = ParsedQuery()
        # optional `query name($a: int = 1, ...)` header — declared
        # defaults fill self.vars for any binding the caller didn't pass
        if self.peek().text == "query":
            self.next()
            if self.peek().kind == "name":
                self.next()
            if self.peek().text == "(":
                self.next()
                while not self.accept(")"):
                    self.accept(",")
                    vname = self.expect_kind("name").text
                    self.expect(":")
                    self.expect_kind("name")  # type
                    if self.accept("="):
                        t = self.next()
                        dval = _num(t.text) if t.kind == "number" else _unquote(t.text) if t.kind == "string" else t.text
                        self.vars.setdefault(vname, dval)
        if self.peek().text == "schema":
            # standalone `schema(...) { ... }` query (no outer braces)
            q.blocks.append(self.parse_block(root=True))
            return q
        self.expect("{")
        while not self.accept("}"):
            q.blocks.append(self.parse_block(root=True))
        return q

    # ---- blocks ----
    def parse_block(self, root: bool) -> Block:
        b = Block()
        t = self.expect_kind("name")
        name = t.text
        # `x as q(func: ...)` or `x as friend { }` — uid var assignment
        if self.peek().text.lower() == "as" and self.peek().kind == "name":
            self.next()
            b.var = name
            name = self.expect_kind("name").text
        b.alias = name
        if name == "var":
            b.is_var_block = True
        if root:
            if name == "schema":
                # schema introspection block (dql/parser.go:662 getSchema)
                b.is_schema = True
                if self.accept("("):
                    while not self.accept(")"):
                        self.accept(",")
                        key = self.expect_kind("name").text
                        self.expect(":")
                        if self.peek().text == "[":
                            vals = [str(x) for x in self._parse_array_string_list()]
                        else:
                            vals = [self.next().text.strip('"')]
                        # `schema(type: ...)` introspects TYPE definitions
                        # (dql/parser.go getSchema "type" arg)
                        if key == "type":
                            b.schema_types = vals
                        else:
                            b.schema_preds = vals
                if self.peek().text == "{":
                    self.parse_body(b)
                return b
            if name in ("shortest",):
                b.shortest = ShortestArgs()
                b.alias = "_path_"  # dgraph's output key for shortest blocks
        else:
            b.attr = name
        while True:
            if self.peek().text == "(":
                self.parse_block_params(b)
            elif self.peek().text == "@":
                self.parse_directives(b)
            else:
                break
        if self.peek().text == "{":
            self.parse_body(b)
        return b

    def parse_block_params(self, b: Block) -> None:
        self.expect("(")
        while not self.accept(")"):
            self.accept(",")
            key = self.expect_kind("name").text
            self.expect(":")
            if key == "func":
                b.func = self.parse_func()
            elif key in ("orderasc", "orderdesc"):
                b.order.append(self.parse_order_key(desc=(key == "orderdesc")))
            elif key == "first":
                b.first = int(self._subst(self.next().text))
                if b.first == 0:
                    b.first = None  # first: 0 == unset (x/x.go PageRange)
            elif key == "offset":
                b.offset = int(self._subst(self.next().text))
            elif key == "after":
                t = self.next()
                b.after = int(t.text, 0)
            elif key == "depth":
                if b.shortest is not None:
                    b.shortest.depth = int(self.next().text)
                else:
                    b.recurse = b.recurse or RecurseArgs()
                    b.recurse.depth = int(self.next().text)
            elif key == "loop":
                b.recurse = b.recurse or RecurseArgs()
                b.recurse.loop = self.next().text == "true"
            elif key == "maxfrontiersize":
                # caps the candidate-path frontier during shortest-path
                # search (query/query.go:727-734)
                b.shortest = b.shortest or ShortestArgs()
                b.shortest.maxfrontiersize = int(self._subst(self.next().text))
            elif key in ("from", "to", "numpaths", "minweight", "maxweight"):
                b.shortest = b.shortest or ShortestArgs()
                if key in ("minweight", "maxweight"):
                    w = float(self._subst(self.next().text))
                    if key == "minweight":
                        b.shortest.minweight = w
                    else:
                        b.shortest.maxweight = w
                else:
                    val = self.parse_shortest_endpoint()
                    if key == "from":
                        b.shortest.from_ = val
                    elif key == "to":
                        b.shortest.to = val
                    else:
                        b.shortest.numpaths = int(val)
            else:
                # unknown param: consume one value token
                self.next()

    def parse_shortest_endpoint(self):
        t = self.next()
        if t.kind == "number":
            return int(t.text, 0)  # decimal or 0x-hex uid literal
        if t.kind == "name" and t.text == "uid":
            self.expect("(")
            v = self.next().text
            self.expect(")")
            try:
                return int(v, 0)
            except ValueError:
                # uid(q) referencing a uid variable defined by another
                # block (query/shortest.go expandVars) — resolved at exec
                return v
        if t.kind == "name" and t.text.startswith("0x"):
            return int(t.text, 16)
        return t.text

    def parse_order_key(self, desc: bool) -> Order:
        t = self.next()
        if t.text == "val":
            self.expect("(")
            var = self.expect_kind("name").text
            self.expect(")")
            return Order(key=var, desc=desc, is_var=True)
        key = t.text
        lang = None
        if self.peek().text == "@":
            self.next()
            lang = self.expect_kind("name").text
        return Order(key=key, desc=desc, lang=lang)

    # ---- functions ----
    def parse_func(self) -> FuncCall:
        name = self.expect_kind("name").text
        self.expect("(")
        f = FuncCall(name=name)
        first = True
        while not self.accept(")"):
            if not first:
                self.accept(",")
            first = False
            f.args.append(self.parse_arg(f, len(f.args)))
        return f

    def parse_arg(self, f: FuncCall, argpos: int) -> Arg:
        t = self.peek()
        if t.kind == "string":
            self.next()
            return Arg(value=_unquote(t.text))
        if t.kind == "regex":
            self.next()
            return Arg(value=t.text)
        if t.kind == "number":
            self.next()
            return Arg(value=_num(t.text))
        if t.text == "[":  # (nested) array literal: similar_to vectors, geo coords
            return Arg(value=self._parse_array_literal())
        if t.text == "~":
            # reverse-predicate argument, e.g. has(~of_part)
            self.next()
            name = self.expect_kind("name").text
            first_pred = argpos == 0 and f.name not in ("uid",)
            return Arg(value="~" + name, is_pred=first_pred)
        if t.kind == "name":
            self.next()
            name = t.text
            if name.startswith("$"):
                return Arg(value=self._subst(name))
            if name in ("true", "false"):
                return Arg(value=(name == "true"))
            if name == "val" and self.peek().text == "(":
                self.next()
                var = self.expect_kind("name").text
                self.expect(")")
                return Arg(value=var, is_val_var=True)
            if name == "count" and self.peek().text == "(":
                self.next()
                rev = self.accept("~")
                pred = self.expect_kind("name").text
                self.expect(")")
                return Arg(value=("~" + pred if rev else pred), is_count=True)
            if name == "len" and self.peek().text == "(":
                self.next()
                var = self.expect_kind("name").text
                self.expect(")")
                return Arg(value=var, is_len=True)
            lang = None
            if self.peek().text == "@":
                self.next()
                if self.peek().text in (".", "*"):
                    lang = self.next().text
                else:
                    lang = self.expect_kind("name").text
            # In uid(...)/similar_to position, bare names may be variables —
            # the executor resolves pred-vs-var by context.
            first_pred = argpos == 0 and f.name not in ("uid",)
            return Arg(value=name, is_pred=first_pred, lang=lang)
        raise SyntaxError(f"DQL parse error at {t.pos}: unexpected {t.text!r} in args")

    def _parse_array_string_list(self):
        self.expect("[")
        out = []
        while not self.accept("]"):
            self.accept(",")
            t = self.next()
            out.append(_unquote(t.text) if t.kind == "string" else t.text)
        return out

    def _parse_array_literal(self):
        self.expect("[")
        out = []
        while not self.accept("]"):
            self.accept(",")
            if self.peek().kind == "string":
                # eq(name, ["a", "b"]) multi-value form (dql/parser.go
                # parseFuncArgs IsValueVar list)
                out.append(_unquote(self.next().text))
            elif self.peek().text == "[":
                out.append(self._parse_array_literal())
            else:
                out.append(_num(self.next().text))
        return out

    # ---- filter trees ----
    def parse_filter_tree(self) -> FilterTree:
        return self.parse_or()

    def parse_or(self) -> FilterTree:
        left = self.parse_and()
        while self.peek().text in ("OR", "or", "||", "|"):
            self.next()
            right = self.parse_and()
            if left.op == "or":
                left.children.append(right)
            else:
                left = FilterTree(op="or", children=[left, right])
        return left

    def parse_and(self) -> FilterTree:
        left = self.parse_not()
        while self.peek().text in ("AND", "and", "&&"):
            self.next()
            right = self.parse_not()
            if left.op == "and":
                left.children.append(right)
            else:
                left = FilterTree(op="and", children=[left, right])
        return left

    def parse_not(self) -> FilterTree:
        if self.peek().text in ("NOT", "not", "!"):
            self.next()
            return FilterTree(op="not", children=[self.parse_not()])
        if self.accept("("):
            inner = self.parse_or()
            self.expect(")")
            return inner
        return FilterTree(op="func", func=self.parse_func())

    # ---- directives ----
    def parse_directives(self, b: Block) -> None:
        while self.peek().text == "@":
            self.next()
            # directive names are case-insensitive (@IGNOREREFLEX,
            # @ignoreReflex — dql/parser.go validateDirectives lowercases)
            name = self.expect_kind("name").text.lower()
            if name == "filter":
                self.expect("(")
                b.filter = self.parse_filter_tree()
                self.expect(")")
            elif name == "cascade":
                b.cascade = []
                if self.accept("("):
                    while not self.accept(")"):
                        self.accept(",")
                        b.cascade.append(self.next().text)
            elif name == "normalize":
                b.normalize = True
            elif name == "ignorereflex":
                b.ignorereflex = True
            elif name == "recurse":
                b.recurse = b.recurse or RecurseArgs()
                if self.accept("("):
                    while not self.accept(")"):
                        self.accept(",")
                        k = self.expect_kind("name").text
                        self.expect(":")
                        v = self.next().text
                        if k == "depth":
                            b.recurse.depth = int(v)
                        elif k == "loop":
                            b.recurse.loop = v == "true"
            elif name == "groupby":
                self.expect("(")
                gb = GroupBy()
                while not self.accept(")"):
                    self.accept(",")
                    gb.attrs.append(self.parse_groupby_attr())
                b.groupby = gb
            elif name == "facets":
                spec = self.parse_facets_spec()
                b.facets = _merge_facets(b.facets, spec)
            else:
                # unknown directive with optional args — skip
                if self.accept("("):
                    depth = 1
                    while depth:
                        t = self.next()
                        if t.text == "(":
                            depth += 1
                        elif t.text == ")":
                            depth -= 1

    def parse_groupby_attr(self) -> Attr:
        alias = None
        name = self.expect_kind("name").text
        if self.peek().text == ":":
            self.next()
            alias = name
            name = self.expect_kind("name").text
        return Attr(name=name, alias=alias)

    def parse_facets_spec(self) -> FacetsSpec:
        spec = FacetsSpec()
        if not self.accept("("):
            spec.all = True
            return spec
        while not self.accept(")"):
            self.accept(",")
            t = self.peek()
            if t.text in ("orderasc", "orderdesc"):
                self.next()
                self.expect(":")
                key = self.expect_kind("name").text
                spec.order.append(Order(key=key, desc=(t.text == "orderdesc"), is_facet=True))
            elif t.kind == "name" and self.peek(1).text.lower() == "as" and self.peek(1).kind == "name":
                var = self.next().text
                self.next()  # as
                key = self.expect_kind("name").text
                spec.vars[var] = key
            elif t.kind == "name" and self.peek(1).text == "(" :
                # facet filter function, e.g. eq(close, true)
                spec.filter = self.parse_filter_tree()
            elif t.kind == "name" and self.peek(1).text == ":":
                alias = self.next().text
                self.next()
                key = self.expect_kind("name").text
                spec.keys.append((key, alias))
            else:
                key = self.next().text
                spec.keys.append((key, None))
        return spec

    # ---- block body ----
    def parse_body(self, b: Block) -> None:
        self.expect("{")
        while not self.accept("}"):
            b.children.append(self.parse_body_item())

    def parse_body_item(self):
        # var assignment: `x as <attr-or-block>`
        var = None
        reverse = False
        alias = None
        t = self.peek()
        if t.kind == "name" and self.peek(1).text.lower() == "as" and self.peek(1).kind == "name":
            var = self.next().text
            self.next()
            t = self.peek()
        # alias: name
        if t.kind == "name" and self.peek(1).text == ":" and self.peek(2).text != ":":
            nxt = self.peek(2)
            if not (nxt.kind == "name" and nxt.text in ("math", "count", "val", "uid", "min", "max", "sum", "avg")):
                alias = self.next().text
                self.next()
                t = self.peek()
            else:
                alias = self.next().text
                self.next()
                t = self.peek()
        # `alias: v as math(...)` — var assignment AFTER the alias
        # (dql/parser.go allows both orders)
        if (var is None and t.kind == "name"
                and self.peek(1).text.lower() == "as" and self.peek(1).kind == "name"):
            var = self.next().text
            self.next()
            t = self.peek()
        if self.accept("~"):
            reverse = True
            t = self.peek()

        name = self.expect_kind("name").text

        # count(pred) / val(v) / math(...) / min|max|sum|avg(val(v)) / expand(...)
        if name == "checkpwd" and self.peek().text == "(":
            # checkpwd(pred, "secret") as an output attribute
            # (query/query.go isCheckPwd; renders `checkpwd(pred): bool`)
            self.next()
            pred = self.expect_kind("name").text
            self.accept(",")
            pw = _unquote(self.expect_kind("string").text)
            self.expect(")")
            return Attr(name="checkpwd", alias=alias, agg_pred=pred, pwd=pw, var=var)
        if name == "count" and self.peek().text == "(":
            self.next()
            if self.peek().text == "uid":
                self.next()
                self.expect(")")
                return Attr(name="uid", alias=alias, is_count=True, var=var)
            inner_rev = self.accept("~")
            pred = self.expect_kind("name").text
            a = Attr(name=("~" + pred if inner_rev else pred), alias=alias, is_count=True, var=var)
            # count(pred (params) @filter(...)) — the counted edge is a full
            # child subgraph: pagination + filter apply BEFORE counting
            # (dql/parser.go godeep on count child)
            while self.peek().text in ("(", "@"):
                if self.peek().text == "(":
                    blk = Block(alias=pred, attr=pred)
                    self.parse_block_params(blk)
                    a.count_first, a.count_offset = blk.first, blk.offset
                    a.count_order = blk.order
                else:
                    self.next()
                    dname = self.expect_kind("name").text
                    if dname != "filter":
                        raise SyntaxError(f"unexpected @{dname} inside count()")
                    self.expect("(")
                    a.filter = self.parse_filter_tree()
                    self.expect(")")
            self.expect(")")
            # trailing forms: count(pred) @filter(...) / @facets(eq(...))
            # — filter/facet-filter the counted edges before counting
            # (query_facets_test.go TestCountFacetsFiltering*)
            while self.peek().text == "@":
                save = self.i
                self.next()
                dname = self.expect_kind("name").text
                if dname == "filter":
                    self.expect("(")
                    a.filter = self.parse_filter_tree()
                    self.expect(")")
                elif dname == "facets":
                    a.facets = _merge_facets(a.facets, self.parse_facets_spec())
                else:
                    self.i = save
                    break
            return a
        if name == "val" and self.peek().text == "(":
            self.next()
            v = self.expect_kind("name").text
            self.expect(")")
            return Attr(name="val", alias=alias, val_var=v, var=var)
        if name == "math" and self.peek().text == "(":
            self.next()
            node = self.parse_math_expr()
            self.expect(")")
            return Attr(name="math", alias=alias, math=node, var=var)
        if name in ("min", "max", "sum", "avg") and self.peek().text == "(":
            self.next()
            if self.peek().text == "val":
                self.next()
                self.expect("(")
                v = self.expect_kind("name").text
                self.expect(")")
                self.expect(")")
                return Attr(name=name, alias=alias, val_var=v, var=var)
            # min(pred) — aggregate straight over a predicate; only legal
            # inside @groupby (query/groupby.go aggregateChild)
            p = self.expect_kind("name").text
            self.expect(")")
            return Attr(name=name, alias=alias, agg_pred=p, var=var)
        if name == "expand" and self.peek().text == "(":
            self.next()
            arg_t = self.next()
            arg = arg_t.text
            if arg == "val":
                self.expect("(")
                arg = "val:" + self.expect_kind("name").text
                self.expect(")")
            # expand(Type1, Type2): union of several types' predicates
            while self.peek().text == ",":
                self.next()
                arg += "," + self.expect_kind("name").text
            self.expect(")")
            blk = Block(alias="expand", attr="expand")
            attr = Attr(name="expand", alias=alias, expand=arg, var=var)
            if self.peek().text == "@":
                # expand(_all_) @filter(...): filters the expanded nodes
                save = self.i
                self.next()
                if self.expect_kind("name").text.lower() == "filter":
                    self.expect("(")
                    attr.filter = self.parse_filter_tree()
                    self.expect(")")
                else:
                    self.i = save
            if self.peek().text == "{":
                # expand(...) { ... } nested body applies to each expanded
                # uid predicate (query/query.go:2139-2143 recursiveCopy)
                self.parse_body(blk)
                attr.expand_body = blk
            return attr

        # lang tags: name@en:ru:.
        langs: list[str] = []
        if self.peek().text == "@" and (
            self.peek(1).kind == "name" or self.peek(1).text in (".", "*")
        ) and self.peek(1).text != "filter":
            save = self.i
            self.next()
            if self.peek().text in (".", "*"):
                langs.append(self.next().text)
                nxt = None
            else:
                nxt = self.expect_kind("name").text
            if nxt in ("filter", "facets", "cascade", "normalize", "recurse", "groupby", "ignorereflex"):
                self.i = save
            elif nxt is not None:
                langs.append(nxt)
                while self.accept(":"):
                    if self.peek().text == ".":
                        self.next()
                        langs.append(".")
                    else:
                        langs.append(self.expect_kind("name").text)

        # Does a block follow? (params/directives/body, any order)
        if self.peek().text == "(" or self._block_follows():
            blk = Block(alias=alias or name, attr=name, reverse=reverse, var=var)
            while True:
                if self.peek().text == "(":
                    self.parse_block_params(blk)
                elif self.peek().text == "@":
                    self.parse_directives(blk)
                else:
                    break
            if self.peek().text == "{":
                self.parse_body(blk)
            return blk

        # plain scalar attr, possibly with @facets / @filter directives
        attr = Attr(name=name, alias=alias, langs=langs, var=var)
        attr.name = ("~" + name) if reverse else name
        while self.peek().text == "@":
            save = self.i
            self.next()
            dname = self.expect_kind("name").text
            if dname == "facets":
                attr.facets = _merge_facets(attr.facets, self.parse_facets_spec())
            elif dname == "filter":
                self.expect("(")
                attr.filter = self.parse_filter_tree()
                self.expect(")")
            else:
                self.i = save
                break
        return attr

    def _block_follows(self) -> bool:
        # a `{` after any mix of (params) / @directive[(args)] groups means
        # this item is a block
        j = self.i
        toks = self.toks

        def skip_parens(j: int) -> int:
            depth = 0
            while j < len(toks):
                if toks[j].text == "(":
                    depth += 1
                elif toks[j].text == ")":
                    depth -= 1
                    if depth == 0:
                        return j + 1
                j += 1
            return j

        while j < len(toks):
            t = toks[j]
            if t.text == "@":
                j += 2  # @ name
                if j < len(toks) and toks[j].text == "(":
                    j = skip_parens(j)
                continue
            if t.text == "(":
                j = skip_parens(j)
                continue
            return t.text == "{"
        return False

    # ---- math expressions (dql/math.go precedence) ----
    def parse_math_expr(self) -> MathNode:
        return self.parse_math_cmp()

    def parse_math_cmp(self) -> MathNode:
        left = self.parse_math_add()
        while self.peek().text in ("<", ">", "<=", ">=", "==", "!="):
            op = self.next().text
            right = self.parse_math_add()
            left = MathNode(op=op, children=[left, right])
        return left

    def parse_math_add(self) -> MathNode:
        left = self.parse_math_mul()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            right = self.parse_math_mul()
            left = MathNode(op=op, children=[left, right])
        return left

    def parse_math_mul(self) -> MathNode:
        left = self.parse_math_unary()
        while self.peek().text in ("*", "/", "%"):
            op = self.next().text
            right = self.parse_math_unary()
            left = MathNode(op=op, children=[left, right])
        return left

    _MATH_FUNCS = {"exp", "ln", "sqrt", "floor", "ceil", "since", "pow",
                   "logbase", "min", "max", "dot", "cond", "sqrt"}

    def parse_math_unary(self) -> MathNode:
        t = self.peek()
        if t.text == "-":
            self.next()
            return MathNode(op="u-", children=[self.parse_math_unary()])
        if t.text == "(":
            self.next()
            inner = self.parse_math_expr()
            self.expect(")")
            return inner
        if t.kind == "number":
            self.next()
            return MathNode(const=_num(t.text))
        if t.kind == "name":
            self.next()
            name = t.text
            if name in self._MATH_FUNCS and self.peek().text == "(":
                self.next()
                node = MathNode(op=name, children=[])
                while not self.accept(")"):
                    self.accept(",")
                    node.children.append(self.parse_math_expr())
                return node
            if name == "val" and self.peek().text == "(":
                self.next()
                v = self.expect_kind("name").text
                self.expect(")")
                return MathNode(var=v)
            # bare name == value variable reference
            return MathNode(var=name)
        raise SyntaxError(f"DQL math parse error at {t.pos}: {t.text!r}")


def _merge_facets(a: FacetsSpec | None, b: FacetsSpec) -> FacetsSpec:
    """Multiple @facets(...) directives on one item merge (dgraph allows a
    filter spec and a projection spec side by side)."""
    if a is None:
        return b
    a.all = a.all or b.all
    a.keys.extend(b.keys)
    a.order.extend(b.order)
    a.vars.update(b.vars)
    if b.filter is not None:
        a.filter = b.filter if a.filter is None else FilterTree(op="and", children=[a.filter, b.filter])
    return a


_ESCAPES = {'"': '"', "'": "'", "\\": "\\", "/": "/", "n": "\n",
            "t": "\t", "r": "\r", "b": "\b", "f": "\f", "0": "\0"}


def _unquote(s: str) -> str:
    """Decode escape sequences UTF-8-safely (dql/state.go lexes strings
    as UTF-8; unicode_escape would round-trip through latin-1 and
    corrupt non-ASCII text like "José")."""
    body = s[1:-1]

    def sub(m: "re.Match[str]") -> str:
        e = m.group(1)
        if e[0] == "u":
            return chr(int(e[1:], 16))
        return _ESCAPES.get(e, e)

    return re.sub(r"\\(u[0-9a-fA-F]{4}|.)", sub, body)


def _num(s: str):
    if s.lower().startswith("0x"):
        return int(s, 16)
    return float(s) if ("." in s or "e" in s or "E" in s) else int(s)


def parse_dql(src: str, vars: dict | None = None) -> ParsedQuery:
    """Parse a DQL read query into the AST (reference: dql.Parse,
    dql/parser.go:615). ``vars`` binds `$name` query variables;
    header-declared defaults apply when a binding is missing."""
    return Parser(src, vars).parse()
