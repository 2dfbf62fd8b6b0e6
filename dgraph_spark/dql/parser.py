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
  | (?P<regex>/(?:\\.|[^/\\])+/[a-zA-Z]*)
  | (?P<number>0[xX][0-9a-fA-F]+|-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+)
  | (?P<name>[a-zA-Z_$](?:[a-zA-Z0-9_.]|-(?=[a-zA-Z_]))*)  # '-' only before a letter (lex: es-419 fails at '4')
  | (?P<iri><[^<>\s{}()\[\],=]+>)
  | (?P<punct><=|>=|==|!=|&&|\|\||[{}()\[\]:,@~*/+\-%<>=.!|])
    """,
    re.VERBOSE,
)

_KEY_PARAMS = {"first", "offset", "after", "orderasc", "orderdesc", "func",
               "depth", "loop", "from", "to", "numpaths", "minweight", "maxweight",
               "maxfrontiersize"}


class Token:
    __slots__ = ("kind", "text", "pos", "end")

    def __init__(self, kind: str, text: str, pos: int, end: int | None = None):
        self.kind = kind
        self.text = text
        self.pos = pos
        # source end offset — differs from pos+len(text) when the token
        # text was rewritten (IRI `<name>` stripped to `name`), which
        # matters for "@lang must be adjacent" checks
        self.end = pos + len(text) if end is None else end

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
        if kind == "regex" and (not out or out[-1].text != ","):
            # a /.../ literal only occurs as regexp()'s second argument,
            # right after the comma (lex/iri.go lexes it contextually);
            # anywhere else '/' is the division operator — without this,
            # math(a / (b/c)) swallows "/ (b/c" as a regex
            out.append(Token("punct", "/", m.start()))
            i = m.start() + 1
            continue
        out.append(Token(kind, m.group(), m.start()))
    out.append(Token("eof", "", len(src)))
    return out


class _FragmentRef:
    """Placeholder for `...name` until fragment definitions are parsed."""

    def __init__(self, name: str, pos: int):
        self.name = name
        self.pos = pos


class Parser:
    def __init__(self, src: str, vars: dict | None = None,
                 allow_unused: bool = False):
        self.toks = tokenize(src)
        self.i = 0
        self.vars = vars or {}
        self.allow_unused = allow_unused
        self.fragments: dict[str, list] = {}

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
        if kind == "name" and t.kind == "iri":
            # IRI-quoted predicate name `<http://...>` (lex/iri.go) —
            # usable wherever a bare name is
            return Token("name", t.text[1:-1], t.pos, end=t.end)
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
                    vtype = self.expect_kind("name").text.lower()
                    self.accept("!")
                    if vname in self.vars:
                        # typed bindings validate against the declaration
                        # (dql/parser.go checkValueType)
                        b = str(self.vars[vname])
                        if vtype == "int":
                            try:
                                int(b)
                            except ValueError:
                                raise SyntaxError(
                                    f"Expected an int but got {b}") from None
                        elif vtype == "float":
                            try:
                                float(b)
                            except ValueError:
                                raise SyntaxError(
                                    f"Expected a float but got {b}") from None
                        elif vtype == "bool" and b not in ("true", "false",
                                                           "True", "False"):
                            raise SyntaxError(f"Expected a bool but got {b}")
                    if self.accept("="):
                        t = self.next()
                        dval = _num(t.text) if t.kind == "number" else _unquote(t.text) if t.kind == "string" else t.text
                        self.vars.setdefault(vname, dval)
        if self.peek().text == "schema":
            # standalone `schema(...) { ... }` query (no outer braces)
            q.blocks.append(self.parse_block(root=True))
            if self.peek().text == "schema":
                raise SyntaxError("Only one schema block allowed")
            if self.peek().kind != "eof":
                raise SyntaxError(
                    f"DQL parse error at {self.peek().pos}: unexpected trailing "
                    f"{self.peek().text!r}")
            return q
        # GraphQL-style fragments may precede or follow the query body
        # (dql/parser.go parseFragment; spliced by substituteFragments)
        while self.peek().text == "fragment":
            self._parse_fragment_def()
        self.expect("{")
        while not self.accept("}"):
            q.blocks.append(self.parse_block(root=True))
        while self.peek().text == "fragment":
            self._parse_fragment_def()
        if self.peek().kind != "eof":
            raise SyntaxError(
                f"DQL parse error at {self.peek().pos}: unexpected trailing "
                f"{self.peek().text!r}")
        for b in q.blocks:
            self._splice_fragments(b, ())
        seen_aliases: set[str] = set()
        for b in q.blocks:
            # dql/parser.go:740 validateResult — var/shortest blocks are
            # exempt from the unique-alias rule
            if b.is_var_block or b.shortest is not None or b.is_schema:
                continue
            if b.alias in seen_aliases:
                raise SyntaxError(
                    f"Duplicate aliases not allowed: {b.alias}")
            seen_aliases.add(b.alias)
        _validate_vars(q, allow_unused=self.allow_unused)
        return q

    def _parse_fragment_def(self) -> None:
        self.next()  # 'fragment'
        name = self.expect_kind("name").text
        holder = Block()
        self.parse_body(holder)
        self.fragments[name] = holder.children

    def _splice_fragments(self, b: Block, stack: tuple) -> None:
        import copy as _copy

        out = []
        for c in b.children:
            if isinstance(c, _FragmentRef):
                if c.name in stack:
                    raise SyntaxError(f"cyclic fragment reference: {c.name}")
                if c.name not in self.fragments:
                    raise SyntaxError(
                        f"DQL parse error at {c.pos}: undefined fragment {c.name!r}")
                sub = Block(children=_copy.deepcopy(self.fragments[c.name]))
                self._splice_fragments(sub, stack + (c.name,))
                out.extend(sub.children)
                continue
            if isinstance(c, Block):
                self._splice_fragments(c, stack)
            out.append(c)
        b.children = out

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
                    if self.peek().text == ")":
                        raise SyntaxError("Invalid schema block")
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
        saw_params = False
        while True:
            if self.peek().text == "(":
                self.parse_block_params(b)
                saw_params = True
            elif self.peek().text == "@":
                self.parse_directives(b, root=root)
            else:
                break
        if root and not saw_params:
            # every root block takes an argument list, even an empty one
            # (dql/parser.go: "Expected Left round brackets")
            raise SyntaxError(
                f"DQL parse error at {t.pos}: Expected Left round brackets. "
                f"Got: {self.peek().text!r}")
        if self.peek().text == "{":
            self.parse_body(b)
        if (b.func is None and not b.is_var_block and root and saw_params
                and b.shortest is None):
            # empty-uid block (`me() { ... }`): only aggregates / math
            # (query/query.go:2864 "Only aggregation/math functions
            # allowed inside empty blocks.")
            for c in b.children:
                if isinstance(c, Block):
                    raise SyntaxError(
                        "Only aggregation/math functions allowed inside "
                        f"empty blocks. Got: {c.attr}")
                if not ((c.name in ("min", "max", "sum", "avg") and c.val_var)
                        or c.math is not None):
                    raise SyntaxError(
                        "Only aggregation/math functions allowed inside "
                        f"empty blocks. Got: {c.name}")
        return b

    def parse_block_params(self, b: Block) -> None:
        self.expect("(")
        while not self.accept(")"):
            self.accept(",")
            key = self.expect_kind("name").text
            self.expect(":")
            if key == "func":
                if b.func is not None:
                    raise SyntaxError("Only one function allowed at root")
                b.func = self.parse_func()
            elif key in ("orderasc", "orderdesc"):
                o = self.parse_order_key(desc=(key == "orderdesc"))
                for prev in b.order:
                    if prev.key == o.key and prev.is_var == o.is_var:
                        raise SyntaxError(
                            f"Sorting by an attribute: [{o.key}] can only be done once")
                if b.order and (o.is_var or any(p.is_var for p in b.order)):
                    # dql/parser.go:1414 — a val(v) sort key must be the
                    # ONLY sort key
                    raise SyntaxError(
                        "Multiple sorting only allowed by predicates. "
                        f"Got: {o.key}")
                b.order.append(o)
            elif key == "first":
                if b.first is not None:
                    raise SyntaxError('Got repeated key "first"')
                self.accept("+")  # `first: +4` (lex itemPlus before number)
                b.first = int(self._subst(self.next().text))
                if b.first == 0:
                    b.first = None  # first: 0 == unset (x/x.go PageRange)
            elif key == "offset":
                if b.offset is not None:
                    raise SyntaxError('Got repeated key "offset"')
                self.accept("+")
                b.offset = int(self._subst(self.next().text))
            elif key == "after":
                t = self.next()
                try:
                    v = int(str(self._subst(t.text)), 0)
                    if v < 0:
                        raise ValueError
                except ValueError:
                    # x/parse.go ParseUint failure text, surfaced verbatim
                    raise SyntaxError(
                        f'strconv.ParseUint: parsing "{t.text}": '
                        "invalid syntax") from None
                b.after = v
            elif key == "depth":
                t = self.next()
                try:
                    d = int(str(self._subst(t.text)))
                except ValueError:
                    # query/recurse.go parse: typed directive args
                    raise SyntaxError(
                        "Value inside depth should be type of integer"
                    ) from None
                if b.shortest is not None:
                    b.shortest.depth = d
                else:
                    b.recurse = b.recurse or RecurseArgs()
                    b.recurse.depth = d
            elif key == "loop":
                t = self.next()
                v = str(self._subst(t.text))
                if v not in ("true", "false"):
                    raise SyntaxError(
                        "Value inside loop should be type of boolean")
                b.recurse = b.recurse or RecurseArgs()
                b.recurse.loop = v == "true"
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
                # dql/parser.go parseArguments: "Got invalid keyword: %s"
                raise SyntaxError(f"Got invalid keyword: {key}")

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
        if name.lower() == "var":
            # uid vars read via uid(x), value vars via val(x)
            raise SyntaxError("Unexpected var(). Maybe you want to try using uid()")
        first = True
        while not self.accept(")"):
            if not first and not self.accept(","):
                # arguments are comma-separated (dql/parser.go
                # parseFunction: expected comma or language)
                raise SyntaxError(
                    f"Expected comma or language but got: {self.peek().text}")
            first = False
            # named option `distance_threshold: 1.5, ef: 12` (v25
            # similar_to options; dql/parser.go parseFuncArgs key:value)
            if (self.peek().kind == "name" and self.peek(1).text == ":"
                    and (self.peek(2).kind in ("number", "string")
                         or self.peek(2).text.startswith("$"))):
                key = self.next().text
                self.next()
                t = self.next()
                if key in f.kwargs:
                    raise SyntaxError(f"Duplicate option {key!r}")
                if t.text.startswith("$"):
                    bound = str(self._subst(t.text))
                    f.kwargs[key] = _num(bound) if _NUM_RE.match(bound) else bound
                else:
                    f.kwargs[key] = _num(t.text) if t.kind == "number" else _unquote(t.text)
                continue
            a = self.parse_arg(f, len(f.args))
            if isinstance(a, list):
                f.args.extend(a)
            else:
                f.args.append(a)
        lname = name.lower()
        if not f.args and not f.kwargs and lname not in ("uid",):
            raise SyntaxError(f"Got empty attr for function: [{name}]")
        if lname == "type" and len(f.args) != 1:
            raise SyntaxError("type function only supports one argument")
        self._check_func_arity(f, lname)
        return f

    def _check_func_arity(self, f: FuncCall, lname: str) -> None:
        """Per-function argument-count rules (worker/task.go
        ensureArgsCount; parseSrcFn case arms)."""

        def arity_err(expected: int) -> SyntaxError:
            got = [a.value for a in f.args[1:]]
            return SyntaxError(
                f"Function '{lname}' requires {expected} arguments, but "
                f"got {len(got)} ({got})")

        if lname in ("le", "lt", "ge", "gt"):
            # ineq takes exactly one comparison value; arrays belong to eq
            if len(f.args) != 2 or isinstance(f.args[1].value, list):
                raise arity_err(1)
        elif lname == "between" and len(f.args) != 3:
            raise arity_err(2)
        elif lname == "regexp":
            # the /re/mods literal contributes (pattern, modifiers) = 2
            # args; a plain string is only 1 (worker/task.go:2145)
            if len(f.args) != 2 or not (
                    isinstance(f.args[1].value, str)
                    and f.args[1].value.startswith("/")):
                raise SyntaxError(
                    f"Function 'regexp' requires 2 arguments, but got "
                    f"{len(f.args) - 1} ({[a.value for a in f.args[1:]]})")
        elif lname == "near" and len(f.args) != 3:
            raise arity_err(2)
        elif lname in ("within", "contains", "intersects") \
                and len(f.args) != 2:
            raise arity_err(1)
        elif lname == "similar_to":
            for k in f.kwargs:
                if k not in ("distance_threshold", "ef", "nprobe", "metric"):
                    raise SyntaxError(f"Unknown option {k!r} in similar_to")
            if len(f.args) > 3:
                # legacy "ef=12,..." string options were removed in v25
                raise SyntaxError("Expected named parameter in similar_to options")

    # first-arg-is-a-predicate functions where the attr must be bare;
    # dql/parser.go:2031 exempts uid and type (typFunc) from the rule
    _PRED_FIRST_FUNCS = {
        "eq", "le", "lt", "ge", "gt", "between", "has", "allofterms",
        "anyofterms", "alloftext", "anyoftext", "regexp", "match", "ngram",
        "anyof", "allof", "uid_in", "similar_to", "near", "within",
        "contains", "intersects", "checkpwd",
    }

    def parse_arg(self, f: FuncCall, argpos: int) -> Arg:
        t = self.peek()
        if t.kind == "iri":
            # IRI-quoted predicate argument (lex/iri.go)
            self.next()
            return Arg(value=t.text[1:-1],
                       is_pred=(argpos == 0 and f.name.lower() != "uid"))
        if t.kind == "string":
            if argpos == 0 and f.name.lower() in self._PRED_FIRST_FUNCS:
                raise SyntaxError("Attribute in function must not be quoted")
            self.next()
            return Arg(value=_unquote(t.text))
        if t.kind == "regex":
            # modifier legality (only `i`) is an execution-time check
            # (worker/task.go:2154) — the reference parser accepts any flags
            self.next()
            return Arg(value=t.text)
        if t.kind == "number":
            self.next()
            return Arg(value=_num(t.text))
        if t.text == "[":  # (nested) array literal: similar_to vectors, geo coords
            if f.name.lower() == "uid":
                raise SyntaxError("Unexpected character [ while parsing request.")
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
                bound = self._subst(name)
                if f.name.lower() == "uid" and isinstance(bound, str):
                    # GraphQL var in uid(): "1", "0x1", or a list string
                    # "[1, 31]" (dql/parser.go parseID) — expand to uid
                    # literal args
                    toks = [t.strip() for t in
                            bound.strip().lstrip("[").rstrip("]").split(",")
                            if t.strip()]
                    try:
                        return [Arg(value=int(t, 0)) for t in toks]
                    except ValueError:
                        pass
                if (isinstance(bound, str) and bound.strip().startswith("[")
                        and f.name.lower() != "uid"):
                    # vector-string binding: "[0.1,0.2]" (types.ParseVFloat)
                    try:
                        return Arg(value=[
                            float(t) for t in
                            bound.strip().strip("[]").split(",") if t.strip()])
                    except ValueError:
                        pass
                return Arg(value=bound)
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
            if name == "uid" and self.peek().text == "(" and f.name.lower() != "uid":
                # nested uid(...) argument — `uid_in(school, uid(v))`
                # (dql/parser.go parseFuncArgs uid nesting): splice the
                # inner uid list / var names into this call's args
                self.next()
                inner: list[Arg] = []
                while not self.accept(")"):
                    self.accept(",")
                    t2 = self.next()
                    if t2.kind == "number":
                        inner.append(Arg(value=_num(t2.text)))
                    else:
                        inner.append(Arg(value=t2.text))
                return inner
            if name == "len" and self.peek().text == "(":
                if f.name.lower() not in ("eq", "le", "lt", "ge", "gt", "between"):
                    raise SyntaxError(
                        "len function only allowed inside inequality")
                self.next()
                var = self.expect_kind("name").text
                self.expect(")")
                return Arg(value=var, is_len=True)
            lang = None
            if self.peek().text == "@":
                self.next()
                if self.peek().text == "*":
                    raise SyntaxError(
                        "The * symbol cannot be used as a valid language inside functions")
                if self.peek().text == ".":
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
            if t.kind == "string":
                out.append(_unquote(t.text))
            elif t.kind == "iri":
                # `<人物>` — IRI-quoted predicate/type name (lex/iri.go)
                out.append(t.text[1:-1])
            else:
                out.append(t.text)
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
            elif self.peek().text.startswith("$"):
                # mixed literal/variable arrays
                # (dql TestParseGraphQLMixedVarArray)
                bound = str(self._subst(self.next().text))
                out.append(_num(bound) if _NUM_RE.match(bound) else bound)
            else:
                out.append(_num(self.next().text))
        return out

    # ---- filter trees ----
    def parse_filter_tree(self) -> FilterTree | None:
        if self.peek().text == ")":
            return None  # `@filter()` — an empty filter is a no-op
        return self.parse_or()

    def parse_or(self) -> FilterTree:
        left = self.parse_and()
        while self.peek().text.lower() in ("or", "||", "|"):
            self.next()
            right = self.parse_and()
            if left.op == "or":
                left.children.append(right)
            else:
                left = FilterTree(op="or", children=[left, right])
        return left

    def parse_and(self) -> FilterTree:
        left = self.parse_not()
        while self.peek().text.lower() in ("and", "&&"):
            self.next()
            right = self.parse_not()
            if left.op == "and":
                left.children.append(right)
            else:
                left = FilterTree(op="and", children=[left, right])
        return left

    def parse_not(self) -> FilterTree:
        if self.peek().text.lower() in ("not", "!"):
            self.next()
            return FilterTree(op="not", children=[self.parse_not()])
        if self.accept("("):
            inner = self.parse_or()
            self.expect(")")
            return inner
        return FilterTree(op="func", func=self.parse_func())

    # ---- directives ----
    def parse_directives(self, b: Block, root: bool = False) -> None:
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
                        v = str(self._subst(self.next().text))
                        if k == "depth":
                            try:
                                b.recurse.depth = int(v)
                            except ValueError:
                                # query/recurse.go typed directive args
                                raise SyntaxError(
                                    "Value inside depth should be type of "
                                    "integer") from None
                        elif k == "loop":
                            if v not in ("true", "false"):
                                raise SyntaxError(
                                    "Value inside loop should be type of "
                                    "boolean")
                            b.recurse.loop = v == "true"
            elif name == "groupby":
                self.expect("(")
                gb = GroupBy()
                while not self.accept(")"):
                    self.accept(",")
                    gb.attrs.append(self.parse_groupby_attr())
                b.groupby = gb
            elif name == "facets":
                if root:
                    # root blocks take no @facets (dql/parser.go
                    # validateDirectives root path)
                    raise SyntaxError("Unknown directive [facets]")
                spec = self.parse_facets_spec()
                if b.facets is not None:
                    # one output spec + one filter spec may coexist, but
                    # not two of either kind (dql/parser.go)
                    if (b.facets.all or b.facets.keys) and (spec.all or spec.keys):
                        raise SyntaxError("Only one facets allowed")
                    if b.facets.filter is not None and spec.filter is not None:
                        raise SyntaxError("Only one facets filter allowed")
                b.facets = _merge_facets(b.facets, spec)
            else:
                raise SyntaxError(f"Unknown directive [{name}]")

    def parse_groupby_attr(self) -> Attr:
        alias = None
        name = self.expect_kind("name").text
        if self.peek().text == ":":
            self.next()
            alias = name
            name = self.expect_kind("name").text
        return Attr(name=name, alias=alias, langs=self._parse_lang_chain())

    def _parse_lang_chain(self) -> list[str]:
        """Optional `@en` / `@en:ru:hu` / `@.` / `@*` after a predicate."""
        if self.peek().text != "@":
            return []
        self.next()
        langs = []
        if self.peek().text in (".", "*"):
            langs.append(self.next().text)
        else:
            langs.append(self.expect_kind("name").text)
            while self.peek().text == ":":
                self.next()
                langs.append(self.expect_kind("name").text)
        return langs

    def parse_facets_spec(self) -> FacetsSpec:
        spec = FacetsSpec()
        if not self.accept("("):
            spec.all = True
            return spec
        first_item = True
        while not self.accept(")"):
            if not first_item and not self.accept(","):
                raise SyntaxError(
                    f"Expected comma or ) in facets but got: {self.peek().text}")
            if self.peek().text == ",":
                raise SyntaxError("Consecutive commas not allowed.")
            first_item = False
            t = self.peek()
            if t.text in ("orderasc", "orderdesc"):
                self.next()
                self.expect(":")
                key = self.expect_kind("name").text
                if self.peek().text.lower() == "as" and self.peek().kind == "name":
                    # `orderdesc: a as b` — bind var a to facet b AND sort
                    # by it (dql/parser.go TestParseFacetsOrderVar)
                    self.next()
                    facet = self.expect_kind("name").text
                    spec.vars[key] = facet
                    key = facet
                spec.order.append(Order(key=key, desc=(t.text == "orderdesc"), is_facet=True))
            elif t.kind == "name" and self.peek(1).text.lower() == "as" and self.peek(1).kind == "name":
                var = self.next().text
                self.next()  # as
                key = self.expect_kind("name").text
                if key in spec.vars.values():
                    raise SyntaxError(
                        f"Duplicate variable mappings for facet {key}")
                spec.vars[var] = key
            elif t.kind == "name" and self.peek(1).text == "(" :
                # facet filter function, e.g. eq(close, true)
                spec.filter = self.parse_filter_tree()
                _check_no_vars_in_facet_filter(spec.filter)
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
        self._parse_body_items(b)
        if b.groupby is not None:
            for c in b.children:
                ok = isinstance(c, Attr) and (
                    c.is_count or c.name in ("min", "max", "sum", "avg"))
                if not ok:
                    raise SyntaxError(
                        "Only aggregator/count functions allowed inside @groupby")

    def _parse_body_items(self, b: Block) -> None:
        self.expect("{")
        while not self.accept("}"):
            if self.accept(","):
                # commas are item separators (lex/state itemComma):
                # `gender,age` parses as two attrs
                continue
            if self.peek().text == "." and self.peek(1).text == "." and self.peek(2).text == ".":
                pos = self.next().pos
                self.next()
                self.next()
                b.children.append(_FragmentRef(self.expect_kind("name").text, pos))
                continue
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

        name_tok = self.expect_kind("name")
        name = name_tok.text
        name_end = name_tok.end

        # count(pred) / val(v) / math(...) / min|max|sum|avg(val(v)) / expand(...)
        if name == "checkpwd" and self.peek().text == "(":
            # checkpwd(pred, "secret") as an output attribute
            # (query/query.go isCheckPwd; renders `checkpwd(pred): bool`)
            self.next()
            pred = self.expect_kind("name").text
            self.accept(",")
            t = self.next()
            if t.kind == "string":
                pw = _unquote(t.text)
            elif t.text.startswith("$"):
                pw = str(self._subst(t.text))  # GraphQL var binding
            else:
                raise SyntaxError(
                    f"DQL parse error at {t.pos}: expected string, "
                    f"got {t.text!r}")
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
            if alias is None and var is None:
                # dql/parser.go: a bare math() result has no output name
                raise SyntaxError(
                    "Function math should be used with a variable or have an alias")
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
            langs = self._parse_lang_chain()
            self.expect(")")
            return Attr(name=name, alias=alias, agg_pred=p, var=var, langs=langs)
        if name == "expand" and self.peek().text == "(":
            self.next()
            arg_t = self.next()
            arg = arg_t.text
            if arg in ("_forward_", "_reverse_"):
                raise SyntaxError(f"Argument {arg} has been deprecated")
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
                    _check_type_only(attr.filter)
                else:
                    self.i = save
            if self.peek().text == "{":
                # expand(...) { ... } nested body applies to each expanded
                # uid predicate (query/query.go:2139-2143 recursiveCopy)
                self.parse_body(blk)
                attr.expand_body = blk
            return attr

        # lang tags: name@en:ru:. — the '@' must be ADJACENT to the name
        # (lex: `name@en` is one item; `name @x` is a directive)
        langs: list[str] = []
        if self.peek().text == "@" and self.peek().pos == name_end and (
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
            if self.peek().text == "(" and self.peek(1).text == ")":
                # `sumvar()` — bare empty call in body position
                # (dql/parser.go "Expected argument but got ')'")
                raise SyntaxError("Expected argument but got ')'")
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
            self.next()
            dname = self.expect_kind("name").text
            if dname == "facets":
                attr.facets = _merge_facets(attr.facets, self.parse_facets_spec())
            elif dname == "filter":
                if attr.filter is not None:
                    raise SyntaxError(
                        f"Repeated filter at root of the attribute {name}")
                self.expect("(")
                attr.filter = self.parse_filter_tree()
                self.expect(")")
            else:
                raise SyntaxError(f"Unknown directive [{dname}]")
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
        # `a dot b` — infix vector dot product (dql/math.go treats dot as
        # a binary function in operator position)
        while self.peek().text in ("*", "/", "%") or self.peek().text == "dot":
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
            if name.startswith("$"):
                # GraphQL query variable inside math(): substitute the
                # binding as a constant (dql/math.go TestParseMathSubs)
                bound = self._subst(name)
                if isinstance(bound, str):
                    b = bound.strip()
                    if b.startswith("["):
                        # vector constant "[0.1,0.2]" (types.ParseVFloat)
                        bound = [float(x) for x in
                                 b.strip("[]").split(",") if x.strip()]
                    else:
                        bound = _num(bound)
                return MathNode(const=bound)
            if name in self._MATH_FUNCS and self.peek().text == "(":
                self.next()
                if self.peek().text == ")":
                    raise SyntaxError("Empty () not allowed in math block")
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


def _math_var_names(node) -> set[str]:
    out = set()
    if node is None:
        return out
    if node.var:
        out.add(node.var)
    for c in node.children:
        out |= _math_var_names(c)
    return out


def _validate_vars(q: ParsedQuery, allow_unused: bool = False) -> None:
    """dql/parser.go validate(): every used variable must be defined and
    every defined variable must be used (shortest-path block vars are
    implicitly consumed by the `_path_` output). ``allow_unused`` is the
    upsert path (dql ParseMutation): the mutation block consumes query
    vars, so only the used-but-undefined direction is enforced."""
    defined: set[str] = set()
    exempt: set[str] = set()
    used: set[str] = set()

    def walk_func(f: FuncCall) -> None:
        lname = f.name.lower()
        for a in f.args:
            if a.is_pred:
                continue
            if a.is_val_var or a.is_len:
                used.add(str(a.value))
            elif lname in ("uid", "uid_in") and isinstance(a.value, str) \
                    and not a.value.startswith("0x"):
                used.add(a.value)

    def walk_tree(t) -> None:
        if t is None:
            return
        if t.op == "func":
            walk_func(t.func)
            return
        for c in t.children:
            walk_tree(c)

    def walk_block(b: Block) -> None:
        if b.var:
            defined.add(b.var)
            if b.shortest is not None:
                exempt.add(b.var)
        if b.func is not None:
            walk_func(b.func)
        walk_tree(b.filter)
        for o in b.order:
            if o.is_var:
                used.add(o.key)
        if b.facets is not None:
            defined.update(b.facets.vars)
            walk_tree(b.facets.filter)
        if b.shortest is not None:
            for ep in (b.shortest.from_, b.shortest.to):
                if isinstance(ep, str):
                    used.add(ep)
        for c in b.children:
            if isinstance(c, Block):
                walk_block(c)
                continue
            if c.var:
                defined.add(c.var)
            if c.val_var:
                used.add(c.val_var)
            if c.math is not None:
                used.update(_math_var_names(c.math))
            if c.expand and c.expand.startswith("val:"):
                used.add(c.expand[4:])
            if c.facets is not None:
                defined.update(c.facets.vars)
                walk_tree(c.facets.filter)
            walk_tree(c.filter)

    for b in q.blocks:
        walk_block(b)
    if used - defined:
        raise SyntaxError(
            f"Some variables are used but not defined "
            f"Defined:{sorted(defined)} Used:{sorted(used)}")
    if not allow_unused and defined - used - exempt:
        raise SyntaxError(
            f"Some variables are defined but not used "
            f"Defined:{sorted(defined)} Used:{sorted(used)}")


def _check_no_vars_in_facet_filter(tree: "FilterTree | None") -> None:
    """dql/parser.go: 'variables are not allowed in facets filter.'"""
    if tree is None:
        return
    if tree.op == "func":
        if tree.func.name.lower() in ("uid", "val") or any(
                a.is_val_var for a in tree.func.args):
            raise SyntaxError("variables are not allowed in facets filter")
        return
    for c in tree.children:
        _check_no_vars_in_facet_filter(c)


def _check_type_only(tree: "FilterTree | None") -> None:
    """expand(...) @filter(...) may only test type() (query/query.go
    validateQuery: 'expand is only compatible with type filters')."""
    if tree is None:
        return
    if tree.op == "func":
        if tree.func.name.lower() != "type":
            raise SyntaxError("expand is only compatible with type filters")
        return
    for c in tree.children:
        _check_type_only(c)


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


_NUM_RE = re.compile(r"^-?(0[xX][0-9a-fA-F]+|\d+(\.\d+)?([eE][+-]?\d+)?)$")


def _num(s: str):
    if s.lower().startswith("0x"):
        return int(s, 16)
    return float(s) if ("." in s or "e" in s or "E" in s) else int(s)


def parse_dql(src: str, vars: dict | None = None,
              allow_unused: bool = False) -> ParsedQuery:
    """Parse a DQL read query into the AST (reference: dql.Parse,
    dql/parser.go:615). ``vars`` binds `$name` query variables;
    header-declared defaults apply when a binding is missing.
    ``allow_unused`` is for upsert query blocks whose vars are consumed
    by the mutation section."""
    return Parser(src, vars, allow_unused=allow_unused).parse()
