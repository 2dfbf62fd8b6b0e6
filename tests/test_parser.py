"""DQL parser unit tests (model: dql/parser_test.go round-trips)."""

from dgraph_spark.dql import parse_dql
from dgraph_spark.dql.ast import Attr, Block


def test_basic_block():
    q = parse_dql('{ q(func: eq(name, "Alice")) { name age } }')
    assert len(q.blocks) == 1
    b = q.blocks[0]
    assert b.alias == "q"
    assert b.func.name == "eq"
    assert b.func.pred == "name"
    assert b.func.literals() == ["Alice"]
    assert [a.name for a in b.children] == ["name", "age"]


def test_filter_tree_precedence():
    q = parse_dql('{ q(func: has(p)) @filter(eq(a,1) OR eq(b,2) AND NOT eq(c,3)) { x } }')
    t = q.blocks[0].filter
    assert t.op == "or"
    assert t.children[0].func.name == "eq"
    assert t.children[1].op == "and"
    assert t.children[1].children[1].op == "not"


def test_pagination_and_order():
    q = parse_dql("{ q(func: type(T), first: 5, offset: 2, orderdesc: age, after: 0x10) { a } }")
    b = q.blocks[0]
    assert (b.first, b.offset, b.after) == (5, 2, 16)
    assert b.order[0].key == "age" and b.order[0].desc


def test_child_block_params_any_order():
    q = parse_dql("{ q(func: has(p)) { friend @filter(gt(age, 3)) (first: 2) { name } } }")
    blk = q.blocks[0].children[0]
    assert isinstance(blk, Block)
    assert blk.first == 2
    assert blk.filter.func.name == "gt"


def test_reverse_and_alias():
    q = parse_dql("{ q(func: has(p)) { f: ~friend { name } cnt: count(~friend) } }")
    blk, cnt = q.blocks[0].children
    assert blk.reverse and blk.alias == "f" and blk.attr == "friend"
    assert cnt.is_count and cnt.name == "~friend"


def test_vars_and_math():
    q = parse_dql("""{
      var(func: type(T)) { x as age n as name }
      me(func: uid(x)) { total: math(x * 2 + 1) s: sum(val(x)) v: val(n) }
    }""")
    vb, me = q.blocks
    assert vb.is_var_block
    assert vb.children[0].var == "x"
    m = me.children[0]
    assert m.math.op == "+"
    assert me.children[1].name == "sum" and me.children[1].val_var == "x"
    assert me.children[2].val_var == "n"


def test_directives():
    q = parse_dql("""{
      q(func: type(T)) @cascade @normalize @ignorereflex { a }
      r(func: uid(1)) @recurse(depth: 4, loop: true) { b }
      g(func: type(T)) @groupby(age) { count(uid) }
    }""")
    b, r, g = q.blocks
    assert b.cascade == [] and b.normalize and b.ignorereflex
    assert r.recurse.depth == 4 and r.recurse.loop
    assert g.groupby.attrs[0].name == "age"
    assert g.children[0].is_count and g.children[0].name == "uid"


def test_facets():
    q = parse_dql("""{
      q(func: type(T)) { friend @facets(weight) @facets(eq(close, true)) @facets(w as weight) { s: sum(val(w)) name } }
    }""")
    blk = q.blocks[0].children[0]
    assert ("weight", None) in blk.facets.keys
    assert blk.facets.filter.func.name == "eq"
    assert blk.facets.vars == {"w": "weight"}


def test_shortest():
    q = parse_dql("{ path as shortest(from: 1, to: 2, numpaths: 3) { friend } }")
    b = q.blocks[0]
    assert b.var == "path"
    assert b.shortest.from_ == 1 and b.shortest.to == 2 and b.shortest.numpaths == 3


def test_lang_tags():
    q = parse_dql("{ q(func: type(T)) { name@en:ru:. } }")
    a = q.blocks[0].children[0]
    assert isinstance(a, Attr)
    assert a.langs == ["en", "ru", "."]


def test_string_funcs():
    q = parse_dql('''{ q(func: anyofterms(name, "a b")) @filter(regexp(t, /^x.*y$/i) AND match(n, "foo", 2)) { uid } }''')
    assert q.blocks[0].func.name == "anyofterms"
    f = q.blocks[0].filter
    assert f.children[0].func.literals() == ["/^x.*y$/i"]
    assert f.children[1].func.literals() == ["foo", 2]


def test_count_root():
    q = parse_dql("{ q(func: gt(count(friend), 3)) { count(uid) } }")
    f = q.blocks[0].func
    assert f.args[0].is_count and f.args[0].value == "friend"
