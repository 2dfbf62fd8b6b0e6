"""Dataset-scale tier: the reference's own 21million query corpus over
its goldendata film graph (systest/21million/queries/query-0NN, data
systest/data/goldendata_first_200k.rdf.gz — 200k triples of the same
Freebase film dataset, the largest real graph vendored in the repo).

Three gates:
- every corpus query parses, plans and executes through the bulk-load
  (predicate-partitioned parquet) path without error;
- the queries whose full answer lies inside the subset still match the
  reference's pinned JSON byte-for-byte;
- an independent DuckDB oracle over the SAME parquet triples checks
  values for a core set (term search, count index, value variables,
  min-aggregation, ordered pagination).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.goldendata import GOLDEN_RDF, QUERY_DIR, load_cases, load_graph

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN_RDF) and os.path.isdir(QUERY_DIR)),
    reason="reference goldendata/21million corpus not available")

# full-dataset pinned answers that remain complete on the 200k subset
_EXACT_ON_SUBSET = {"query-020", "query-021", "query-067", "query-072"}


@pytest.fixture(scope="module")
def golden(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("goldendata") / "parquet")
    return load_graph(spark, wh), wh


@pytest.mark.slow
def test_21million_corpus_executes(golden):
    from dgraph_spark.plans import Executor

    g, _wh = golden
    errors, exact = [], []
    for qname, dql, pinned in load_cases():
        try:
            got = Executor(g).execute(dql)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{qname}: {type(e).__name__}: {e}")
            continue
        if got == pinned:
            exact.append(qname)
    assert errors == []
    assert _EXACT_ON_SUBSET <= set(exact)


def _duck(wh: str):
    import duckdb

    con = duckdb.connect()
    con.execute(f"""
        CREATE VIEW t AS SELECT * FROM read_parquet(
            '{wh}/*/*.parquet', hive_partitioning=1);
        CREATE VIEW name_en AS SELECT subject, value_str AS name
            FROM t WHERE predicate='name' AND lang='en';
        CREATE VIEW df AS SELECT subject, object_uid AS film
            FROM t WHERE predicate='director.film';
        CREATE VIEW ird AS SELECT subject, value_str AS ird
            FROM t WHERE predicate='initial_release_date';
    """)
    return con


def _exec(golden, dql: str) -> dict:
    from dgraph_spark.plans import Executor

    g, _wh = golden
    return Executor(g).execute(dql)


_TERMS = "list_transform(string_split_regex(lower(name), '[^a-z0-9]+'), x -> x)"


def test_goldendata_eq_lang(golden):
    """query-001 shape: eq on a lang-tagged predicate."""
    got = _exec(golden, '''
    { q(func: eq(name@en, "The Doors: Live in Europe (1968)")) {
        name@en initial_release_date } }''')
    con = _duck(golden[1])
    rows = con.execute("""
        SELECT n.name, i.ird FROM name_en n LEFT JOIN ird i USING (subject)
        WHERE n.name = 'The Doors: Live in Europe (1968)'
    """).fetchall()
    assert len(got["q"]) == len(rows) == 1
    assert got["q"][0]["name@en"] == rows[0][0]
    assert got["q"][0]["initial_release_date"][:4] == rows[0][1][:4]


def test_goldendata_anyofterms(golden):
    """query-002 shape: term search on name@en."""
    got = _exec(golden, '''
    { q(func: anyofterms(name@en, "Blade Runner")) { name@en } }''')
    con = _duck(golden[1])
    (n,) = con.execute(f"""
        SELECT count(*) FROM name_en
        WHERE list_has_any({_TERMS}, ['blade', 'runner'])
    """).fetchone()
    names = {r["name@en"] for r in got["q"]}
    oracle = {r[0] for r in con.execute(f"""
        SELECT name FROM name_en
        WHERE list_has_any({_TERMS}, ['blade', 'runner'])
    """).fetchall()}
    assert len(got["q"]) == n and names == oracle


def test_goldendata_ordered_pagination(golden):
    """query-019 shape: has() root, orderasc on lang value, first: 5."""
    got = _exec(golden, '''
    { me(func: has(director.film), first: 5, orderasc: name@en) {
        name@en } }''')
    con = _duck(golden[1])
    oracle = [r[0] for r in con.execute("""
        SELECT n.name FROM (SELECT DISTINCT subject FROM df) d
        JOIN name_en n USING (subject)
        ORDER BY n.name COLLATE C, d.subject LIMIT 5
    """).fetchall()]
    assert [r.get("name@en") for r in got["me"]] == oracle


def test_goldendata_count_index(golden):
    """query-067 shape: eq(count(pred), k) root — count-index scan."""
    got = _exec(golden, '''
    { q(func: eq(count(director.film), 3)) { count: count(uid) } }''')
    con = _duck(golden[1])
    (n,) = con.execute("""
        SELECT count(*) FROM (
          SELECT subject FROM df GROUP BY subject HAVING count(*) = 3)
    """).fetchone()
    assert got["q"][0]["count"] == n


def test_goldendata_value_var_bucket_filter(golden):
    """query-013 shape: count into a value var, eq(val(v), [1,2,3])."""
    got = _exec(golden, '''
    { steve as var(func: allofterms(name@en, "Steven")) {
        films as count(director.film) }
      stevens(func: uid(steve)) @filter(eq(val(films), [1,2,3])) {
        name@en numFilms : val(films) } }''')
    con = _duck(golden[1])
    oracle = {(r[0], r[1]) for r in con.execute(f"""
        SELECT n.name, count(d.film) AS films
        FROM name_en n JOIN df d USING (subject)
        WHERE list_has_all({_TERMS}, ['steven'])
        GROUP BY n.subject, n.name HAVING count(d.film) IN (1, 2, 3)
    """).fetchall()}
    assert {(r["name@en"], r["numFilms"]) for r in got["stevens"]} == oracle
    assert len(got["stevens"]) > 0  # the subset genuinely exercises this


def test_goldendata_min_value_var_order(golden):
    """query-041 shape: min(val(ird)) per director, orderasc val(minIRD)."""
    got = _exec(golden, '''
    { stevens as var(func: allofterms(name@en, "steven")) {
        director.film { ird as initial_release_date }
        minIRD as min(val(ird)) }
      byIRD(func: uid(stevens), orderasc: val(minIRD)) {
        name@en firstRelease: val(minIRD) } }''')
    con = _duck(golden[1])
    oracle = [(r[0], r[1][:4]) for r in con.execute(f"""
        SELECT n.name, min(i.ird) AS m
        FROM name_en n JOIN df d USING (subject)
        JOIN ird i ON i.subject = d.film
        WHERE list_has_all({_TERMS}, ['steven'])
        GROUP BY n.subject, n.name ORDER BY m, n.subject
    """).fetchall()]
    rows = [(r["name@en"], r["firstRelease"][:4]) for r in got["byIRD"]]
    assert len(rows) == len(oracle) and len(rows) > 0
    # order-aware on the sort key; name ties may legitimately reorder
    assert [y for _x, y in rows] == [y for _x, y in oracle]
    assert {x for x, _y in rows} == {x for x, _y in oracle}


def test_goldendata_count_index_family(golden):
    """query-063..067 shape: the count-index scan family at several k
    over director.film, against the DuckDB group-count oracle."""
    from dgraph_spark.plans import Executor

    g, wh = golden
    con = _duck(wh)
    for k in (1, 2, 3, 30, 100):
        got = Executor(g).execute(
            '{ q(func: eq(count(director.film), %d)) { count: count(uid) } }'
            % k)
        (n,) = con.execute(f"""
            SELECT count(*) FROM (
              SELECT subject FROM df GROUP BY subject HAVING count(*) = {k})
        """).fetchone()
        got_n = got["q"][0]["count"] if got["q"] else 0
        assert got_n == n, f"count(director.film)={k}"


def test_goldendata_directed_by_traversal(golden):
    """query-010 shape: forward traversal film -> directed_by with the
    director's name, checked as (film, director) pair sets."""
    got = _exec(golden, '''
    { q(func: anyofterms(name@en, "Spielberg")) {
        name@en directed_by { name@en } } }''')
    con = _duck(golden[1])
    pairs = set()
    for r in got["q"]:
        for d in r.get("directed_by", []):
            pairs.add((r.get("name@en"), d.get("name@en")))
    dbv = con.execute(f"""
        CREATE VIEW dbe AS SELECT subject, object_uid AS director
        FROM t WHERE predicate='directed_by';
        SELECT fn.name, dn.name FROM name_en fn
        JOIN dbe e USING (subject) JOIN name_en dn ON dn.subject = e.director
        WHERE list_has_any({_TERMS.replace('name', 'fn.name')}, ['spielberg'])
    """).fetchall()
    assert pairs == set(dbv) and len(pairs) > 0


def test_goldendata_year_filter_traversal(golden):
    """query-004 shape: child @filter(le(initial_release_date, ...)) —
    year-granularity datetime comparison inside a traversal."""
    got = _exec(golden, '''
    { q(func: eq(name@en, "Steven Spielberg")) {
        director.film @filter(le(initial_release_date, "2000")) {
          name@en } } }''')
    con = _duck(golden[1])
    oracle = {r[0] for r in con.execute("""
        SELECT fn.name FROM name_en n
        JOIN df d USING (subject) JOIN name_en fn ON fn.subject = d.film
        JOIN ird i ON i.subject = d.film
        WHERE n.name = 'Steven Spielberg'
          AND try_cast(substr(i.ird, 1, 4) AS INT) <= 2000
    """).fetchall()}
    films = {f.get("name@en") for r in got["q"]
             for f in r.get("director.film", [])}
    assert films == oracle


# ===================================================================
# Corpus value-verification battery: run the REFERENCE'S OWN query
# files (systest/21million/queries/query-0NN) verbatim and check the
# answer restricted to the 200k-triple subset against an independent
# DuckDB oracle over the same parquet triples. Queries whose roots or
# predicates lie outside the subset are verified to return exactly the
# oracle's (empty) answer — a genuine subset-closed check of the scan/
# filter path, listed separately from the substantive ones below.
# ===================================================================

import re as _re

from tools.goldendata import load_cases as _load_cases


@pytest.fixture(scope="module")
def corpus():
    return {name: (dql, pinned) for name, dql, pinned in _load_cases()}


def _exec_corpus(golden, corpus, qname):
    from dgraph_spark.plans import Executor

    g, _wh = golden
    return Executor(g).execute(corpus[qname][0])


_COUNT_FAMILY = [f"query-{i:03d}" for i in range(53, 73)]


@pytest.mark.parametrize("qname", _COUNT_FAMILY)
def test_21million_count_index_corpus(golden, corpus, qname):
    """queries 053-072 — the reference's complete eq(count(pred), k)
    count-index family (starring / actor.film / director.film /
    ~director.film at k in {1,2,3,30,100}), each value-checked against
    a DuckDB group-count oracle on the same triples."""
    dql = corpus[qname][0]
    m = _re.search(r"eq\(count\((~?)([\w.]+)\),\s*(\d+)\)", dql)
    assert m, dql
    rev, pred, k = m.group(1) == "~", m.group(2), int(m.group(3))
    got = _exec_corpus(golden, corpus, qname)
    got_n = got["q"][0]["count"] if got["q"] else 0
    con = _duck(golden[1])
    key = "object_uid" if rev else "subject"
    (n,) = con.execute(f"""
        SELECT count(*) FROM (
          SELECT {key} FROM t WHERE predicate = '{pred}'
          GROUP BY {key} HAVING count(*) = {k})
    """).fetchone()
    assert got_n == n


def _name_date_rows(got, root):
    return {(r.get("name@en"), (r.get("initial_release_date") or "")[:10] or None)
            for r in got[root]}


def test_21million_q001_eq_root(golden, corpus):
    """query-001 verbatim: eq(name@en) exact-match root (the exact title
    is outside the subset — oracle proves the correct empty answer)."""
    got = _exec_corpus(golden, corpus, "query-001")
    con = _duck(golden[1])
    oracle = con.execute(
        "SELECT name FROM name_en WHERE name = 'Blade Runner'").fetchall()
    assert [r for r in got["bladerunner"]] == [] and oracle == []


@pytest.mark.parametrize("qname,extra", [
    ("query-002", ""),
    ("query-005", "AND i.ird <= '2000-01-01 00:00:00'"),
])
def test_21million_term_root_corpus(golden, corpus, qname, extra):
    """query-002/005 verbatim: anyofterms root (+ root le() date filter
    in 005), checked as (name, date) row sets vs the term-match oracle."""
    got = _exec_corpus(golden, corpus, qname)
    con = _duck(golden[1])
    join = "LEFT JOIN" if not extra else "JOIN"
    oracle = {(r[0], r[1][:10] if r[1] else None) for r in con.execute(f"""
        SELECT n.name, i.ird FROM name_en n
        {join} ird i USING (subject)
        WHERE list_has_any({_TERMS.replace('name', 'n.name')},
                           ['blade', 'runner']) {extra}
    """).fetchall()}
    assert _name_date_rows(got, "bladerunner") == oracle
    assert len(got["bladerunner"]) > 0


def test_21million_q011_regexp_corpus(golden, corpus):
    """query-011 verbatim: regexp root + child regexp filter, vs the
    DuckDB regexp oracle (empty-root proof on this subset)."""
    got = _exec_corpus(golden, corpus, "query-011")
    con = _duck(golden[1])
    oracle = con.execute("""
        SELECT name FROM name_en WHERE regexp_matches(name, '^Steven Sp.*$')
    """).fetchall()
    assert {r.get("name@en") for r in got["directors"]} == {r[0] for r in oracle}


def test_21million_q029_having_count(golden, corpus):
    """query-029 verbatim: gt(count(director.film), 5) root with a
    count(uid) aggregate — value-checked against the group-count oracle."""
    got = _exec_corpus(golden, corpus, "query-029")
    con = _duck(golden[1])
    (n,) = con.execute("""
        SELECT count(*) FROM (
          SELECT subject FROM df GROUP BY subject HAVING count(*) > 5)
    """).fetchone()
    assert got["directors"][0]["totalDirectors"] == n and n > 0


@pytest.mark.parametrize("qname,agg", [("query-040", "min"), ("query-042", "max")])
def test_21million_minmax_val_corpus(golden, corpus, qname, agg):
    """query-040/042 verbatim: min/max over a value variable whose roots
    fall outside the subset — the empty-aggregate answer must agree with
    SQL (NULL over zero rows)."""
    got = _exec_corpus(golden, corpus, qname)
    con = _duck(golden[1])
    (v,) = con.execute(f"""
        SELECT {agg}(i.ird) FROM name_en n JOIN ird i USING (subject)
        WHERE list_has_all({_TERMS.replace('name', 'n.name')},
                           ['harry', 'potter'])
    """).fetchone()
    got_v = got["me"][0][f"{agg}(val(d))"] if got["me"] else None
    assert (got_v is None) == (v is None)
    if v is not None:
        assert got_v[:10] == v[:10]


_EMPTY_ROOT_QUERIES = [
    # eq() roots / allofterms pairs whose exact titles are not in the
    # 200k subset: the oracle below proves the right answer IS empty,
    # so an empty executor result is a subset-closed value check (a
    # non-empty result, e.g. from a broken tokenizer or eq fusion,
    # fails loudly here).
    ("query-004", "scott", "eq", ["Ridley Scott"]),
    ("query-008", "me", "all", ["steven", "spielberg"]),
    ("query-010", "me", "eq", ["Steven Spielberg"]),
    ("query-014", "me", "eq", ["Ridley Scott"]),
    ("query-022", "me", "eq", ["Steven Spielberg"]),
    ("query-024", "me", "all", ["steven", "spielberg"]),
    ("query-027", "me", "all", ["baz", "luhrmann"]),
    ("query-031", "me", "all", ["jean", "pierre", "jeunet"]),
    ("query-043", "director", "all", ["quentin", "tarantino"]),
    ("query-045", "director", "eq", ["Steven Spielberg"]),
]


@pytest.mark.parametrize(
    "qname,root,kind,args",
    _EMPTY_ROOT_QUERIES, ids=[q[0] for q in _EMPTY_ROOT_QUERIES])
def test_21million_empty_root_corpus(golden, corpus, qname, root, kind, args):
    got = _exec_corpus(golden, corpus, qname)
    con = _duck(golden[1])
    if kind == "eq":
        sql = f"SELECT count(*) FROM name_en WHERE name = '{args[0]}'"
    else:
        lst = "[" + ", ".join(f"'{a}'" for a in args) + "]"
        sql = (f"SELECT count(*) FROM name_en WHERE list_has_all("
               f"{_TERMS}, {lst})")
    (n,) = con.execute(sql).fetchone()
    assert n == 0  # oracle: the root really is empty on this subset
    assert got[root] == []
