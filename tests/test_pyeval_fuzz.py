"""Differential fuzz gate: randomized parameterizations of core DQL
shapes over the goldendata film graph, engine vs tools/pyeval (the
naive dict-walk interpreter). Complements the fixed 69-query corpus
(tests/test_pyeval_oracle.py) with parameter diversity: random terms
drawn FROM THE DATA, random pagination windows, random count/date
thresholds, random order directions — deterministic seed, so failures
reproduce.
"""

from __future__ import annotations

import math
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.goldendata import GOLDEN_RDF, SCHEMA, load_graph

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN_RDF),
    reason="reference goldendata corpus not available")


@pytest.fixture(scope="module")
def golden(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("goldendata_fz") / "parquet")
    return load_graph(spark, wh), wh


@pytest.fixture(scope="module")
def naive(golden):
    from dgraph_spark.schema import SchemaRegistry
    from tools.pyeval import NaiveGraph

    _g, wh = golden
    return NaiveGraph.load_warehouse(wh, SchemaRegistry.parse(SCHEMA))


@pytest.fixture(scope="module")
def words(naive):
    """Deterministic pool of real tokens from name@en values."""
    import re

    freq: dict[str, int] = {}
    for posts in naive.scalars["name"].values():
        for lang, v in posts:
            if lang == "en" and isinstance(v, str):
                for t in re.split(r"[^\w]+", v.lower()):
                    if len(t) > 2:
                        freq[t] = freq.get(t, 0) + 1
    # mid-frequency words: selective enough to vary, common enough to hit
    mids = sorted(w for w, n in freq.items() if 3 <= n <= 300)
    return mids


def _close(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9)
        except (TypeError, ValueError):
            return False
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_close(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    return a == b


def _templates(rng: random.Random, words: list[str]):
    w = lambda: rng.choice(words)
    n = lambda hi: rng.randint(1, hi)
    yr = lambda: rng.randint(1940, 2010)
    desc = lambda: rng.choice(["orderasc", "orderdesc"])
    out = []
    for _ in range(8):
        out.append(f'''{{ q(func: anyofterms(name@en, "{w()} {w()}"),
            {desc()}: name@en, first: {n(12)}, offset: {rng.randint(0, 3)}) {{
            name@en initial_release_date director.film {{ name@en }} }} }}''')
    for _ in range(6):
        out.append(f'''{{ q(func: gt(count(director.film), {n(8)}),
            first: {n(15)}) {{ name@en count(director.film) }} }}''')
    for _ in range(6):
        out.append(f'''{{
            v as var(func: allofterms(name@en, "{w()}")) {{
                c as count(director.film) }}
            q(func: uid(v), orderdesc: val(c), first: {n(10)}) {{
                name@en total: val(c) }} }}''')
    for _ in range(6):
        a, b = sorted((yr(), yr()))
        out.append(f'''{{ q(func: anyofterms(name@en, "{w()}")) {{
            name@en
            director.film @filter(ge(initial_release_date, "{a}")
                                  AND lt(initial_release_date, "{b}"))
                ({desc()}: initial_release_date, first: {n(5)}) {{
                name@en initial_release_date }} }} }}''')
    for _ in range(5):
        out.append(f'''{{
            var(func: anyofterms(name@en, "{w()} {w()}")) {{
                d as initial_release_date }}
            q() {{ mn: min(val(d)) mx: max(val(d)) }} }}''')
    for _ in range(5):
        out.append(f'''{{ q(func: eq(count(director.film), {n(6)}),
            first: {n(10)}) @cascade {{
            name@en director.film (first: 2) {{ name@en }} }} }}''')
    for _ in range(4):
        out.append(f'''{{ q(func: anyofterms(name@en, "{w()}"),
            first: {n(8)}) {{
            name@en ~director.film {{ name@en }} }} }}''')
    for _ in range(4):
        out.append(f'''{{ q(func: regexp(name@en, /^The {w()[:2]}.*$/),
            orderasc: name@en, first: {n(10)}) {{ name@en }} }}''')
    for _ in range(4):
        out.append(f'''{{ q(func: has(initial_release_date),
            orderdesc: initial_release_date, first: {n(8)},
            offset: {rng.randint(0, 5)}) {{
            name@en initial_release_date }} }}''')
    for _ in range(4):
        out.append(f'''{{ q(func: anyofterms(name@en, "{w()}"),
            first: {n(6)}) @normalize {{
            who: name@en director.film {{ film: name@en }} }} }}''')
    for _ in range(4):
        out.append(f'''{{ q(func: anyofterms(name@en, "{w()} {w()}"),
            first: {n(8)}) {{
            name@en directed_by {{ name@en
                director.film (first: 2) {{ name@en }} }} }} }}''')
    for _ in range(4):
        out.append(f'''{{
            f as var(func: anyofterms(name@en, "{w()}")) {{
                director.film {{ d as initial_release_date }}
                m as min(val(d)) }}
            q(func: uid(f), orderasc: val(m), first: {n(8)}) {{
                name@en first_release: val(m) }} }}''')
    return out


@pytest.mark.parametrize("seed", [20260815, 7, 99])
def test_pyeval_differential_fuzz(golden, naive, words, seed):
    from dgraph_spark.plans import Executor
    from tools.pyeval import PyEval

    g, _wh = golden
    rng = random.Random(seed)
    bad = []
    for i, dql in enumerate(_templates(rng, words)):
        got = Executor(g).execute(dql)
        want = PyEval(naive).execute(dql)
        if not _close(got, want):
            bad.append((i, dql, str(got)[:300], str(want)[:300]))
    assert not bad, "\n\n".join(
        f"[{i}] {q}\nengine: {a}\nnaive : {b}" for i, q, a, b in bad)
