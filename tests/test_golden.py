"""Golden-corpus gate: the reference's OWN query tests, re-run against
this engine.

tests/golden/cases.json holds 480 (query, expected-JSON) pairs extracted
from the reference's query/query{0..4}_test.go + query_ngram_test.go by
tools/golden_extract.py (text only — assertions re-run here, no
reference code); cases_facets.json holds the 75-case facets suite
(query_facets_test.go), which runs over the base fixture + the
fixture_facets.nq overlay applied as a set-mutation. The full-corpus
sweep result (555/555 exact, 0 order-only, 0 diff, 0 errors) is
committed in tests/golden/status.json and triaged in
tests/golden/RESULTS.md.

This gate re-executes 130 of the passing cases live (the corpus minus
the slow iterative outliers, chosen by measured wall time so the suite
stays fast) and fails on ANY divergence; a second test pins the recorded
full-sweep tallies so a regressing re-sweep cannot be silently committed.
Re-sweep with: python tools/golden_run.py tests/golden/cases.json out.jsonl
"""

import json
import os

import pytest

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(name):
    with open(os.path.join(_DIR, name)) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def golden_ex(spark):
    from dgraph_spark.plans import Executor
    from dgraph_spark.sources.rdf import load_rdf_graph

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # the fixture is ~500 triples: 1-partition shuffles keep the per-query
    # job overhead flat (mirrors what AQE coalescing would pick)
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    g = load_rdf_graph(
        spark,
        os.path.join(_DIR, "fixture.nq"),
        open(os.path.join(_DIR, "schema.txt")).read(),
    )
    for name in list(g.preds):
        g.preds[name] = g.preds[name].coalesce(1).persist()
        g.preds[name].count()
    yield lambda: Executor(g)
    spark.conf.set("spark.sql.shuffle.partitions", old_parts)


@pytest.fixture(scope="module")
def golden_facets_ex(spark):
    """Executor over base fixture + the facets overlay, applied the way
    the reference does it: populateClusterWithFacets is a set-mutation on
    the running cluster (query_facets_test.go:18-85) — here set_nquads on
    the loaded Graph (which also exercises the mutation path's facet/lang
    preservation)."""
    from dgraph_spark.mutations import set_nquads
    from dgraph_spark.plans import Executor
    from dgraph_spark.sources.rdf import load_rdf_graph

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    g = load_rdf_graph(
        spark,
        os.path.join(_DIR, "fixture.nq"),
        open(os.path.join(_DIR, "schema.txt")).read(),
    )
    g = set_nquads(g, open(os.path.join(_DIR, "fixture_facets.nq")).read())
    for name in list(g.preds):
        g.preds[name] = g.preds[name].coalesce(1).persist()
        g.preds[name].count()
    yield lambda: Executor(g)
    spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _run_gate(make_ex, cases, gate):
    failures = []
    for name in gate:
        c = cases[name]
        try:
            got = make_ex().execute(c["query"])
        except Exception as e:  # noqa: BLE001 — collected into the report
            failures.append((name, f"{type(e).__name__}: {e}"))
            continue
        if got != c["expected"]:
            failures.append((name, "diff"))
    assert not failures, f"{len(failures)} golden regressions: {failures[:10]}"


def test_golden_gate_cases(golden_ex):
    cases = {c["name"]: c for c in _load("cases.json")}
    gate = _load("gate_cases.json")
    assert len(gate) >= 100
    _run_gate(golden_ex, cases, gate)


def test_golden_facets_cases(golden_facets_ex):
    """The reference's whole facets suite (query_facets_test.go), live."""
    cases = {c["name"]: c for c in _load("cases_facets.json")}
    assert len(cases) >= 75
    _run_gate(golden_facets_ex, cases, list(cases))


def test_golden_rdf_cases(golden_ex):
    """The reference's RDF-output suite (query/rdf_result_test.go), live:
    exact N-Quad text for result cases, exact error strings for the
    unsupported-directive cases (query/outputrdf.go)."""
    cases = _load("cases_rdf.json")
    assert len(cases) >= 11
    failures = []
    for c in cases:
        try:
            got = golden_ex().execute_rdf(c["query"])
            err = None
        except Exception as e:  # noqa: BLE001 — collected into the report
            got, err = None, str(e)
        if "expected_error" in c:
            if err is None or c["expected_error"] not in err:
                failures.append((c["name"], f"want error {c['expected_error']!r}, got {err!r}"))
        elif got != c["expected_rdf"]:
            failures.append((c["name"], err or "diff"))
    assert not failures, f"{len(failures)} rdf regressions: {failures}"


def test_golden_error_cases(golden_ex):
    """Negative golden suite (tools/golden_extract_errors.py): 52
    must-error queries from query/query[0-4]_test.go. Each must raise;
    when the reference test pins a message substring, ours must carry
    it too."""
    cases = _load("cases_errors.json")
    assert len(cases) >= 50
    failures = []
    for c in cases:
        try:
            golden_ex().execute(c["query"])
            failures.append((c["name"], "no error raised"))
        except Exception as e:  # noqa: BLE001 — collected into the report
            want = c.get("error_contains")
            if want and want.lower() not in str(e).lower():
                failures.append((c["name"], f"want {want!r} got {str(e)[:90]!r}"))
    assert not failures, f"{len(failures)} error-case regressions: {failures}"


def test_golden_vars_cases(golden_ex):
    """GraphQL-style query-variable cases (processQueryWithVars):
    header-declared defaults, int bindings, and uid-list string bindings
    ("[1, 31]" in uid($a), dql/parser.go parseID)."""
    cases = _load("cases_vars.json")
    assert len(cases) >= 2
    failures = []
    for c in cases:
        try:
            got = golden_ex().execute(c["query"], vars=c["vars"])
        except Exception as e:  # noqa: BLE001 — collected into the report
            failures.append((c["name"], f"{type(e).__name__}: {e}"))
            continue
        if got != c["expected"]:
            failures.append((c["name"], "diff"))
    assert not failures, f"vars-case regressions: {failures}"


def test_golden_sweep_tallies():
    """The committed full-sweep result may only improve."""
    status = _load("status.json")
    tally = {}
    for s in status.values():
        tally[s] = tally.get(s, 0) + 1
    assert len(status) >= 555
    assert tally.get("error", 0) == 0
    assert tally.get("pass", 0) >= 555
    assert tally.get("diff", 0) == 0
    assert tally.get("order", 0) == 0
