"""Dataset-scale value parity, part 2: EVERY query in the reference's
21million corpus (systest/21million/queries/query-0NN, all 69) checked
value-for-value against tools/pyeval — a naive single-threaded dict-walk
DQL interpreter that shares only the parser with the engine.

Complements tests/test_goldendata.py (DuckDB SQL oracles + pinned-JSON
subset checks for 36 of the 69): together every corpus query has at
least one independent full-answer oracle on the vendored 200k subset.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.goldendata import GOLDEN_RDF, QUERY_DIR, SCHEMA, load_cases, load_graph

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN_RDF) and os.path.isdir(QUERY_DIR)),
    reason="reference goldendata/21million corpus not available")


@pytest.fixture(scope="module")
def golden(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("goldendata_pe") / "parquet")
    return load_graph(spark, wh), wh


@pytest.fixture(scope="module")
def naive(golden):
    from dgraph_spark.schema import SchemaRegistry
    from tools.pyeval import NaiveGraph

    _g, wh = golden
    return NaiveGraph.load_warehouse(wh, SchemaRegistry.parse(SCHEMA))


def _close(a, b) -> bool:
    """Structural equality with float tolerance (math() results may sum
    in different orders across the two evaluators)."""
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
        except (TypeError, ValueError):
            return False
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_close(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    return a == b


_CASES = {name: dql for name, dql, _pinned in load_cases()} if (
    os.path.exists(GOLDEN_RDF) and os.path.isdir(QUERY_DIR)) else {}


@pytest.mark.parametrize("qname", sorted(_CASES))
def test_21million_pyeval_parity(golden, naive, qname):
    from dgraph_spark.plans import Executor
    from tools.pyeval import PyEval

    g, _wh = golden
    got = Executor(g).execute(_CASES[qname])
    want = PyEval(naive).execute(_CASES[qname])
    assert _close(got, want), f"{qname}: engine != naive oracle\n" \
        f"engine: {str(got)[:600]}\nnaive : {str(want)[:600]}"
