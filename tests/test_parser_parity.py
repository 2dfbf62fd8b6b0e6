"""Parser-parity suite extracted from the reference's own parser tests.

``parser_parity_cases.json`` holds 240 (query, must-parse | must-error)
cases machine-extracted from dql/parser_test.go (single-literal,
single-Parse tests; multi-step tests are covered by tests/test_parser.py
hand ports).  Each case asserts our parser accepts exactly what the
reference accepts and rejects what it rejects — no query execution.
"""
import json
import os

import pytest

from dgraph_spark.dql.parser import parse_dql

_CASES = json.load(
    open(os.path.join(os.path.dirname(__file__), "parser_parity_cases.json")))


@pytest.mark.parametrize(
    "case", _CASES, ids=[c["name"] for c in _CASES])
def test_parser_parity(case):
    vars_ = case.get("vars")
    if case["ok"]:
        parse_dql(case["query"], vars_)  # must not raise
    else:
        with pytest.raises(Exception) as ei:
            parse_dql(case["query"], vars_)
        want = case.get("error_contains")
        if want and vars_ is not None:
            assert want in str(ei.value)
