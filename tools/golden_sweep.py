"""Sweep the reference's golden query->JSON cases against our engine.

Reads /tmp/golden_cases.json (extracted from query/query*_test.go),
runs each DQL query through Executor on the golden fixture, and
compares with require.JSONEq semantics (objects unordered, arrays
ordered, numbers compared as floats).

Usage: python tools/golden_sweep.py [start [end]]
Writes /tmp/golden_results.json
"""
from __future__ import annotations

import json
import sys
import traceback


def jsoneq(a, b) -> bool:
    """Go require.JSONEq: unmarshal both, reflect.DeepEqual on the
    interface{} trees — numbers become float64, objects maps, arrays
    ordered slices."""
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(jsoneq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(jsoneq(x, y) for x, y in zip(a, b))
    return a == b


def main() -> None:
    from dgraph_spark import get_spark
    from dgraph_spark.plans import Executor
    from dgraph_spark.sources.rdf import load_rdf_graph

    cases = json.load(open("/tmp/golden_cases.json"))
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(cases)
    cases = cases[lo:hi]

    spark = get_spark("golden-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    g = load_rdf_graph(
        spark, "tests/golden/fixture.nq", open("tests/golden/schema.txt").read()
    )
    ex = Executor(g)

    results = []
    for i, c in enumerate(cases):
        tag = f"{c['file']}:{c['test']}"
        try:
            expected = json.loads(c["expected"])
            if not isinstance(expected, dict):
                raise ValueError("expected not an object")
        except Exception:
            results.append({**c, "status": "bad_expected"})
            continue
        exp_data = expected.get("data", expected)
        try:
            got = ex.execute(c["query"])
            ok = jsoneq(got, exp_data)
            results.append(
                {**c, "status": "pass" if ok else "mismatch",
                 "got": json.dumps(got, default=str)}
            )
        except Exception as e:
            results.append(
                {**c, "status": "error",
                 "got": f"{type(e).__name__}: {e}",
                 "trace": traceback.format_exc(limit=3)}
            )
        st = results[-1]["status"]
        print(f"[{lo + i}] {st:9s} {tag}", flush=True)

    out = f"/tmp/golden_results_{lo}_{hi}.json"
    json.dump(results, open(out, "w"), indent=1)
    from collections import Counter

    print(Counter(r["status"] for r in results))
    print("wrote", out)


if __name__ == "__main__":
    main()
