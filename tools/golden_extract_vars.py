"""Extract golden cases that bind GraphQL-style query variables
(processQueryWithVars) from the reference's query/query*_test.go.

Pattern:

    q := `query test ($a: int = 1) { ... }`
    js, err := processQueryWithVars(t, q, map[string]string{"$a": "2"})
    require.NoError(t, err)
    require.JSONEq(t, `{"data": {...}}`, js)

Table-driven (tc.*) and error variants are skipped.  Usage:

    python tools/golden_extract_vars.py > tests/golden/cases_vars.json
"""
from __future__ import annotations

import glob
import json
import re
import sys

FUNC_RE = re.compile(r"^func (Test\w+)\(t \*testing\.T\) \{", re.M)
PAIR_RE = re.compile(
    r"(?:query|q)\s*:?=\s*`([^`]*)`"
    r"(?:(?!(?:query|q)\s*:?=).)*?"
    r"processQueryWithVars\(t,\s*(?:query|q),\s*"
    r"map\[string\]string\{([^}]*)\}\)"
    r"\s*\n\s*require\.NoError\(t,\s*err\)"
    r"\s*\n\s*require\.JSONEq\(t,\s*`([^`]*)`",
    re.S,
)
KV_RE = re.compile(r'"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"')


def extract(path: str) -> list[dict]:
    src = open(path).read()
    out = []
    funcs = list(FUNC_RE.finditer(src))
    for i, m in enumerate(funcs):
        body = src[m.end(): funcs[i + 1].start() if i + 1 < len(funcs) else len(src)]
        if "t.Skip(" in body:
            continue
        name = m.group(1)
        for j, pm in enumerate(PAIR_RE.finditer(body)):
            query, kvs, expected = pm.group(1), pm.group(2), pm.group(3)
            if "tc." in query or "%s" in query or "%v" in query or "tc." in kvs:
                continue
            try:
                exp = json.loads(expected)
            except json.JSONDecodeError:
                continue
            if not isinstance(exp, dict) or set(exp) != {"data"}:
                continue
            vars_ = {k.encode().decode("unicode_escape"):
                     v.encode().decode("unicode_escape")
                     for k, v in KV_RE.findall(kvs)}
            out.append({
                "name": name if j == 0 else f"{name}#{j}",
                "query": query,
                "vars": vars_,
                "expected": exp["data"],
            })
    return out


def main() -> None:
    cases = []
    for path in sorted(glob.glob("/root/reference/query/query[0-4]_test.go")):
        cases.extend(extract(path))
    json.dump(cases, sys.stdout, indent=1)
    print(f"\n{len(cases)} cases", file=sys.stderr)


if __name__ == "__main__":
    main()
