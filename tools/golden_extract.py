"""Extract (name, query, expected-json) golden cases from the reference's
query/query*_test.go files (query/query0_test.go:1 ff.).

The reference's dominant test pattern is:

    func TestX(t *testing.T) {
        query := ` {...} `
        js := processQueryNoErr(t, query)
        require.JSONEq(t, `{"data": {...}}`, js)
    }

Go raw strings cannot contain backticks, so a simple regex scan is exact.
Only the (query, expected) TEXT is extracted — the assertions are re-run
against this repo's own executor; no reference code is copied.
"""
from __future__ import annotations

import json
import re
import sys

FUNC_RE = re.compile(r"^func (Test\w+)\(t \*testing\.T\) \{", re.M)
# query assignment (either := or =) followed by the nearest JSONEq
PAIR_RE = re.compile(
    r"query\s*:?=\s*`([^`]*)`"  # the DQL text
    r"(?:(?!query\s*:?=).)*?"  # no intervening re-assignment
    r"require\.JSONEq\(t,\s*`([^`]*)`",
    re.S,
)


def extract(path: str) -> list[dict]:
    src = open(path).read()
    cases = []
    funcs = list(FUNC_RE.finditer(src))
    for i, m in enumerate(funcs):
        body = src[m.end(): funcs[i + 1].start() if i + 1 < len(funcs) else len(src)]
        name = m.group(1)
        for j, pm in enumerate(PAIR_RE.finditer(body)):
            query, expected = pm.group(1), pm.group(2)
            try:
                exp = json.loads(expected)
            except json.JSONDecodeError:
                continue  # templated/printf-style expected string
            if not isinstance(exp, dict) or set(exp) != {"data"}:
                continue
            # drop truncated/templated queries (Go string concatenation or
            # Sprintf bodies the raw-string regex can't reconstruct)
            unescaped_quotes = len(re.findall(r'(?<!\\)"', query))
            if (query.count("{") != query.count("}")
                    or unescaped_quotes % 2 == 1 or "%v" in query
                    or "%s" in query or "%d" in query):
                continue
            cases.append({
                "name": name if j == 0 else f"{name}#{j}",
                "query": query,
                "expected": exp["data"],
            })
    return cases


if __name__ == "__main__":
    out = []
    for p in sys.argv[1:]:
        out.extend(extract(p))
    json.dump(out, sys.stdout, indent=0)
    print(f"\n{len(out)} cases", file=sys.stderr)
