"""Extract negative golden cases (query -> must error) from the
reference's query/query*_test.go files.

Pattern (query/query1_test.go:80-88 and friends):

    query := ` {...} `
    _, err := processQuery(context.Background(), t, query)
    require.Error(t, err)
    [require.Contains(t, err.Error(), "...")]

Only the query TEXT and the optional expected-substring are extracted;
the assertion is re-run against this engine.  Usage:

    python tools/golden_extract_errors.py > tests/golden/cases_errors.json
"""
from __future__ import annotations

import glob
import json
import re
import sys

FUNC_RE = re.compile(r"^func (Test\w+)\(t \*testing\.T\) \{", re.M)
PAIR_RE = re.compile(
    r"(?:query|q)\s*:?=\s*`([^`]*)`"
    r"(?:(?!(?:query|q)\s*:?=)(?!require\.NoError).)*?"
    r"(?:processQuery(?:Err)?\((?:context\.Background\(\),\s*)?t,\s*(?:query|q)\)"
    r"|processQueryNoErr\(t,\s*(?:query|q)\))"
    r"\s*\n\s*require\.Error\(t,\s*err\)"
    r"(?:\s*\n\s*require\.Contains\(t,\s*err\.Error\(\),\s*\n?\s*\"((?:[^\"\\]|\\.)*)\")?",
    re.S,
)


def extract(path: str) -> list[dict]:
    src = open(path).read()
    out = []
    funcs = list(FUNC_RE.finditer(src))
    for i, m in enumerate(funcs):
        body = src[m.end(): funcs[i + 1].start() if i + 1 < len(funcs) else len(src)]
        name = m.group(1)
        if "t.Skip(" in body:
            continue  # reference skips it; not a behavioral contract
        for j, pm in enumerate(PAIR_RE.finditer(body)):
            query = pm.group(1)
            if (query.count("{") != query.count("}") or "%v" in query
                    or "%s" in query or "%d" in query):
                continue
            c = {"name": name if j == 0 else f"{name}#{j}", "query": query}
            if pm.group(2):
                c["error_contains"] = (
                    pm.group(2).encode().decode("unicode_escape"))
            out.append(c)
    return out


def main() -> None:
    cases = []
    for path in sorted(glob.glob("/root/reference/query/query[0-4]_test.go")):
        cases.extend(extract(path))
    json.dump(cases, sys.stdout, indent=1)
    print(f"\n{len(cases)} cases", file=sys.stderr)


if __name__ == "__main__":
    main()
