"""Sweep extracted golden cases (tools/golden_extract.py output) against
this repo's executor over tests/golden/fixture.nq and classify each:

  pass        — exact JSON equality (order-sensitive lists, like JSONEq)
  order       — equal up to list ordering (sort-stability divergence)
  diff        — runs but JSON differs
  error       — parse/execute raised

Usage: python tools/golden_run.py /tmp/golden_all.json [outfile]
"""
from __future__ import annotations

import json
import sys
import traceback


def canon(x):
    """Order-insensitive canonical form (sorts lists by serialized value)."""
    if isinstance(x, dict):
        return {k: canon(v) for k, v in sorted(x.items())}
    if isinstance(x, list):
        return sorted((canon(v) for v in x), key=lambda v: json.dumps(v, sort_keys=True))
    return x


def main():
    overlay = None
    argv = list(sys.argv)
    if "--overlay" in argv:
        i = argv.index("--overlay")
        overlay = argv[i + 1]
        del argv[i:i + 2]
    sys.argv = argv
    cases = json.load(open(sys.argv[1]))
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/golden_results.jsonl"
    if len(sys.argv) > 3 and sys.argv[3].startswith("@"):
        names = set(json.load(open(sys.argv[3][1:])))
        cases = [c for c in cases if c["name"] in names]
        start, end = 0, len(cases)
    else:
        start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        end = int(sys.argv[4]) if len(sys.argv) > 4 else len(cases)

    sys.path.insert(0, "/root/repo")
    import os
    # fixture is ~500 triples: single-partition shuffles kill per-query
    # overhead (this mirrors AQE coalescing; forced because even planning
    # 32 partitions costs ~0.5s/job at this size)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from dgraph_spark import get_spark
    from dgraph_spark.sources.rdf import load_rdf_graph
    from dgraph_spark.plans import Executor

    spark = get_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.default.parallelism", "1")
    spark.sparkContext.setLogLevel("ERROR")
    g = load_rdf_graph(
        spark, "/root/repo/tests/golden/fixture.nq",
        open("/root/repo/tests/golden/schema.txt").read())
    if overlay:
        # apply like the reference's per-test populateClusterWithFacets:
        # a set-mutation on top of the base cluster (addTriplesToCluster)
        from dgraph_spark.mutations import set_nquads
        g = set_nquads(g, open(overlay).read())
    for name in list(g.preds):
        g.preds[name] = g.preds[name].coalesce(1).persist()
        g.preds[name].count()
    ex = Executor(g)

    tally = {"pass": 0, "order": 0, "diff": 0, "error": 0}
    out = open(out_path, "a")
    for c in cases[start:end]:
        rec = {"name": c["name"]}
        try:
            got = ex.execute(c["query"])
            exp = c["expected"]
            if got == exp:
                rec["status"] = "pass"
            elif canon(got) == canon(exp):
                rec["status"] = "order"
            else:
                rec["status"] = "diff"
                rec["got"] = got
        except Exception as e:
            rec["status"] = "error"
            rec["err"] = f"{type(e).__name__}: {e}"
            rec["trace"] = traceback.format_exc(limit=3)
        tally[rec["status"]] += 1
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(f"{rec['status']:6} {c['name']}", flush=True)
    print(tally)


if __name__ == "__main__":
    main()
