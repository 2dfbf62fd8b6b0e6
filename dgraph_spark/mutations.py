"""Write surface: set / delete / upsert as batch DataFrame merges
(reference: edgraph/server.go:575 doMutate, dql/mutation.go;
SURVEY.md §2.10).

The Spark engine is append/batch-oriented: a mutation produces a NEW
Graph (immutable DataFrames ≈ snapshot isolation; persisted snapshots
via Graph.write_parquet give MVCC-like versioning for free —
SURVEY.md §1.5). Semantics preserved from the reference:

  - set on a single-valued scalar predicate OVERWRITES (posting Ovr,
    posting/list.go:56-58); on list predicates it unions.
  - delete of (s, p, o) removes one triple; (s, p, *) removes all
    values of p on s (ToDeletePredEdge, dql/mutation.go:146).
  - upsert block == query -> build mutation triples from result vars ->
    conditional apply (@if on var cardinality,
    dql/parser_mutation.go:105-119).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dgraph_spark.model import OBJECT, SUBJECT, VALUE, Graph
from dgraph_spark.schema import Predicate
from dgraph_spark.sources.rdf import parse_nquads


def _triples_from_nquads(graph: Graph, nquads: str) -> DataFrame:
    lines = graph.spark.createDataFrame([(l,) for l in nquads.splitlines() if l.strip()], "value string")
    return parse_nquads(lines)


def set_triples(graph: Graph, triples: DataFrame) -> Graph:
    """Apply set-mutations (long-format triples DF as from parse_nquads).
    Returns a new Graph."""
    g = graph
    pred_names = [r["predicate"] for r in triples.select("predicate").distinct().collect()]
    for name in pred_names:
        rows = triples.where(F.col("predicate") == name)
        meta = g.schema.get(name)
        if not g.has_pred(name):
            # new predicate: infer uid-ness from the rows (first write
            # fixes the type — worker/task.go:1104-1110 default typing)
            is_uid = rows.where(F.col("object_uid").isNotNull()).limit(1).count() > 0
            meta = Predicate(name=name, typ="uid" if is_uid else meta.typ)
        if meta.is_uid:
            new = rows.select(SUBJECT, F.col("object_uid").alias(OBJECT))
            old = g.preds.get(name)
            merged = new if old is None else old.select(SUBJECT, OBJECT).unionByName(new).distinct()
        else:
            new = rows.select(SUBJECT, F.col("value_str").cast(
                {"int": "long", "float": "double", "bool": "boolean",
                 "datetime": "timestamp"}.get(meta.typ, "string")).alias(VALUE))
            old = g.preds.get(name)
            if old is None:
                merged = new
            elif meta.list:
                merged = old.select(SUBJECT, VALUE).unionByName(new).distinct()
            else:
                # single-valued: new value overwrites (Ovr)
                merged = (
                    old.select(SUBJECT, VALUE)
                    .join(new.select(SUBJECT), SUBJECT, "left_anti")
                    .unionByName(new.dropDuplicates([SUBJECT]))
                )
        g = g.with_pred(name, merged, meta)
    return g


def set_nquads(graph: Graph, nquads: str) -> Graph:
    """`set { <nquads> }` convenience wrapper."""
    return set_triples(graph, _triples_from_nquads(graph, nquads))


def delete_triples(graph: Graph, triples: DataFrame) -> Graph:
    """Apply delete-mutations. A row with NULL object_uid AND NULL
    value_str (parsed from `* `) deletes every value of (subject, pred).
    """
    g = graph
    pred_names = [r["predicate"] for r in triples.select("predicate").distinct().collect()]
    for name in pred_names:
        if not g.has_pred(name):
            continue
        rows = triples.where(F.col("predicate") == name)
        meta = g.schema.get(name)
        old = g.pred(name)
        wipe = rows.where(F.col("object_uid").isNull() & (F.coalesce(F.col("value_str"), F.lit("*")) == "*"))
        old = old.join(wipe.select(SUBJECT), SUBJECT, "left_anti")
        if meta.is_uid:
            spec = rows.where(F.col("object_uid").isNotNull()).select(
                SUBJECT, F.col("object_uid").alias(OBJECT)
            )
            old = old.join(spec, [SUBJECT, OBJECT], "left_anti")
        else:
            spec = rows.where(F.col("value_str").isNotNull() & (F.col("value_str") != "*")).select(
                SUBJECT, F.col("value_str").alias("_dv")
            )
            old = old.join(
                spec, (old[SUBJECT] == spec[SUBJECT]) & (old[VALUE].cast("string") == spec["_dv"]), "left_anti"
            )
        g = g.with_pred(name, old, meta)
    return g


def delete_nquads(graph: Graph, nquads: str) -> Graph:
    nq = nquads.replace(" * .", ' "*" .')  # normalize wildcard object
    return delete_triples(graph, _triples_from_nquads(graph, nq))


def mutate(graph: Graph, mutation_text: str) -> Graph:
    """Apply a dgraph mutation document::

        { set { <nquads> } delete { <nquads> } }

    (dql/parser_mutation.go:15 ParseMutation surface; both sections
    optional, either order)."""
    set_nq, del_nq = _split_mutation_blocks(mutation_text)
    g = graph
    if set_nq.strip():
        g = set_nquads(g, set_nq)
    if del_nq.strip():
        g = delete_nquads(g, del_nq)
    return g


def _split_mutation_blocks(text: str) -> tuple[str, str]:
    import re

    def grab(kw: str) -> str:
        m = re.search(kw + r"\s*\{", text)
        if not m:
            return ""
        depth = 1
        i = m.end()
        start = i
        while i < len(text) and depth:
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
            i += 1
        return text[start : i - 1]

    return grab(r"\bset"), grab(r"\bdelete")


def upsert_text(graph: Graph, upsert_block: str) -> "UpsertResult":
    """dgraph upsert block text form::

        upsert {
          query { v as var(func: eq(email, "x")) }
          mutation @if(eq(len(v), 0)) { set { ... } }
        }

    Query vars feed the conditional; uid(v) placeholders in the mutation
    N-Quads substitute each matched uid (edgraph/server.go:874
    buildUpsertQuery + :999 var substitution)."""
    import re

    qm = re.search(r"query\s*(\{.*?\})\s*mutation", upsert_block, re.S)
    if not qm:
        raise ValueError("upsert block needs `query { ... } mutation ...`")
    query_text = qm.group(1)
    cond = None
    cond_var = None
    cm = re.search(r"@if\s*\(\s*(eq|gt|lt)\s*\(\s*len\s*\(\s*(\w+)\s*\)\s*,\s*(\d+)\s*\)\s*\)", upsert_block)
    if cm:
        op, cond_var, n = cm.group(1), cm.group(2), int(cm.group(3))
        cond = "empty" if (op == "eq" and n == 0) else "nonempty"
    mut_m = re.search(r"mutation[^{]*(\{.*\})", upsert_block, re.S)
    set_nq, _del_nq = _split_mutation_blocks(mut_m.group(1))

    def build(env):
        nq = set_nq
        # substitute uid(var) with each matched uid (cartesian over vars)
        for var, df in env.items():
            token = f"uid({var})"
            if token in nq:
                uids = [r[SUBJECT] for r in df.select(SUBJECT).distinct().collect()]
                lines = []
                for line in nq.splitlines():
                    if token in line:
                        lines.extend(line.replace(token, f"<{u}>") for u in uids)
                    else:
                        lines.append(line)
                nq = "\n".join(lines)
        return _triples_from_nquads(graph, nq)

    return upsert(graph, query_text, build, cond=cond, cond_var=cond_var)


@dataclass
class UpsertResult:
    graph: Graph
    applied: bool
    matched: int


def upsert(
    graph: Graph,
    query: str,
    build_set,
    cond: str | None = None,
    cond_var: str | None = None,
) -> UpsertResult:
    """Upsert block (edgraph/server.go:874 buildUpsertQuery):
    run `query`, pass its variable environment to ``build_set(env) ->
    triples DataFrame``, apply conditionally.

    ``cond``: '@if(eq(len(v), 0))'-style check expressed as
    (cond_var, cond) with cond in {'empty', 'nonempty'} — driver-side
    cardinality check exactly like the reference's conditional upsert.
    """
    from dgraph_spark.plans import Executor

    ex = Executor(graph)
    from dgraph_spark.dql.parser import parse_dql

    pq = parse_dql(query)
    for block in ex._schedule(pq.blocks):
        ex._run_block(block)
    matched = 0
    if cond_var is not None:
        vdf = ex.env.get(cond_var)
        matched = 0 if vdf is None else vdf.select(SUBJECT).distinct().count()
        if cond == "empty" and matched != 0:
            return UpsertResult(graph=graph, applied=False, matched=matched)
        if cond == "nonempty" and matched == 0:
            return UpsertResult(graph=graph, applied=False, matched=matched)
    triples = build_set(ex.env)
    return UpsertResult(graph=set_triples(graph, triples), applied=True, matched=matched)
