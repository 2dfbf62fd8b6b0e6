"""RDF N-Quad loader / exporter (reference: chunker/rdf_parser.go,
chunker/chunk.go:86-153 for load; query/outputrdf.go + worker/export.go
for export).

Spark-first: the N-Quad grammar is regular enough for regexp_extract —
the whole parse is JVM-side column expressions over spark.read.text
(no Python in the row path). Uid assignment for blank/external ids is
xxhash64-based (stateless, shuffle-free — the scalable analogue of
xidmap/xidmap.go:252 AssignUid; documented divergence: ids are hashes,
not dense counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dgraph_spark.model import FACETS, OBJECT, SUBJECT, VALUE, Graph
from dgraph_spark.schema import SchemaRegistry

# <subj> <pred> <obj-or-literal> (facets)? .
# subj: <0x1> | <name> | _:blank ; obj: same, or "literal"(@lang|^^<type>)?
_NQUAD_RE = (
    r'^\s*'
    r'(?:<([^>]*)>|(_:[A-Za-z0-9_.\-]+))\s+'      # 1 iri-subject | 2 blank
    r'<([^>]*)>\s+'                                # 3 predicate
    r'(?:<([^>]*)>|(_:[A-Za-z0-9_.\-]+)|"((?:[^"\\]|\\.)*)"'  # 4 iri-obj | 5 blank-obj | 6 literal
    r'(?:@([a-zA-Z\-]+))?'                         # 7 lang
    r'(?:\^\^<([^>]*)>)?'                          # 8 datatype
    r')'
    r'(?:\s+\(([^)]*)\))?'                         # 9 facets "k=v, k2=v2"
    r'\s*\.\s*$'
)

# one `key = value` pair inside the facet group; a quoted value may
# contain commas/equals/escaped quotes, an unquoted value runs to the
# next comma (types/facets parseFacets)
_FACET_KV_RE = r'([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*("(?:[^"\\]|\\.)*"|[^,]*)'


def _uid_expr(iri: F.Column, blank: F.Column) -> F.Column:
    """uid for an id token: numeric '<0x..>'/'<123>' parsed directly,
    anything else (external xid / blank node) hashed via xxhash64."""
    tok = F.coalesce(iri, blank)
    hexed = F.regexp_extract(tok, r"^0[xX]([0-9a-fA-F]+)$", 1)
    dec = F.regexp_extract(tok, r"^([0-9]+)$", 1)
    return (
        F.when(hexed != "", F.conv(hexed, 16, 10).cast("long"))
        .when(dec != "", dec.cast("long"))
        # hash-uid: mask the sign bit (a true clear, unlike abs() which
        # folds the space and leaves abs(Long.MIN_VALUE) negative)
        .otherwise(F.xxhash64(tok).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF)))
    )


def parse_nquads(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """text lines -> triples(subject, predicate, object_uid, value_str,
    lang, datatype, facets map<string,string>). Malformed/comment lines
    are dropped (chunker behavior)."""
    c = F.col(text_col)
    parts = [F.regexp_extract(c, _NQUAD_RE, i) for i in range(10)]
    df = (
        lines.where(~F.trim(c).startswith("#") & (F.trim(c) != ""))
        .select(
            _uid_expr(F.nullif(parts[1], F.lit("")), F.nullif(parts[2], F.lit(""))).alias(SUBJECT),
            F.nullif(parts[3], F.lit("")).alias("predicate"),
            F.when(
                (parts[4] != "") | (parts[5] != ""),
                _uid_expr(F.nullif(parts[4], F.lit("")), F.nullif(parts[5], F.lit(""))),
            ).alias("object_uid"),
            # a literal may legitimately be "" (dgraph stores empty
            # strings); anything that isn't a uid/blank object is the
            # literal branch of the regex. N-Quad escape sequences
            # (\" \\ \n \uXXXX — chunker/rdf unescaping) decode JVM-side:
            # the escaping grammar matches JSON's, so from_json on the
            # re-quoted body is an exact, vectorized unescape.
            F.when(
                (parts[4] == "") & (parts[5] == ""),
                F.coalesce(
                    F.from_json(
                        F.concat(F.lit('["'), parts[6], F.lit('"]')), "array<string>"
                    )[0],
                    parts[6],
                ),
            ).alias("value_str"),
            F.nullif(parts[7], F.lit("")).alias("lang"),
            F.nullif(parts[8], F.lit("")).alias("datatype"),
            F.when(
                parts[9] != "",
                F.map_from_entries(
                    F.zip_with(
                        F.regexp_extract_all(parts[9], F.lit(_FACET_KV_RE), 1),
                        F.regexp_extract_all(parts[9], F.lit(_FACET_KV_RE), 2),
                        lambda k, v: F.struct(
                            k.alias("key"),
                            # quoted values may contain ','/'='/escapes:
                            # JSON-decode them (the escape grammar
                            # matches), then RE-WRAP in quotes — quoted
                            # facets are STRING-typed no matter what they
                            # look like (types/facets/utils.go
                            # valAndValType: `strings should be in
                            # quotes`), so the quote marker must survive
                            # into storage for readers to type correctly.
                            # Unquoted values just trim.
                            F.coalesce(
                                F.when(
                                    v.rlike(r'^".*"$'),
                                    F.concat(
                                        F.lit('"'),
                                        F.from_json(
                                            F.concat(F.lit("["), v, F.lit("]")),
                                            "array<string>",
                                        )[0],
                                        F.lit('"'),
                                    ),
                                ),
                                F.trim(v),
                            ).alias("value"),
                        ),
                    )
                ),
            ).alias(FACETS),
        )
        .where(F.col("predicate").isNotNull())
    )
    return df


def read_rdf(spark: SparkSession, path: str) -> DataFrame:
    """Load .rdf/.nq(.gz) files into a triples DataFrame (bulk-loader
    front half, dgraph/cmd/bulk — in Spark a plain distributed read)."""
    return parse_nquads(spark.read.text(path))


# ---------------------------------------------------------------- to Graph
_CAST = {
    "int": "long",
    "integer": "long",
    "float": "double",
    "double": "double",
    "bool": "boolean",
    "boolean": "boolean",
    "datetime": "timestamp",
    "string": "string",
    "default": "string",
}


def _datetime_expr(col: F.Column) -> F.Column:
    """RFC3339 → timestamp tolerating offsets beyond java.time's ±18:00
    (Go time.Parse accepts any ±HH:MM, and the reference test data uses
    +23:00). Wide offsets are stripped, parsed as UTC, then shifted."""
    wide = col.rlike(r"[+-](1[89]|2[0-3]):\d{2}$")
    sign = F.when(col.rlike(r"-\d{2}:\d{2}$"), F.lit(-1)).otherwise(F.lit(1))
    hh = F.regexp_extract(col, r"[+-](\d{2}):\d{2}$", 1).cast("int") * sign
    mm = F.regexp_extract(col, r"[+-]\d{2}:(\d{2})$", 1).cast("int") * sign
    naive = F.concat(F.regexp_replace(col, r"[+-]\d{2}:\d{2}$", ""), F.lit("Z"))
    shifted = naive.cast("timestamp") - F.make_dt_interval(F.lit(0), hh, mm, F.lit(0))
    return F.when(wide, shifted).otherwise(col.cast("timestamp"))


def graph_from_triples(
    spark: SparkSession, triples: DataFrame, schema: SchemaRegistry
) -> Graph:
    """Pivot a long triples DataFrame into the per-predicate Graph model.
    Predicate pruning on the long table ≈ dgraph tablet routing; at scale
    the triples table should be written partitioned by predicate so each
    pred view prunes to its own files."""
    preds: dict[str, DataFrame] = {}
    pred_names = [r["predicate"] for r in triples.select("predicate").distinct().collect()]
    for name in pred_names:
        meta = schema.get(name)
        rows = triples.where(F.col("predicate") == name)
        if meta.is_uid:
            cols = [F.col(SUBJECT), F.col("object_uid").alias(OBJECT)]
            if FACETS in triples.columns:
                cols.append(F.col(FACETS))
            preds[name] = rows.select(*cols)
        else:
            if meta.typ == "datetime":
                value = _datetime_expr(F.col("value_str")).alias(VALUE)
                # keep the lexical form when it carries a non-zero UTC
                # offset: Go's time.Time preserves the parsed zone and
                # marshals it back (types/time.go), so "…+23:00" must
                # render as written, not normalized to Z
                off = F.regexp_extract(F.col("value_str"), r"([+-]\d{2}:\d{2})$", 1)
                vraw = F.when(
                    (off != "") & ~off.isin("+00:00", "-00:00"), F.col("value_str")
                ).alias("vraw")
                cols = [F.col(SUBJECT), value, vraw]
            elif meta.typ == "float32vector":
                # vectors arrive as "[1.1, 2.2]" strings (chunker JSON /
                # RDF ^^<float32vector>); ""/"[]" create NO posting
                # (json_parser_test.go TestNquadsJsonEmptyStringVectorPred)
                rows = rows.where(
                    F.trim(F.col("value_str")).rlike(r"\[\s*[^\s\]]"))
                value = F.from_json(
                    F.col("value_str"), "array<float>").alias(VALUE)
                cols = [F.col(SUBJECT), value]
            else:
                value = F.col("value_str").cast(_CAST.get(meta.typ, "string")).alias(VALUE)
                cols = [F.col(SUBJECT), value]
            if meta.lang:
                cols.append(F.col("lang"))
            if FACETS in triples.columns:
                # facets attach to VALUE edges too (types/facets/utils.go:75)
                cols.append(F.col(FACETS))
            preds[name] = rows.select(*cols)
    return Graph(spark=spark, preds=preds, schema=schema)


def load_rdf_graph(spark: SparkSession, path: str, schema_text: str) -> Graph:
    """One-call loader: N-Quad files + dgraph schema text -> Graph."""
    return graph_from_triples(spark, read_rdf(spark, path), SchemaRegistry.parse(schema_text))


# ------------------------------------------------------------------ export
def export_rdf(graph: Graph) -> DataFrame:
    """Graph -> one N-Quad line per triple (worker/export.go,
    query/outputrdf.go:28) as DataFrame[line: string]."""
    frames = []
    for name, df in graph.preds.items():
        if graph.schema.get(name).is_uid:
            line = F.format_string("<0x%x> <%s> <0x%x> .", F.col(SUBJECT), F.lit(name), F.col(OBJECT))
            frames.append(df.select(line.alias("line")))
        else:
            lang = F.col("lang") if "lang" in df.columns else F.lit(None).cast("string")
            line = F.concat(
                F.format_string('<0x%x> <%s> "', F.col(SUBJECT), F.lit(name)),
                F.regexp_replace(F.col(VALUE).cast("string"), r'(["\\])', r"\\$1"),
                F.lit('"'),
                F.when(lang.isNotNull(), F.concat(F.lit("@"), lang)).otherwise(F.lit("")),
                F.lit(" ."),
            )
            frames.append(df.select(line.alias("line")))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def export_json(graph: Graph) -> DataFrame:
    """Graph -> JSON lines, one node per line with all scalar predicates
    (worker/export.go JSON flavor)."""
    t = graph.to_triples()
    per_pred = (
        t.groupBy(SUBJECT, "predicate")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.coalesce(
                        F.col("value_str"), F.format_string("0x%x", F.col("object_uid"))
                    )
                )
            ).alias("vals")
        )
    )
    return (
        per_pred.groupBy(SUBJECT)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("predicate").alias("key"), F.col("vals").alias("value")))
            ).alias("m")
        )
        .select(
            F.to_json(
                F.struct(F.format_string("0x%x", F.col(SUBJECT)).alias("uid"), F.col("m").alias("preds"))
            ).alias("json")
        )
    )
