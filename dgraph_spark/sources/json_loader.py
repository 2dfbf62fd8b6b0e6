"""JSON document loader (reference: chunker/json_parser.go,
chunker/chunk.go:155-298): maps/arrays melt into triples; nested objects
become edges to child nodes; the `uid` field pins node identity.

Spark-first: spark.read.json infers the schema; the melt is generated
driver-side FROM that schema (per-field selects + explodes), so the row
path stays entirely in the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from dgraph_spark.model import SUBJECT, Graph
from dgraph_spark.schema import Predicate, SchemaRegistry


def _uid_col(df: DataFrame, path_hint: str) -> F.Column:
    """uid: honor an explicit `uid` field ("0x.." or int), else hash the
    row's JSON rendering (deterministic blank-node assignment). A
    ``_salt`` column (the parent's uid for nested objects) joins the
    hash so each nested occurrence gets its OWN blank node — the
    reference mints a fresh blank node per nested object without uid
    (chunker/json_parser.go mapToNquads NewNodeId), so two nations with
    byte-identical region objects must NOT share a child."""
    if "uid" in df.columns:
        u = F.col("uid").cast("string")
        hexed = F.regexp_extract(u, r"^0[xX]([0-9a-fA-F]+)$", 1)
        return (
            F.when(hexed != "", F.conv(hexed, 16, 10).cast("long"))
            .when(u.rlike("^[0-9]+$"), u.cast("long"))
            .otherwise(F.abs(F.xxhash64(u)))
        )
    body = F.to_json(F.struct(*[F.col(c) for c in df.columns if c != "_salt"]))
    if "_salt" in df.columns:
        return F.abs(F.xxhash64(body, F.lit(path_hint), F.col("_salt")))
    return F.abs(F.xxhash64(body, F.lit(path_hint)))


def json_to_graph(
    spark: SparkSession,
    docs: DataFrame,
    type_name: str = "Node",
    schema: SchemaRegistry | None = None,
) -> Graph:
    """Melt a (possibly nested) JSON-derived DataFrame into a Graph.

    - scalar field f        -> scalar predicate f(subject, value)
    - array<scalar> field   -> list predicate (one row per element)
    - struct field f        -> uid predicate f(subject, object) + child node
    - array<struct> field   -> uid list predicate + child nodes
    """
    reg = schema or SchemaRegistry()
    preds: dict[str, DataFrame] = {}

    def melt(df: DataFrame, path: str) -> F.Column:
        """Returns the uid column for df's nodes; fills `preds`."""
        uid = _uid_col(df, path)
        annotated = df.withColumn("_uid", uid)
        for field in df.schema.fields:
            name = field.name
            if name in ("uid", "_salt"):
                continue
            typ = field.dataType
            if isinstance(typ, StructType):
                child = annotated.select(F.col("_uid").alias("_salt"), F.col(name)).where(
                    F.col(name).isNotNull()
                )
                child_flat = child.select("_salt", f"{name}.*")
                child_uid = melt(child_flat, f"{path}/{name}")
                edge = child_flat.withColumn("_cuid", child_uid).select(
                    F.col("_salt").alias(SUBJECT), F.col("_cuid").alias("object")
                )
                _append(preds, name, edge)
                reg.add(Predicate(name=name, typ="uid"))
            elif isinstance(typ, ArrayType) and isinstance(typ.elementType, StructType):
                # position joins the salt so identical sibling elements
                # still mint distinct blank nodes
                child = annotated.select(
                    F.col("_uid").alias("_parent"),
                    F.posexplode(name).alias("_pos", "_e"),
                )
                child_flat = child.select(
                    F.col("_parent"),
                    F.concat_ws("#", F.col("_parent"), F.col("_pos")).alias("_salt"),
                    "_e.*",
                )
                child_uid = melt(child_flat.drop("_parent"), f"{path}/{name}")
                edge = child_flat.withColumn("_cuid", child_uid).select(
                    F.col("_parent").alias(SUBJECT), F.col("_cuid").alias("object")
                )
                _append(preds, name, edge)
                reg.add(Predicate(name=name, typ="uid", list=True))
            elif isinstance(typ, ArrayType):
                rows = annotated.select(
                    F.col("_uid").alias(SUBJECT), F.explode(name).alias("value")
                )
                _append(preds, name, rows)
                if not reg.has(name):
                    reg.add(Predicate(name=name, typ=_scalar_name(typ.elementType), list=True))
            else:
                rows = annotated.select(F.col("_uid").alias(SUBJECT), F.col(name).alias("value")).where(
                    F.col(name).isNotNull()
                )
                _append(preds, name, rows)
                if not reg.has(name):
                    reg.add(Predicate(name=name, typ=_scalar_name(typ)))
        return uid

    root_uid = melt(docs, "")
    type_rows = docs.select(_uid_col(docs, "").alias(SUBJECT)).withColumn(
        "value", F.lit(type_name)
    )
    preds["dgraph.type"] = type_rows
    reg.add(Predicate(name="dgraph.type", typ="string", list=True))
    reg.define_type(type_name, [f.name for f in docs.schema.fields if f.name != "uid"])
    return Graph(spark=spark, preds=preds, schema=reg)


def _append(preds: dict, name: str, df: DataFrame) -> None:
    preds[name] = preds[name].unionByName(df) if name in preds else df


def _scalar_name(t) -> str:
    s = t.simpleString()
    return {
        "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
        "double": "float", "float": "float", "boolean": "bool",
        "timestamp": "datetime", "string": "string",
    }.get(s, "default")


def load_json_graph(spark: SparkSession, path: str, type_name: str = "Node") -> Graph:
    return json_to_graph(spark, spark.read.json(path), type_name)
