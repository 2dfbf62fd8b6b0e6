"""Graph view over the driver's TPC-H-ish parquet tables (FIXTURES.md §B).

Every node class gets a disjoint uid space: ``uid = tag << 40 | primary_key``
(xidmap equivalent — reference xidmap/xidmap.go:252 AssignUid assigns dense
uids; here the key spaces are already dense integers so a static tag is a
deterministic, shuffle-free uid assignment that holds at any scale factor).

All predicate DataFrames are *lazy projections* of the raw parquet —
column-pruned and filter-pushed by Catalyst; nothing is materialized at
load. A predicate table at 100 TB is a parquet scan of exactly two or
three columns, which is the same I/O dgraph's tablet would do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dgraph_spark.model import FACETS, OBJECT, SUBJECT, TYPE_PRED, VALUE, Graph
from dgraph_spark.schema import Predicate, SchemaRegistry

# uid-space tags (must stay stable — uids are the join keys everywhere)
TAGS = {
    "region": 1,
    "nation": 2,
    "customer": 3,
    "supplier": 4,
    "part": 5,
    "orders": 6,
    "lineitem": 7,
    "documents": 8,
    "embeddings": 9,
    "events": 10,
}

UID_SHIFT = 40


def uid_col(table: str, key) -> F.Column:
    """Synthesize a node uid from a table tag + integral primary key."""
    return (F.lit(TAGS[table]).cast("long") * (1 << UID_SHIFT) + key.cast("long")).alias(SUBJECT)


def uid_of(table: str, key: int) -> int:
    return TAGS[table] << UID_SHIFT | int(key)


# table -> (type name, scalar columns that become predicates)
_SCALARS = {
    "region": ("Region", ["r_name"]),
    "nation": ("Nation", ["n_name"]),
    "customer": ("Customer", ["c_name", "c_acctbal", "c_mktsegment"]),
    "supplier": ("Supplier", ["s_name", "s_acctbal"]),
    "part": ("Part", ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
    "orders": (
        "Order",
        ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    ),
    "lineitem": (
        "Lineitem",
        [
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
            "l_linenumber",
        ],
    ),
    "documents": ("Document", ["text", "lang", "source", "n_chars"]),
    "embeddings": ("Embedding", ["embedding", "label"]),
}

_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# dgraph scalar type per predicate column (everything else defaults by cast)
_PRED_TYPES = {
    "c_acctbal": "float",
    "s_acctbal": "float",
    "p_retailprice": "float",
    "p_size": "int",
    "o_totalprice": "float",
    "o_orderdate": "datetime",
    "l_quantity": "float",
    "l_extendedprice": "float",
    "l_discount": "float",
    "l_tax": "float",
    "l_shipdate": "datetime",
    "l_linenumber": "int",
    "n_chars": "int",
    "label": "int",
    "embedding": "float32vector",
}


def _with_lineitem_uid(df: DataFrame) -> DataFrame:
    """Synthesize a unique lineitem uid. The synthetic data does NOT keep
    (l_orderkey, l_linenumber) unique, so add an occurrence number via a
    partition-local window (hash-shuffled by the composite key — no
    global sort, scales to any SF). occ < 8 and linenumber < 8, so
    uid = tag<<40 | orderkey*64 + linenumber*8 + occ stays collision-free.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    )
    occ = F.row_number().over(w) - 1
    uid = (
        F.lit(TAGS["lineitem"]).cast("long") * (1 << UID_SHIFT)
        + F.col("l_orderkey").cast("long") * 64
        + F.col("l_linenumber").cast("long") * 8
        + occ.cast("long")
    )
    return df.withColumn("_li_uid", uid)


def load_tpch_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Build the graph view described in FIXTURES.md §B over ``sf_dir``."""
    raw = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TAGS if t != "events"}
    # The lineitem uid needs a disambiguating window (no natural key in
    # the synthetic data); persist the annotated relation so the window
    # runs once per session instead of once per predicate touch. In a
    # real 100 TB deployment the uid is assigned at ingest and written
    # into the warehouse — this cache only stands in for that.
    raw["lineitem"] = _with_lineitem_uid(raw["lineitem"]).persist()
    reg = SchemaRegistry()
    preds: dict[str, DataFrame] = {}
    type_rows: list[DataFrame] = []

    wide: dict[str, DataFrame] = {}
    pred_home: dict[str, tuple[str, str]] = {}
    # home -> (raw key column, uid base) for affine uid schemes
    # (uid = base + key): uid point/range predicates rewrite onto the
    # PHYSICAL key column, so parquet row-group stats can prune the scan
    # (a filter on the computed subject expression cannot be pushed)
    wide_uid_key: dict[str, tuple[str, int]] = {}
    for table, (type_name, cols) in _SCALARS.items():
        df = raw[table]
        if table == "lineitem":
            subj = F.col("_li_uid").alias(SUBJECT)  # non-affine: window uid
            key_cols: list[str] = []
        else:
            subj = uid_col(table, F.col(_KEYS[table]))
            wide_uid_key[type_name] = (_KEYS[table], TAGS[table] << UID_SHIFT)
            key_cols = [_KEYS[table]]
        available = [c for c in cols if c in df.columns]
        # wide node table: ONE scan serves every scalar predicate of the
        # type (filter/projection fusion — dgraph tablet locality analogue)
        wide[type_name] = df.select(
            subj, *[F.col(c) for c in key_cols + available])
        for c in available:
            typ = _PRED_TYPES.get(c, "string")
            if table == "documents" and c == "text":
                # model document text as a language-tagged string predicate
                # (name@en-style queries; worker/task.go:1194 lang matching)
                reg.add(Predicate(name=c, typ="string", lang=True))
                preds[c] = df.select(subj, F.col(c).alias(VALUE), F.col("lang"))
                continue
            reg.add(Predicate(name=c, typ=typ))
            preds[c] = df.select(subj, F.col(c).alias(VALUE))
            pred_home[c] = (type_name, c)
        reg.define_type(type_name, available)
        type_rows.append(df.select(subj, F.lit(type_name).alias(VALUE)))

    # ---- edges (uid predicates) ----
    edge_homes: dict[str, tuple[str | None, str | None]] = {}

    def edge(name: str, df: DataFrame, subj: F.Column, obj: F.Column,
             facets: F.Column | None = None,
             src_home: str | None = None, dst_home: str | None = None,
             **meta) -> None:
        cols = [subj.alias(SUBJECT), obj.alias(OBJECT)]
        if facets is not None:
            cols.append(facets.alias(FACETS))
        # in-row attribute columns: the scalar predicates of whichever
        # side's node table this edge is derived from (column pruning
        # drops them when unused; when used they save a self-join +
        # re-scan of that table)
        inrow_home = src_home or dst_home
        if inrow_home is not None:
            for c in wide[inrow_home].columns:
                if c != SUBJECT and c in df.columns:
                    cols.append(F.col(c))
        preds[name] = df.select(*cols)
        edge_homes[name] = (src_home, dst_home)
        reg.add(Predicate(name=name, typ="uid", **{"list": True, **meta}))

    o, li, c, s, n = raw["orders"], raw["lineitem"], raw["customer"], raw["supplier"], raw["nation"]
    li_uid = F.col("_li_uid")
    edge("placed", o, uid_col("customer", F.col("o_custkey")),
         uid_col("orders", F.col("o_orderkey")), reverse=True, dst_home="Order")
    edge("line", li, uid_col("orders", F.col("l_orderkey")),
         li_uid, count=True, dst_home="Lineitem")
    edge("of_part", li, li_uid, uid_col("part", F.col("l_partkey")),
         src_home="Lineitem", list=False)
    edge(
        "by_supplier",
        li,
        li_uid,
        uid_col("supplier", F.col("l_suppkey")),
        facets=F.struct(
            F.col("l_quantity").cast("double").alias("qty"),
            F.col("l_extendedprice").cast("double").alias("price"),
        ),
        src_home="Lineitem",
        list=False,
    )
    # the customer half carries the Customer scalars in-row (the edge IS a
    # projection of the customer table), so `~in_nation { c_name ... }`
    # reads them off the traversal join — no Customer re-scan/self-join.
    # Supplier rows take nulls for those columns (same render as "no
    # posting" on the join path).
    cust_nation = c.select(uid_col("customer", F.col("c_custkey")).alias(SUBJECT),
                           uid_col("nation", F.col("c_nationkey")).alias(OBJECT),
                           F.col("c_name"), F.col("c_acctbal"), F.col("c_mktsegment"))
    supp_nation = s.select(uid_col("supplier", F.col("s_suppkey")).alias(SUBJECT),
                           uid_col("nation", F.col("s_nationkey")).alias(OBJECT))
    preds["in_nation"] = cust_nation.unionByName(supp_nation,
                                                 allowMissingColumns=True)
    edge_homes["in_nation"] = ("Customer", None)
    reg.add(Predicate(name="in_nation", typ="uid", reverse=True))
    edge("in_region", n, uid_col("nation", F.col("n_nationkey")),
         uid_col("region", F.col("n_regionkey")), reverse=True, src_home="Nation",
         list=False)

    # type definitions include uid predicates too (dgraph types list
    # every predicate; expand(_all_) traverses the uid ones —
    # query/query.go:2070 getPredicatesFromTypes)
    for type_name, edge_names in {
        "Customer": ["placed", "in_nation"],
        "Order": ["line"],
        "Lineitem": ["of_part", "by_supplier"],
        "Supplier": ["in_nation"],
        "Nation": ["in_region"],
    }.items():
        reg.define_type(type_name, reg.type_preds(type_name) + edge_names)

    # node types
    types_df = type_rows[0]
    for t in type_rows[1:]:
        types_df = types_df.unionByName(t)
    preds[TYPE_PRED] = types_df
    reg.add(Predicate(name=TYPE_PRED, typ="string", list=True, indexes=("exact",)))

    type_uid_ranges = {
        type_name: (TAGS[table] << UID_SHIFT, (TAGS[table] + 1) << UID_SHIFT)
        for table, (type_name, _cols) in _SCALARS.items()
    }
    return Graph(spark=spark, preds=preds, schema=reg, wide=wide,
                 pred_home=pred_home, edge_homes=edge_homes,
                 type_uid_ranges=type_uid_ranges, wide_uid_key=wide_uid_key)
