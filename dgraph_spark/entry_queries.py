"""Registry of driver-checkable queries: each entry pairs a Spark
callable (spark, sf_dir) -> DataFrame with an equivalent DuckDB oracle
SQL over the raw parquet views. Column names/aliases MUST match between
the two sides (the driver hash-compares values after sorting columns by
name).

Each entry exercises one operator family from SURVEY.md §2; most go
through the full DQL parse -> plan -> execute pipeline (execute_flat);
the iterative/vector ones use the operator APIs directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dgraph_spark.model import SUBJECT, Graph
from dgraph_spark.operators.graph_algos import reachable
from dgraph_spark.operators.similarity import similar_to
from dgraph_spark.plans import Executor
from dgraph_spark.sources.tpch_graph import load_tpch_graph, uid_of


_GRAPH_CACHE: dict[tuple[int, str], Graph] = {}


def _g(spark: SparkSession, sf_dir: str) -> Graph:
    """Graph views are lazy projections; cache per (session, dir) so
    repeated queries reuse analyzed plans + parquet file indexes instead
    of re-listing/re-inferring every call."""
    # timestamps must render UTC regardless of the caller's session
    # defaults (oracle comparisons hash rendered datetimes)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (id(spark), sf_dir)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = load_tpch_graph(spark, sf_dir)
    return _GRAPH_CACHE[key]


def _flat(spark, sf_dir, dql, block=None) -> DataFrame:
    return Executor(_g(spark, sf_dir)).execute_flat(dql, block)


def _round(df: DataFrame, cols: dict[str, int]) -> DataFrame:
    out = df
    for c, n in cols.items():
        out = out.withColumn(c, F.round(F.col(c), n))
    return out


# --------------------------------------------------------------------------
# Each builder returns (callable, oracle_sql | None)
# --------------------------------------------------------------------------

def q_root_eq_reverse_traversal(spark, sf_dir):
    """eq root fn + reverse edge + type()/ineq filter (SURVEY §2.3, §2.4)."""
    return _flat(spark, sf_dir, '''
    { q(func: eq(n_name, "NATION_3")) {
        cust: ~in_nation @filter(type(Customer) AND gt(c_acctbal, 1000)) {
          c_name c_acctbal
        }
    } }''')


SQL_root_eq_reverse_traversal = """
SELECT c_name, c_acctbal FROM customer
WHERE c_nationkey = 3 AND c_acctbal > 1000
"""


def q_between_dates(spark, sf_dir):
    """between() on datetime + gt filter (SURVEY §2.3)."""
    return _flat(spark, sf_dir, '''
    { q(func: between(o_orderdate, "1995-01-01", "1996-12-31")) @filter(gt(o_totalprice, 200000)) {
        o_totalprice o_orderstatus
    } }''')


SQL_between_dates = """
SELECT o_totalprice, o_orderstatus FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND o_totalprice > 200000
"""


def q_count_having(spark, sf_dir):
    """gt(count(pred), n) at root — count index path (worker/task.go:1222)."""
    return _flat(spark, sf_dir, '''
    { q(func: gt(count(placed), 12)) { c_name cnt: count(placed) } }''')


SQL_count_having = """
SELECT c_name, COUNT(*) AS cnt
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name HAVING COUNT(*) > 12
"""


def q_topk_root_order(spark, sf_dir):
    """orderdesc + first at root (worker/sort.go)."""
    return _flat(spark, sf_dir, '''
    { q(func: type(Customer), orderdesc: c_acctbal, first: 20) { c_name c_acctbal } }''')


SQL_topk_root_order = """
SELECT c_name, c_acctbal FROM customer
ORDER BY c_acctbal DESC, c_custkey LIMIT 20
"""


def q_per_parent_topk(spark, sf_dir):
    """per-parent sort+pagination window (query/query.go:2493)."""
    return _flat(spark, sf_dir, '''
    { q(func: eq(n_name, "NATION_1")) {
        cust: ~in_nation @filter(type(Customer)) {
          c_name
          placed (first: 2, orderdesc: o_totalprice) { o_totalprice }
        }
    } }''')


SQL_per_parent_topk = """
SELECT c_name, o_totalprice FROM (
  SELECT c.c_name, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey = 1
) WHERE rn <= 2
"""


def q_anyofterms(spark, sf_dir):
    """term tokenizer + any-match (tok/tok.go:369)."""
    return _flat(spark, sf_dir, '''
    { q(func: anyofterms(p_name, "green widget")) { p_name p_brand } }''')


SQL_anyofterms = """
SELECT p_name, p_brand FROM part
WHERE list_has_any(string_split_regex(lower(p_name), '[^a-z0-9]+'),
                   ['green', 'widget'])
"""


def q_allofterms(spark, sf_dir):
    return _flat(spark, sf_dir, '''
    { q(func: allofterms(p_name, "small ring")) { p_name p_type } }''')


SQL_allofterms = """
SELECT p_name, p_type FROM part
WHERE list_has_all(string_split_regex(lower(p_name), '[^a-z0-9]+'),
                   ['small', 'ring'])
"""


def q_regexp(spark, sf_dir):
    """regexp(p, /re/) — exact regex eval (worker/task.go:1240)."""
    return _flat(spark, sf_dir, r'''
    { q(func: regexp(p_type, /^ECO/)) { p_name p_type } }''')


SQL_regexp = """
SELECT p_name, p_type FROM part WHERE regexp_matches(p_type, '^ECO')
"""


def q_fuzzy_match(spark, sf_dir):
    """match() fuzzy Levenshtein (worker/match.go:24)."""
    return _flat(spark, sf_dir, '''
    { q(func: match(n_name, "NATION^5", 1)) { n_name } }''')


SQL_fuzzy_match = """
SELECT n_name FROM nation WHERE levenshtein(lower(n_name), 'nation^5') <= 1
"""


def q_math_per_uid(spark, sf_dir):
    """value vars + math() arithmetic (dql/math.go, query/math.go)."""
    df = _flat(spark, sf_dir, '''
    { q(func: type(Lineitem)) @filter(gt(l_extendedprice, 90000)) {
        p as l_extendedprice
        d as l_discount
        revenue: math(p * (1 - d))
    } }''')
    # No rounding on either side: both engines compute p*(1-d) as the
    # same IEEE-754 double (bit-identical), and the driver canonicalizes
    # floats with %.6g — rounding (F.round vs DuckDB round/::DECIMAL)
    # is exactly where the engines' half-way conventions diverge.
    return df


SQL_math_per_uid = """
SELECT l_extendedprice, l_discount,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem WHERE l_extendedprice > 90000
"""


def q_geo_intersects(spark, sf_dir):
    """Full polygon intersects() incl. segment-crossing (geo.py): a tall
    thin rectangle per customer vs a fixed wide flat query rectangle —
    for most matches every vertex of each is OUTSIDE the other, so only
    the segment test fires. Oracle twin: interval-overlap algebra on the
    same doubles (types/geofilter.go:194 Intersects)."""
    from dgraph_spark.functions.geo import intersects

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    x = F.col("c_acctbal") / 1000.0
    y = (F.col("c_custkey") % 100) / 10.0 - 4.95
    s = lambda c: c.cast("string")  # noqa: E731
    rect = F.concat(
        F.lit('{"type":"Polygon","coordinates":[[['),
        s(x - 0.3), F.lit(","), s(y - 3), F.lit("],["),
        s(x + 0.3), F.lit(","), s(y - 3), F.lit("],["),
        s(x + 0.3), F.lit(","), s(y + 3), F.lit("],["),
        s(x - 0.3), F.lit(","), s(y + 3), F.lit("],["),
        s(x - 0.3), F.lit(","), s(y - 3), F.lit("]]]}"),
    )
    query_rect = '{"type":"Polygon","coordinates":[[[-3,-0.5],[3,-0.5],[3,0.5],[-3,0.5],[-3,-0.5]]]}'
    return (
        cust.withColumn("_g", rect)
        .where(intersects(F.col("_g"), query_rect))
        .select("c_name")
    )


def q_geo_near_poly(spark, sf_dir):
    """near() against POLYGON rows (geo.py numpy kernels): query point
    (0,0) matches rectangles it lies inside OR whose boundary is within
    30 km (types/geofilter.go:187 — the reference's cap-intersection).
    Oracle twin: per-axis clamp distance to an axis-aligned rectangle in
    the same equirectangular projection (kx=111320 at lat 0, ky=110540)."""
    from dgraph_spark.functions.geo import near

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    x = F.col("c_acctbal") / 1000.0
    y = (F.col("c_custkey") % 100) / 10.0 - 4.95
    s = lambda c: c.cast("string")  # noqa: E731
    rect = F.concat(
        F.lit('{"type":"Polygon","coordinates":[[['),
        s(x - 0.3), F.lit(","), s(y - 3), F.lit("],["),
        s(x + 0.3), F.lit(","), s(y - 3), F.lit("],["),
        s(x + 0.3), F.lit(","), s(y + 3), F.lit("],["),
        s(x - 0.3), F.lit(","), s(y + 3), F.lit("],["),
        s(x - 0.3), F.lit(","), s(y - 3), F.lit("]]]}"),
    )
    return (
        cust.withColumn("_g", rect)
        .where(near(F.col("_g"), 0.0, 0.0, 30000.0))
        .select("c_name")
    )


SQL_geo_near_poly = """
SELECT c_name FROM customer
WHERE sqrt(
    pow(greatest(c_acctbal/1000.0 - 0.3, -(c_acctbal/1000.0 + 0.3), 0) * 111320.0, 2)
  + pow(greatest((c_custkey % 100)/10.0 - 4.95 - 3,
                 -((c_custkey % 100)/10.0 - 4.95 + 3), 0) * 110540.0, 2)
) <= 30000.0
"""


SQL_geo_intersects = """
SELECT c_name FROM customer
WHERE (c_acctbal / 1000.0 + 0.3) > -3 AND (c_acctbal / 1000.0 - 0.3) < 3
  AND ((c_custkey % 100) / 10.0 - 4.95 + 3) > -0.5
  AND ((c_custkey % 100) / 10.0 - 4.95 - 3) < 0.5
"""


def q_recurse_depth5(spark, sf_dir):
    """Deep @recurse: 5 levels, multiple uid preds tried per round
    (region -> nation -> customer|supplier -> order -> lineitem).
    Driver actions stay O(depth) — one flat pred-tagged frontier join
    per round (executor._descend_recurse)."""
    return _flat(spark, sf_dir, '''
    { q(func: eq(r_name, "AFRICA")) @recurse(depth: 5) {
        ~in_region ~in_nation placed line r_name n_name c_name } }''')


SQL_recurse_depth5 = """
SELECT r.r_name AS r_name, NULL AS n_name, NULL AS c_name,
       NULL AS r_name_l1, n.n_name AS n_name_l1, NULL AS c_name_l1,
       NULL AS r_name_l2, NULL AS n_name_l2, c.c_name AS c_name_l2,
       NULL AS r_name_l3, NULL AS n_name_l3, NULL AS c_name_l3,
       NULL AS r_name_l4, NULL AS n_name_l4, NULL AS c_name_l4
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey  = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'AFRICA'
"""


def q_expand_all(spark, sf_dir):
    """expand(_all_) with nested body: scalar preds flatten, uid preds
    traverse as child blocks (query/query.go:2038 expandSubgraph)."""
    return _flat(spark, sf_dir, '''
    { q(func: type(Nation)) { expand(_all_) { r_name } } }''')


SQL_expand_all = """
SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_agg_math_root(spark, sf_dir):
    """Root math() over aggregate-defined vars — each var collapses with
    ITS defining aggregate, not a blanket SUM (query/query.go empty-uid
    scalar aggregates)."""
    return _flat(spark, sf_dir, '''
    {
      var(func: type(Part)) { x as p_retailprice }
      me() {
        m1 as min(val(x))
        m2 as max(val(x))
        spread: math(m2 - m1)
      }
    }''', block="me").select("spread")


SQL_agg_math_root = """
SELECT max(p_retailprice) - min(p_retailprice) AS spread FROM part
"""


def q_level_agg_sum(spark, sf_dir):
    """value variable defined in one block, level-aggregated in another
    (query/query.go:1042 evalLevelAgg)."""
    df = _flat(spark, sf_dir, '''
    {
      var(func: type(Customer)) { placed { t as o_totalprice } }
      q(func: type(Customer)) @filter(has(placed)) {
        c_name
        revenue: sum(val(t))
      }
    }''', block="q")
    return _round(df, {"revenue": 2})


SQL_level_agg_sum = """
SELECT c_name, round(SUM(o_totalprice), 2) AS revenue
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
"""


def q_groupby_q1(spark, sf_dir):
    """@groupby + aggregates == TPC-H Q1 shape (query/groupby.go)."""
    df = _flat(spark, sf_dir, '''
    {
      var(func: type(Lineitem)) @filter(le(l_shipdate, "1998-09-02")) { q as l_quantity }
      grouped(func: type(Lineitem)) @filter(le(l_shipdate, "1998-09-02"))
          @groupby(l_returnflag, l_linestatus) {
        sum_qty: sum(val(q))
        avg_qty: avg(val(q))
        cnt: count(uid)
      }
    }''', block="grouped")
    return _round(df, {"avg_qty": 6})


SQL_groupby_q1 = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       round(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS cnt
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_uid_in(spark, sf_dir):
    """uid_in(pred, uid) neighbor-set test (worker/task.go:930)."""
    nation2 = uid_of("nation", 2)
    return _flat(spark, sf_dir, f'''
    {{ q(func: type(Customer)) @filter(uid_in(in_nation, {nation2})) {{ c_name }} }}''')


SQL_uid_in = """
SELECT c_name FROM customer WHERE c_nationkey = 2
"""


def q_uid_literal(spark, sf_dir):
    """uid(...) literal root (query/query.go:2178)."""
    u5 = uid_of("customer", 5)
    u9 = uid_of("customer", 9)
    return _flat(spark, sf_dir, f'''
    {{ q(func: uid({u5}, {u9})) {{ c_name c_acctbal }} }}''')


SQL_uid_literal = """
SELECT c_name, c_acctbal FROM customer WHERE c_custkey IN (5, 9)
"""


def q_not_has(spark, sf_dir):
    """NOT + has() — set difference (algo/uidlist.go Difference)."""
    return _flat(spark, sf_dir, '''
    { q(func: type(Order)) @filter(NOT has(line)) { o_totalprice o_orderstatus } }''')


SQL_not_has = """
SELECT o_totalprice, o_orderstatus FROM orders
WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
"""


def q_facet_filter(spark, sf_dir):
    """@facets(ge(k, v)) edge-facet filter (worker/task.go:636)."""
    return _flat(spark, sf_dir, '''
    { q(func: type(Supplier)) {
        s_name
        lines: ~by_supplier @facets(ge(qty, 45)) { l_quantity l_extendedprice }
    } }''')


SQL_facet_filter = """
SELECT s_name, l_quantity, l_extendedprice
FROM supplier JOIN lineitem ON l_suppkey = s_suppkey
WHERE l_quantity >= 45
"""


def q_count_uid_root(spark, sf_dir):
    """count(uid) at root (fast count exit, query/query.go:2278)."""
    return _flat(spark, sf_dir, '''
    { q(func: type(Order)) @filter(eq(o_orderstatus, "F")) { total: count(uid) } }''')


SQL_count_uid_root = """
SELECT COUNT(*) AS total FROM orders WHERE o_orderstatus = 'F'
"""


def q_cascade(spark, sf_dir):
    """@cascade inner-join semantics (query/query.go:573 treeCopy)."""
    return _flat(spark, sf_dir, '''
    { q(func: type(Customer)) @cascade {
        c_name
        placed @filter(gt(o_totalprice, 400000)) { o_totalprice }
    } }''')


SQL_cascade = """
SELECT c_name, o_totalprice
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE o_totalprice > 400000
"""


def q_lang_preference(spark, sf_dir):
    """language-tagged strings + preference (worker/task.go:1194)."""
    return _flat(spark, sf_dir, '''
    { q(func: type(Document)) { src: source txt: text@fr } }''')


SQL_lang_preference = """
SELECT source AS src,
       CASE WHEN lang = 'fr' THEN text ELSE NULL END AS txt
FROM documents
"""


def q_recurse_reach(spark, sf_dir):
    """@recurse reachability semantics (query/recurse.go) — customers to
    their region via in_nation/in_region, as (c_name, r_name) pairs."""
    g = _g(spark, sf_dir)
    starts = g.uids_of_type("Customer")
    reach = reachable(g, starts, ["in_nation", "in_region"], max_depth=3)
    regions = g.uids_of_type("Region").withColumnRenamed(SUBJECT, "node")
    pairs = reach.join(regions, "node", "left_semi")
    cn = g.scalar("c_name").select(F.col(SUBJECT).alias("start"), F.col("value").alias("c_name"))
    rn = g.scalar("r_name").select(F.col(SUBJECT).alias("node"), F.col("value").alias("r_name"))
    return pairs.join(cn, "start").join(rn, "node").select("c_name", "r_name")


SQL_recurse_reach = """
SELECT c_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


_SHORTEST_EP_CACHE: dict = {}


def q_shortest_path(spark, sf_dir):
    """shortest path (query/shortest.go) — hop-count Dijkstra from
    customer 1 to its region; oracle is a recursive CTE."""
    g = _g(spark, sf_dir)
    ex = Executor(g)
    cust1 = uid_of("customer", 1)
    # resolve customer 1's region uid (2 hops) for the `to:` endpoint —
    # a constant per dataset, cached across repeated bench runs
    r_uid = _SHORTEST_EP_CACHE.get(sf_dir)
    if r_uid is None:
        nat = g.edge("in_nation").where(F.col(SUBJECT) == cust1).select(F.col("object").alias("n"))
        reg = g.edge("in_region").select(F.col(SUBJECT).alias("n"), F.col("object").alias("r"))
        r_uid = nat.join(reg, "n").select("r").collect()[0]["r"]
        _SHORTEST_EP_CACHE[sf_dir] = r_uid
    df = ex.execute_flat(f'''
    {{ path as shortest(from: {cust1}, to: {r_uid}) {{ in_nation in_region }} }}''')
    return df.select(F.col("dist"))


SQL_shortest_path = """
WITH RECURSIVE e AS (
  SELECT (3::BIGINT << 40) + c_custkey AS src,
         (2::BIGINT << 40) + c_nationkey AS dst FROM customer
  UNION ALL
  SELECT (2::BIGINT << 40) + n_nationkey, (1::BIGINT << 40) + n_regionkey FROM nation
),
walk(node, dist) AS (
  SELECT (3::BIGINT << 40) + 1, 0.0::DOUBLE
  UNION ALL
  SELECT e.dst, w.dist + 1.0 FROM walk w JOIN e ON e.src = w.node WHERE w.dist < 4
)
SELECT min(dist) AS dist FROM walk
WHERE node = (SELECT (1::BIGINT << 40) + n_regionkey FROM customer
              JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey = 1)
"""


def q_similar_to(spark, sf_dir):
    """similar_to k-NN, exact top-k (worker/task.go:359, tok/hnsw/)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = similar_to(
        emb.where(F.col("vec_id") != 0),
        list(qvec), k=10, metric="euclidean",
        id_col="vec_id", vec_col="embedding",
    )
    return _round(out, {"dist": 3})


SQL_similar_to = """
SELECT vec_id, round(list_distance(embedding,
         (SELECT embedding FROM embeddings WHERE vec_id = 0)), 3) AS dist
FROM embeddings WHERE vec_id != 0
ORDER BY list_distance(embedding,
         (SELECT embedding FROM embeddings WHERE vec_id = 0)) ASC, vec_id ASC
LIMIT 10
"""


def q_knn_batch(spark, sf_dir):
    """Batch k-NN (GEMM scan path): 8 query vectors against the corpus,
    exact cosine top-5 each, (dist, id) tie order."""
    from dgraph_spark.operators.similarity import similar_to_many

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = similar_to_many(
        emb.where(F.col("vec_id") >= 8), queries, k=5, metric="cosine",
        id_col="vec_id", vec_col="embedding")
    return _round(out, {"dist": 3})


SQL_knn_batch = """
SELECT qid, vec_id, round(dist, 3) AS dist FROM (
  SELECT q.vec_id AS qid, v.vec_id,
         1.0 - list_cosine_similarity(v.embedding, q.embedding) AS dist,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY 1.0 - list_cosine_similarity(v.embedding, q.embedding),
                    v.vec_id) AS rn
  FROM embeddings v JOIN embeddings q
    ON q.vec_id < 8 AND v.vec_id >= 8)
WHERE rn <= 5
"""


def _lsh_planes(dim: int = 64, n: int = 6) -> list:
    """Fixed seeded hyperplanes shared by the Spark query and its SQL
    twin — making the LSH-bucketed ANN fully deterministic."""
    import random

    rng = random.Random(42)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n)]


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbors — the 100 TB ANN
    shape: hyperplane signature equi-join prunes candidates, exact
    re-rank inside the probed buckets (operators/similarity.py
    ann_topk_lsh). Deterministic planes give an exact SQL twin."""
    from dgraph_spark.operators.similarity import ann_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = ann_topk_lsh(
        emb.where(F.col("vec_id") != 0), list(qvec), k=10,
        hyperplanes=_lsh_planes(), metric="euclidean",
        id_col="vec_id", vec_col="embedding", probe_hamming=2)
    return _round(out, {"dist": 3})


def _sql_ann_lsh() -> str:
    planes = _lsh_planes()

    def bucket(col: str) -> str:
        terms = []
        for i, p in enumerate(planes):
            lit = "[" + ", ".join(f"{x!r}" for x in p) + "]"
            terms.append(f"(CASE WHEN list_inner_product({col}, {lit}) >= 0 "
                         f"THEN {1 << i} ELSE 0 END)")
        return "(" + " + ".join(terms) + ")"

    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_distance(embedding::DOUBLE[], (SELECT v FROM q)), 3) AS dist
FROM embeddings
WHERE vec_id != 0
  AND bit_count(xor({bucket('embedding')}::BIGINT,
                    (SELECT {bucket('v')} FROM q)::BIGINT)) <= 2
ORDER BY list_distance(embedding::DOUBLE[], (SELECT v FROM q)) ASC, vec_id ASC
LIMIT 10
"""


def q_stream_tumbling(spark, sf_dir):
    """Structured-Streaming-shaped tumbling window agg (batch-equivalent;
    extension beyond reference — SURVEY §2.11)."""
    from dgraph_spark.sources.events import read_events

    ev = read_events(spark, sf_dir)
    out = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt", "sum_value")
    )
    return out


SQL_stream_tumbling = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
       COUNT(*) AS cnt, round(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_dedup_exact(spark, sf_dir):
    """exact dedup: duplicate-text groups (training-pipeline op)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy("text").agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
    )


SQL_dedup_exact = """
SELECT text, COUNT(*) AS c FROM documents GROUP BY text HAVING COUNT(*) > 1
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    """EXACT word-2-shingle jaccard near-dup pairs >= 0.7 (inverted-index
    join — the correctness baseline for MinHash/LSH)."""
    from dgraph_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(docs, threshold=0.7, n=2)


SQL_dedup_ngram_jaccard = """
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS w
        FROM documents)
), pairs AS (
  SELECT a.doc_id AS i, b.doc_id AS j,
         len(list_intersect(a.sh, b.sh))::DOUBLE
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
  WHERE len(a.sh) > 0 AND len(b.sh) > 0
)
SELECT i, j, round(jac, 4) AS jac FROM pairs WHERE jac >= 0.7
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash + banded LSH near-dup candidates w/ exact verification —
    the 100 TB scale path. The hash family is the engine-portable
    md5-60bit affine family (operators/dedup.py MH_A), so the DuckDB
    oracle reproduces the exact signatures, band keys and verified
    pairs."""
    from dgraph_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, threshold=0.7, num_hashes=64, bands=16)


def _sql_dedup_minhash_lsh() -> str:
    """DuckDB twin of minhash_lsh_pairs(threshold=0.7, num_hashes=64,
    bands=16): identical md5-60bit affine hash family (shared MH_A/MH_B
    constants), band = exact equality of the 4-row signature segment,
    then exact-jaccard verification of candidates."""
    from dgraph_spark.operators.dedup import MH_A, MH_B, MH_P

    ab = ", ".join(f"({k}, {MH_A[k]}, {MH_B[k]})" for k in range(64))
    return f"""
WITH sh0 AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS w
        FROM documents)
), sh AS (SELECT id, sh FROM sh0 WHERE len(sh) > 0),
post AS (SELECT id, ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT % {MH_P} AS u FROM sh),
ab(k, a, b) AS (VALUES {ab}),
sig AS (
  SELECT id, k, min((a * u + b) % {MH_P}) AS m
  FROM post CROSS JOIN ab GROUP BY id, k
),
band AS (
  SELECT id, k // 4 AS band, string_agg(m::VARCHAR, ',' ORDER BY k) AS key
  FROM sig GROUP BY id, k // 4
),
cand AS (
  SELECT DISTINCT a.id AS i, b.id AS j
  FROM band a JOIN band b ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
verified AS (
  SELECT i, j,
         len(list_intersect(x.sh, y.sh))::DOUBLE
           / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
  FROM cand JOIN sh x ON x.id = cand.i JOIN sh y ON y.id = cand.j
)
SELECT i, j, round(jac, 4) AS jac FROM verified WHERE jac >= 0.7
"""


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-pairs within Hamming distance 3. Token hash is the
    engine-portable md5-60bit, so the DuckDB oracle reproduces the exact
    simhash values and band join."""
    from dgraph_spark.operators.dedup import simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_pairs(docs, max_hamming=3)


SQL_dedup_simhash = """
WITH tok AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')) AS w
  FROM documents
),
h AS (SELECT id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok),
votes AS (
  SELECT id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT unnest(range(60)) AS bit) bits
  GROUP BY id, bit
),
sims AS (
  SELECT id, sum(CASE WHEN v > 0 THEN (1::BIGINT << bit::INT) ELSE 0 END) AS simhash
  FROM votes GROUP BY id
),
band AS (
  SELECT id, simhash, band, (simhash >> (16 * band)::INT) & 65535 AS key
  FROM sims CROSS JOIN (SELECT unnest(range(4)) AS band) bands
),
cand AS (
  SELECT DISTINCT a.id AS i, b.id AS j, a.simhash AS ha, b.simhash AS hb
  FROM band a JOIN band b ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT i, j, bit_count(xor(ha, hb))::INT AS dist
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding cosine near-dup pairs, label-blocked (ANN blocking)."""
    from dgraph_spark.operators.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dups(emb, threshold=0.43, block_col="label")


SQL_dedup_embedding_cosine = """
SELECT a.vec_id AS i, b.vec_id AS j,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.43
"""


def q_dedup_embedding_lsh(spark, sf_dir):
    """Embedding cosine near-dups over the UNBLOCKED corpus via
    hyperplane-LSH candidate generation (4 tables x 8 bits) + exact
    verification — the all-pairs-free scale path. Hyperplanes are
    deterministic (dedup.lsh_planes), so the DuckDB oracle reproduces
    the exact buckets, candidates and verified pairs (threshold 0.43
    matches the blocked-cosine entry's near-dup regime in this data)."""
    from dgraph_spark.operators.dedup import embedding_near_dups_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dups_lsh(emb, threshold=0.43, dim=64)


def _sql_dedup_embedding_lsh() -> str:
    """DuckDB twin of embedding_near_dups_lsh(threshold=0.9): identical
    hyperplane literals (shared lsh_planes(64, 4, 8)), bucket = packed
    sign bits + table tag, candidates = any shared bucket, verified
    cosine >= 0.43."""
    from dgraph_spark.operators.dedup import lsh_planes

    planes = lsh_planes(64, 4, 8)
    buckets = []
    for t in range(4):
        bits = " + ".join(
            f"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), "
            f"[{', '.join(repr(x) for x in planes[t][i])}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(8)
        )
        buckets.append(f"SELECT vec_id AS id, ({bits}) + {t << 8} AS bkt "
                       f"FROM embeddings")
    banded = " UNION ALL ".join(buckets)
    return f"""
WITH banded AS ({banded}),
cand AS (
  SELECT DISTINCT a.id AS i, b.id AS j
  FROM banded a JOIN banded b ON a.bkt = b.bkt AND a.id < b.id
)
SELECT i, j, round(list_cosine_similarity(x.embedding, y.embedding), 4) AS cos
FROM cand JOIN embeddings x ON x.vec_id = cand.i
          JOIN embeddings y ON y.vec_id = cand.j
WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.43
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: PPJoin pairs -> transitive closure ->
    canonical representative per cluster (operators/dedup.py
    near_dup_clusters); the keep flag is what a corpus-dedup pipeline
    filters on."""
    from dgraph_spark.operators.dedup import near_dup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return near_dup_clusters(docs, threshold=0.7)


def _sql_dedup_clusters() -> str:
    """DuckDB twin: quadratic exact jaccard pairs + recursive-CTE
    transitive closure, cluster = min reachable id."""
    return """
WITH RECURSIVE sh AS (
  SELECT doc_id AS id, (SELECT list_distinct(list_transform(
    range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))
    FROM (SELECT list_filter(string_split_regex(lower(text),
      '[^a-z0-9]+'), x -> x != '') AS ws)) AS g
  FROM documents
  WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x != '')) >= 2
),
pairs AS (
  SELECT a.id AS i, b.id AS j
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE len(list_intersect(a.g, b.g))::DOUBLE
        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.7
),
sym AS (SELECT i AS a, j AS b FROM pairs
        UNION ALL SELECT j, i FROM pairs),
rec AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM rec r JOIN sym s ON r.b = s.a
)
SELECT id, cluster, id = cluster AS keep FROM (
  SELECT a AS id, least(a, min(b)) AS cluster FROM rec GROUP BY a)
"""


def q_text_stats(spark, sf_dir):
    """Per-document text analysis: token count, rule-based language ID,
    quality score, md5 fingerprint (formulas are the spec)."""
    from dgraph_spark.operators.textstats import text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_stats(docs)


def _text_stats_sql() -> str:
    from dgraph_spark.operators.textstats import LANG_MARKERS

    vote_exprs = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        vote_exprs.append(
            f"len(list_filter(toks, x -> list_contains([{lst}], x))) AS v_{lang}"
        )
    langs = list(LANG_MARKERS)
    m = "greatest(" + ", ".join(f"v_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + m + " = 0 THEN 'und' "
    for lang in langs[:-1]:
        case += f"WHEN v_{lang} = {m} THEN '{lang}' "
    case += f"ELSE '{langs[-1]}' END"
    return f"""
WITH base AS (
  SELECT doc_id,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS toks
  FROM documents
), votes AS (
  SELECT doc_id, s, toks, {", ".join(vote_exprs)} FROM base
)
SELECT doc_id,
       len(toks) AS n_tokens,
       {case} AS lang_pred,
       round(0.4 * (length(regexp_replace(s, '[^a-z]', '', 'g'))::DOUBLE
                    / greatest(length(s), 1))
             + 0.3 * least(len(toks) / 64.0, 1.0)
             + 0.3 * (len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1)), 4)
         AS quality,
       md5(s) AS fp
FROM votes
"""


def q_similar_to_dql(spark, sf_dir):
    """similar_to() as a DQL root function — distance-ordered k-NN."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    vec = "[" + ", ".join(f"{float(x):.6f}" for x in qvec) + "]"
    return _flat(spark, sf_dir, f'''
    {{ q(func: similar_to(embedding, 10, {vec})) {{ label }} }}''')


SQL_similar_to_dql = """
SELECT label FROM embeddings
ORDER BY list_distance(embedding,
  (SELECT embedding FROM embeddings WHERE vec_id = 0)) ASC, vec_id ASC
LIMIT 10
"""


def q_similar_to_uid(spark, sf_dir):
    """similar_to(pred, k, "0xuid") — the query vector is another NODE's
    vector (worker/task.go:2211 interpretVFloatOrUid; hnsw SearchWithUid).
    The query node itself ranks first at distance 0 (index.AcceptAll)."""
    from dgraph_spark.sources.tpch_graph import uid_of

    return _flat(spark, sf_dir, f'''
    {{ q(func: similar_to(embedding, 10, "{hex(uid_of("embeddings", 7))}")) {{ label }} }}''')


SQL_similar_to_uid = """
SELECT label FROM embeddings
ORDER BY list_distance(embedding,
  (SELECT embedding FROM embeddings WHERE vec_id = 7)) ASC, vec_id ASC
LIMIT 10
"""


def q_chain_region_revenue(spark, sf_dir):
    """3-level traversal chain (region -> nations -> customers -> orders),
    the join-heavy TPC-H Q5 shape."""
    return _flat(spark, sf_dir, '''
    { q(func: eq(r_name, "ASIA")) {
        ~in_region {
          n_name
          ~in_nation @filter(type(Customer)) {
            c_name
            placed { o_totalprice }
          }
        }
    } }''')


SQL_chain_region_revenue = """
SELECT n_name, c_name, o_totalprice
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
WHERE r_name = 'ASIA'
"""


def q_order_by_val(spark, sf_dir):
    """orderdesc: val(v) — sort by computed variable
    (query/query.go:2697 sortAndPaginateUsingVar)."""
    df = _flat(spark, sf_dir, '''
    {
      var(func: type(Customer)) { placed { t as o_totalprice } s as sum(val(t)) }
      q(func: uid(s), orderdesc: val(s), first: 10) { c_name total: val(s) }
    }''', block="q")
    return _round(df, {"total": 2})


SQL_order_by_val = """
SELECT c_name, round(SUM(o_totalprice), 2) AS total
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY SUM(o_totalprice) DESC, c_custkey LIMIT 10
"""


def q_facet_output(spark, sf_dir):
    """@facets(alias: key) edge-facet projection (SURVEY §2.3 facets)."""
    return _flat(spark, sf_dir, '''
    { q(func: eq(s_name, "Supplier#000000001")) {
        lines: ~by_supplier @facets(fq: qty, fp: price) { l_linenumber }
    } }''')


SQL_facet_output = """
SELECT l_linenumber, l_quantity AS fq, l_extendedprice AS fp
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_name = 'Supplier#000000001'
"""


def q_connected_components(spark, sf_dir):
    """Connected components (label propagation) over the geography
    subgraph — components == regions, giving an exact SQL oracle."""
    from dgraph_spark.operators.graph_algos import connected_components

    g = _g(spark, sf_dir)
    return connected_components(g, ["in_nation", "in_region"])


SQL_connected_components = """
SELECT (3::BIGINT << 40) + c_custkey AS node,
       (1::BIGINT << 40) + n_regionkey AS component
FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION ALL
SELECT (4::BIGINT << 40) + s_suppkey, (1::BIGINT << 40) + n_regionkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
UNION ALL
SELECT (2::BIGINT << 40) + n_nationkey, (1::BIGINT << 40) + n_regionkey FROM nation
UNION ALL
SELECT (1::BIGINT << 40) + r_regionkey, (1::BIGINT << 40) + r_regionkey FROM region
"""


def q_pagerank(spark, sf_dir):
    """PageRank over order placement edges (GraphX-style analytics verb).
    Dangling mass is redistributed uniformly, so ranks sum to 1 and the
    unrolled power-iteration SQL below is an exact DuckDB twin: the
    contribution sum has one term per order (in-degree 1) and every
    other operation mirrors bit-for-bit."""
    from dgraph_spark.operators.graph_algos import pagerank

    g = _g(spark, sf_dir)
    return pagerank(g, ["placed"], max_iter=5)


def _sql_pagerank(iters: int = 5, alpha: float = 0.15) -> str:
    """Unrolled power iteration matching graph_algos.pagerank exactly
    (same arithmetic shape -> same IEEE-754 doubles)."""
    base = f"""
WITH edges AS (
  SELECT (3::BIGINT << 40) + o_custkey AS src,
         (6::BIGINT << 40) + o_orderkey AS dst
  FROM orders
),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
nn AS (SELECT COUNT(*)::BIGINT AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
c{k} AS (SELECT e.dst AS node, SUM(r.rank / dg.d) AS c
         FROM edges e JOIN r{k-1} r ON e.src = r.node
         JOIN deg dg ON dg.src = e.src GROUP BY e.dst),
d{k} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS dm FROM r{k-1} r
         LEFT JOIN deg dg ON dg.src = r.node WHERE dg.src IS NULL),
r{k} AS (SELECT n.node,
                {alpha}::DOUBLE / (SELECT n FROM nn)
                + (1 - {alpha}::DOUBLE)
                  * (COALESCE(c.c, 0.0)
                     + (SELECT dm FROM d{k}) / (SELECT n FROM nn)::DOUBLE)
                  AS rank
         FROM nodes n LEFT JOIN c{k} c ON c.node = n.node)""")
    return base + "".join(steps) + f"\nSELECT node, rank FROM r{iters}"


def q_anyoftext(spark, sf_dir):
    """anyoftext — fulltext analyzer (stopwords + stemming) on both
    sides (tok/tok.go:558-575)."""
    return _flat(spark, sf_dir, '''
    { q(func: anyoftext(text@., "tables joins")) { src: source n_chars } }''')


def _sql_anyoftext() -> str:
    from dgraph_spark.functions.tokenizers import (_query_text_tokens,
                                                   sql_fulltext_tokens)

    qtoks = ", ".join(
        f"'{t}'" for t in _query_text_tokens("tables joins", "en"))
    return f"""
SELECT source AS src, n_chars FROM documents
WHERE list_has_any({sql_fulltext_tokens("en", "text")}, [{qtoks}])
"""


def q_alloftext(spark, sf_dir):
    """alloftext — fulltext analyzer, ALL query terms must match
    (tok/tok.go:558-575)."""
    return _flat(spark, sf_dir, '''
    { q(func: alloftext(text@., "tables joins")) { src: source n_chars } }''')


def _sql_alloftext() -> str:
    from dgraph_spark.functions.tokenizers import (_query_text_tokens,
                                                   sql_fulltext_tokens)

    qtoks = ", ".join(
        f"'{t}'" for t in _query_text_tokens("tables joins", "en"))
    return f"""
SELECT source AS src, n_chars FROM documents
WHERE list_has_all({sql_fulltext_tokens("en", "text")}, [{qtoks}])
"""


def _q_anyoftext_lang(lang: str, query: str):
    def q(spark, sf_dir):
        return _flat(spark, sf_dir, f'''
        {{ q(func: anyoftext(text@{lang}, "{query}")) {{ src: source n_chars }} }}''')
    q.__doc__ = (f"anyoftext with the {lang} analyzer — lang-tag routing to "
                 "per-language stopwords+stemmer (tok/stemmers.go).")
    return q


def _sql_anyoftext_lang(lang: str, query: str) -> str:
    from dgraph_spark.functions.tokenizers import sql_fulltext_match

    return (f"SELECT source AS src, n_chars FROM documents\n"
            f"WHERE lang = '{lang}' AND {sql_fulltext_match(lang, query)}")


def _q_stem_tokens(lang: str):
    """Light-stemmer surface check over REAL text: stem every document's
    tokens with the `lang` analyzer (tok/stemmers.go stemmer_{lang}_light)
    and emit them space-joined — value-hashed against the DuckDB twin.
    Exists for it/pt, whose lang has no tagged documents in the test
    corpus (an anyoftext entry would compare empty sets)."""
    def q(spark, sf_dir):
        from dgraph_spark.functions.tokenizers import fulltext_tokens

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        toks = fulltext_tokens(F.col("text"), lang)
        return docs.select(F.col("source").alias("src"),
                           F.array_join(toks, " ").alias("stems"))
    q.__doc__ = f"{lang} light-stemmer token stream over documents.text."
    return q


def _sql_stem_tokens(lang: str) -> str:
    from dgraph_spark.functions.tokenizers import sql_fulltext_tokens

    return (f"SELECT source AS src, "
            f"array_to_string({sql_fulltext_tokens(lang, 'text')}, ' ') "
            f"AS stems FROM documents")


_CYR = ("abcdefghijklmnopqrstuvwxyz", "абвгдежзиклмнопрстуфхцчшщы")


def q_stem_tokens_ru(spark, sf_dir):
    """Russian snowball stemmer over a deterministic cyrillic
    transliteration of documents.text (the corpus has no ru-tagged
    documents; a latin-only column would leave RV empty and stem
    nothing). Same translate() on both engines."""
    from dgraph_spark.functions.tokenizers import fulltext_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cyr = F.translate(F.col("text"), _CYR[0], _CYR[1])
    return docs.select(F.col("source").alias("src"),
                       F.array_join(fulltext_tokens(cyr, "ru"), " ")
                       .alias("stems"))


# a-z -> target-script letters (1:1 translate on BOTH engines) so the
# dedicated-stemmer languages get exercised on the latin test corpus;
# the vowel slots map to the chars the suffix rules key on (matras for
# hi, ە/ێ for ckb, ا/ة for ar) so strips actually fire.
_TRANSLIT = {
    "ar": ("abcdefghijklmnopqrstuvwxyz", "ابثدةفجهيذكلمنظحقرستعغوخصز"),
    "ckb": ("abcdefghijklmnopqrstuvwxyz", "ابچدەفگهیژکلمنۆپقرستێڤعخغز"),
    "hi": ("abcdefghijklmnopqrstuvwxyz", "ाबचदेफगहिजकलमनोपटरसतुवधखयश"),
}


def _q_stem_tokens_translit(lang: str):
    def q(spark, sf_dir):
        from dgraph_spark.functions.tokenizers import fulltext_tokens

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        src, dst = _TRANSLIT[lang]
        t = F.translate(F.col("text"), src, dst)
        return docs.select(F.col("source").alias("src"),
                           F.array_join(fulltext_tokens(t, lang), " ")
                           .alias("stems"))
    q.__doc__ = (f"{lang} dedicated-stemmer token stream "
                 f"(tok/stemmers.go stemmer_{lang}) over transliterated "
                 f"documents.text.")
    return q


def _sql_stem_tokens_translit(lang: str) -> str:
    from dgraph_spark.functions.tokenizers import sql_fulltext_tokens

    src, dst = _TRANSLIT[lang]
    expr = f"translate(text, '{src}', '{dst}')"
    return (f"SELECT source AS src, "
            f"array_to_string({sql_fulltext_tokens(lang, expr)}, ' ') "
            f"AS stems FROM documents")


def _sql_stem_tokens_ru() -> str:
    from dgraph_spark.functions.tokenizers import sql_fulltext_tokens

    cyr = f"translate(text, '{_CYR[0]}', '{_CYR[1]}')"
    return (f"SELECT source AS src, "
            f"array_to_string({sql_fulltext_tokens('ru', cyr)}, ' ') "
            f"AS stems FROM documents")


def q_bigfloat_agg(spark, sf_dir):
    """200-bit bigfloat ordering (functions/bigfloat.py, reference
    types/scalar_types.go:27 BigFloatPrecision): nations carry amounts
    with >38 significant digits (beyond float64 AND decimal(38)), built
    so numeric order needs the order-preserving 200-bit sort key. The
    engine sorts via bigfloat_key; the twin constructs the same lexical
    strings arithmetically."""
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nq = nation.select(F.concat(
        F.lit("<0x"), F.lower(F.hex(F.col("n_nationkey") + 1)),
        F.lit('> <amount> "'),
        (F.col("n_nationkey") + 1).cast("string"),
        F.expr("repeat('0', n_nationkey)"),
        F.lit("." + "0" * 25 + '7" .'),
    ).alias("value"))
    g = graph_from_triples(spark, parse_nquads(nq),
                           SchemaRegistry.parse("amount: bigfloat @index(bigfloat) ."))
    ex = Executor(g)
    df = ex.execute_flat(
        '{ q(func: has(amount), orderdesc: amount, first: 5) { amount } }')
    return df.select(F.col("amount").cast("string").alias("amount"))


SQL_bigfloat_agg = """
SELECT CAST(n_nationkey + 1 AS VARCHAR) || repeat('0', n_nationkey)
       || '.' || repeat('0', 25) || '7' AS amount
FROM nation ORDER BY n_nationkey DESC LIMIT 5
"""


def q_ngram_search(spark, sf_dir):
    """ngram containment search (tok/tok.go:447-551)."""
    return _flat(spark, sf_dir, '''
    { q(func: ngram(p_name, "ring")) { p_name } }''')


SQL_ngram_search = """
SELECT p_name FROM part
WHERE length(p_name) >= 3 AND list_has_all(
  list_transform(range(1, greatest(length(lower(p_name)) - 1, 1)),
                 i -> substr(lower(p_name), i::INT, 3)),
  ['rin', 'ing'])
"""


def q_stream_sliding(spark, sf_dir):
    """Sliding-window aggregation (streaming extension)."""
    from dgraph_spark.sources.events import read_events
    from dgraph_spark.streaming.windows import sliding_agg

    ev = read_events(spark, sf_dir)
    return sliding_agg(ev, "1 hour", "30 minutes", keys=["event_type"]).select(
        "ws", "we", "event_type", "cnt"
    )


SQL_stream_sliding = """
SELECT ws, ws + INTERVAL 1 HOUR AS we, event_type, COUNT(*) AS cnt
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL '30 minutes') AS ws,
         event_type, ts
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
)
WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR
GROUP BY ws, event_type
"""


def q_stream_session(spark, sf_dir):
    """Session-window aggregation (gap close, stateful streaming op)."""
    from dgraph_spark.sources.events import read_events
    from dgraph_spark.streaming.windows import session_agg

    ev = read_events(spark, sf_dir)
    return session_agg(ev, gap="10 minutes", keys=["user_id"]).select(
        "ws", "we", "user_id", "cnt"
    )


SQL_stream_session = """
WITH brk AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS b
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(b) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS sid
  FROM brk
)
SELECT min(ts) AS ws, max(ts) + INTERVAL 10 MINUTE AS we,
       user_id, COUNT(*) AS cnt
FROM sess GROUP BY user_id, sid
"""


def q_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 semantics through the graph model: revenue per ASIA
    nation from orders whose line items were shipped by a supplier in
    the customer's own nation — the correlated same-nation condition is
    a join of the two in_nation edge paths on the nation uid."""
    g = _g(spark, sf_dir)
    asia = (
        g.wide["Region"].where(F.col("r_name") == "ASIA").select(SUBJECT)
    )
    nations = (
        g.edge("in_region")
        .join(asia.withColumnRenamed(SUBJECT, "object"), "object", "left_semi")
        .select(F.col(SUBJECT).alias("nation"))
    )
    cust_nation = g.edge("in_nation").join(
        g.wide["Customer"].select(SUBJECT), SUBJECT, "left_semi"
    ).select(F.col(SUBJECT).alias("cust"), F.col("object").alias("nation"))
    supp_nation = g.edge("in_nation").join(
        g.wide["Supplier"].select(SUBJECT), SUBJECT, "left_semi"
    ).select(F.col(SUBJECT).alias("supp"), F.col("object").alias("nation"))
    orders = (
        g.wide["Order"]
        .where(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1994-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-01-01")))
        )
        .select(F.col(SUBJECT).alias("order"))
    )
    placed = g.edge("placed").select(F.col(SUBJECT).alias("cust"), F.col("object").alias("order"))
    line = g.edge("line").select(
        F.col(SUBJECT).alias("order"), F.col("object").alias("li"),
        F.col("l_extendedprice"), F.col("l_discount"),
    )
    by_supp = g.edge("by_supplier").select(F.col(SUBJECT).alias("li"), F.col("object").alias("supp"))
    n_name = g.scalar("n_name").select(F.col(SUBJECT).alias("nation"), F.col("value").alias("n_name"))
    rev = (
        cust_nation.join(F.broadcast(nations), "nation")
        .join(placed, "cust")
        .join(orders, "order", "left_semi")
        .join(line, "order")
        .join(by_supp, "li")
        # the same-nation condition rides the join KEY (supp, nation):
        # one composite-key hash join instead of join + post-filter — no
        # carried s_nation column, smaller build side, same semantics
        .join(supp_nation, ["supp", "nation"])
        .join(F.broadcast(n_name), "nation")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return rev


SQL_q5_local_supplier = """
SELECT n_name, round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


def q_groupby_uid_pred(spark, sf_dir):
    """@groupby on a uid predicate (group customers by nation edge)."""
    return _flat(spark, sf_dir, '''
    { g(func: type(Customer)) @groupby(in_nation) { cnt: count(uid) } }''')


SQL_groupby_uid_pred = """
SELECT (2::BIGINT << 40) + c_nationkey AS in_nation, COUNT(*) AS cnt
FROM customer GROUP BY 1
"""


def q_eq_val_var(spark, sf_dir):
    """eq(pred, val(v)) with a LARGE value variable (~2.4k distinct at
    sf0.01, ~24k at sf0.1): prices of max-quantity lineitems matched
    against min-quantity lineitems. Executes as a semi-join against the
    var's value relation — no driver-side literal list
    (query/query.go:1878 replaceVarInFunc)."""
    return _flat(spark, sf_dir, '''
    { var(func: type(Lineitem)) @filter(ge(l_quantity, 49)) { px as l_extendedprice }
      q(func: eq(l_extendedprice, val(px))) @filter(le(l_quantity, 2)) {
        l_extendedprice l_quantity
    } }''')


SQL_eq_val_var = """
SELECT l_extendedprice, l_quantity FROM lineitem
WHERE l_quantity <= 2
  AND l_extendedprice IN (SELECT l_extendedprice FROM lineitem WHERE l_quantity >= 49)
"""


def entry_flagship(spark) -> DataFrame:
    """Driver smoke entry: flagship traversal on sf0.001."""
    return q_root_eq_reverse_traversal(spark, "/root/testdata/sf0.001")


# -------------------------------------------------------------- registry
def q_geo_within(spark, sf_dir):
    """within(point, polygon) — stored POINT inside a constant query
    rectangle (types/geofilter.go:27,173). Oracle twin: plain coordinate
    bounds (bounds chosen off the data grid so ray-cast boundary ties
    cannot occur)."""
    from dgraph_spark.functions.geo import within

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    x = F.col("c_acctbal") / 1000.0
    y = (F.col("c_custkey") % 100) / 10.0 - 4.95
    s = lambda c: c.cast("string")  # noqa: E731
    pt = F.concat(F.lit('{"type":"Point","coordinates":['),
                  s(x), F.lit(","), s(y), F.lit("]}"))
    rect = ('{"type":"Polygon","coordinates":[[[-2.0005,-3.003],'
            '[2.0005,-3.003],[2.0005,3.003],[-2.0005,3.003],'
            '[-2.0005,-3.003]]]}')
    return (cust.withColumn("_g", pt)
            .where(within(F.col("_g"), rect))
            .select("c_name"))


SQL_geo_within = """
SELECT c_name FROM customer
WHERE c_acctbal/1000.0 BETWEEN -2.0005 AND 2.0005
  AND (c_custkey % 100)/10.0 - 4.95 BETWEEN -3.003 AND 3.003
"""


def q_geo_contains(spark, sf_dir):
    """contains(polygon, point) — stored POLYGON containing a constant
    query point (types/geofilter.go:29,182). Query point is off the
    1e-5 coordinate grid, so no boundary ties."""
    from dgraph_spark.functions.geo import geo_contains

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    x = F.col("c_acctbal") / 1000.0
    y = (F.col("c_custkey") % 100) / 10.0 - 4.95
    s = lambda c: c.cast("string")  # noqa: E731
    rect = F.concat(
        F.lit('{"type":"Polygon","coordinates":[[['),
        s(x - 0.3), F.lit(","), s(y - 3), F.lit("],["),
        s(x + 0.3), F.lit(","), s(y - 3), F.lit("],["),
        s(x + 0.3), F.lit(","), s(y + 3), F.lit("],["),
        s(x - 0.3), F.lit(","), s(y + 3), F.lit("],["),
        s(x - 0.3), F.lit(","), s(y - 3), F.lit("]]]}"),
    )
    return (cust.withColumn("_g", rect)
            .where(geo_contains(F.col("_g"),
                                '{"type":"Point","coordinates":[0.0400007,0.0300003]}'))
            .select("c_name"))


SQL_geo_contains = """
SELECT c_name FROM customer
WHERE 0.0400007 BETWEEN c_acctbal/1000.0 - 0.3 AND c_acctbal/1000.0 + 0.3
  AND 0.0300003 BETWEEN (c_custkey % 100)/10.0 - 4.95 - 3
                    AND (c_custkey % 100)/10.0 - 4.95 + 3
"""


def q_after_uid(spark, sf_dir):
    """`after: uid` cursor pagination at root (query/query.go applyWindow
    — uids ascend, resume strictly after the cursor)."""
    u = uid_of("customer", 100)
    return _flat(spark, sf_dir, f'''
    {{ q(func: type(Customer), first: 5, after: {u}) {{ c_name }} }}''')


SQL_after_uid = """
SELECT c_name FROM customer WHERE c_custkey > 100
ORDER BY c_custkey LIMIT 5
"""


def q_facet_order(spark, sf_dir):
    """@facets(orderasc: f) — children sorted by an edge facet
    (query/query.go facet sort; SURVEY §2.7). price facets are unique
    within the supplier, so the order (and row set under first:) is
    deterministic."""
    return _flat(spark, sf_dir, '''
    { q(func: eq(s_name, "Supplier#000000001")) {
        lines: ~by_supplier @facets(orderasc: price) (first: 5) {
          l_linenumber
        }
    } }''')


SQL_facet_order = """
SELECT l_linenumber FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
WHERE s_name = 'Supplier#000000001'
ORDER BY l_extendedprice LIMIT 5
"""


def q_len_filter(spark, sf_dir):
    """eq/ineq(len(v), n) — variable-cardinality condition
    (query/query.go:2235): true keeps every candidate."""
    return _flat(spark, sf_dir, '''
    { var(func: eq(n_name, "NATION_1")) { v as ~in_nation @filter(type(Customer)) }
      q(func: type(Region)) @filter(lt(len(v), 1000000)) { r_name } }''', block="q")


SQL_len_filter = """
SELECT r_name FROM region
WHERE (SELECT count(*) FROM customer JOIN nation ON c_nationkey = n_nationkey
       WHERE n_name = 'NATION_1') < 1000000
"""


def q_len_filter_combinator(spark, sf_dir):
    """len(v) leaves inside an AND/OR/NOT filter tree — the reference
    evaluates len() as a constant boolean leaf of the combinator walk
    (dql/parser.go:179 validFuncName len; query/query.go:2235-2252
    eq(len(v), n) path), so it must compose with value filters in the
    same tree, not just stand alone (the existing len_filter entry)."""
    return _flat(spark, sf_dir, '''
    { var(func: eq(n_name, "NATION_1")) {
        v as ~in_nation @filter(type(Customer)) }
      var(func: eq(n_name, "NATION_2")) {
        w as ~in_nation @filter(type(Customer)) }
      q(func: type(Region)) @filter(
          (gt(len(v), 0) AND eq(r_name, "ASIA"))
          OR (NOT lt(len(w), 1000000) AND eq(r_name, "EUROPE"))) {
        r_name } }''', block="q")


SQL_len_filter_combinator = """
SELECT r_name FROM region
WHERE ((SELECT count(*) FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name = 'NATION_1') > 0 AND r_name = 'ASIA')
   OR (NOT ((SELECT count(*) FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             WHERE n_name = 'NATION_2') < 1000000)
       AND r_name = 'EUROPE')
"""


def q_facet_var_order(spark, sf_dir):
    """@facets(w as f) facet VARIABLE bound by edge target, consumed for
    ordering + output in a later block (query/query.go:1550
    populateUidValVar facet case)."""
    df = _flat(spark, sf_dir, '''
    { var(func: eq(s_name, "Supplier#000000001")) {
        ~by_supplier @facets(w as price)
      }
      q(func: uid(w), orderdesc: val(w), first: 10) {
        l_linenumber wprice: val(w)
      } }''', block="q")
    return _round(df, {"wprice": 2})


SQL_facet_var_order = """
SELECT l_linenumber, round(l_extendedprice, 2) AS wprice
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_name = 'Supplier#000000001'
ORDER BY l_extendedprice DESC LIMIT 10
"""




def q_ignorereflex(spark, sf_dir):
    """@ignorereflex — removes nodes already on their own path
    (query/query.go:2471 removeReflexive). customer -> in_nation ->
    ~in_nation returns every customer of that nation INCLUDING the
    origin; @ignorereflex drops exactly the origin, keeping the rest."""
    c1 = uid_of("customer", 1)
    return _flat(spark, sf_dir, f'''
    {{ q(func: uid({c1})) @ignorereflex {{
        c_name
        in_nation {{ n_name peers: ~in_nation @filter(type(Customer)) {{ pc: c_name }} }}
    }} }}''')


SQL_ignorereflex = """
SELECT c.c_name, n_name, p.c_name AS pc
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN customer p ON p.c_nationkey = n.n_nationkey
WHERE c.c_custkey = 1 AND p.c_custkey <> 1
"""


def q_anyof_custom(spark, sf_dir):
    """anyof(pred, tokenizer, q) — custom-plugin tokenizer surface
    (tok/tok.go:134-151 LoadCustomTokenizer; worker/task.go:269-270).
    The plugin here splits supplier names on '#'."""
    from dgraph_spark.functions.tokenizers import register_tokenizer

    register_tokenizer("hashsplit", lambda col: F.split(col, "#"))
    return _flat(spark, sf_dir, '''
    { q(func: anyof(s_name, "hashsplit", "000000012 000000034")) { s_name } }''')


SQL_anyof_custom = """
SELECT s_name FROM supplier
WHERE list_contains(string_split(s_name, '#'), '000000012')
   OR list_contains(string_split(s_name, '#'), '000000034')
"""


def q_mutation_roundtrip(spark, sf_dir):
    """set + delete mutation document -> query the mutated graph
    (edgraph/server.go:575 doMutate; dql/mutation.go). Inserts a new
    Customer node, overwrites one account balance (posting Ovr), wipes
    one customer's comment (S P * delete) — all visible to the query."""
    from dgraph_spark.mutations import mutate

    g = _g(spark, sf_dir)
    c3, c7 = uid_of("customer", 3), uid_of("customer", 7)
    g2 = mutate(g, f'''{{
      set {{
        <0x7f000000000001> <c_name> "Customer#MUTATED1" .
        <0x7f000000000001> <c_acctbal> "99999.99"^^<float> .
        <0x7f000000000001> <dgraph.type> "Customer" .
        <{hex(c3)}> <c_acctbal> "88888.88"^^<float> .
      }}
      delete {{
        <{hex(c7)}> <c_mktsegment> * .
      }}
    }}''')
    return Executor(g2).execute_flat('''
    { q(func: type(Customer)) @filter(ge(c_acctbal, 88888) OR NOT has(c_mktsegment)) {
        c_name c_acctbal
    } }''')


SQL_mutation_roundtrip = """
WITH mutated AS (
  SELECT c_name,
         CASE WHEN c_custkey = 3 THEN 88888.88 ELSE c_acctbal END AS bal,
         CASE WHEN c_custkey = 7 THEN NULL ELSE c_mktsegment END AS com
  FROM customer
  UNION ALL
  SELECT 'Customer#MUTATED1', 99999.99, NULL
)
SELECT c_name, bal AS c_acctbal FROM mutated
WHERE bal >= 88888 OR com IS NULL
"""


def q_json_mutation_roundtrip(spark, sf_dir):
    """SetJson mutation document -> query (chunker/json_parser.go
    mapToNquads; api.Mutation.SetJson): a nested doc adds one supplier
    node with an in_nation edge carrying a facet; the query reads the
    mutated graph through the same traversal path as loaded data."""
    from dgraph_spark.mutations import set_json

    g = _g(spark, sf_dir)
    g2 = set_json(g, {
        "uid": "_:s", "s_name": "Supplier#JSON1", "s_acctbal": 4242.5,
        "dgraph.type": "Supplier",
        "in_nation": {"uid": hex(uid_of("nation", 3)),
                      "in_nation|since": 2024},
    })
    return Executor(g2).execute_flat('''
    { q(func: eq(n_name, "NATION_3")) {
        sups: ~in_nation @filter(ge(s_acctbal, 4242)) { s_name s_acctbal }
    } }''').select("s_name", "s_acctbal")


SQL_json_mutation_roundtrip = """
SELECT s_name, s_acctbal FROM (
  SELECT s.s_name, s.s_acctbal, s.s_nationkey FROM supplier s
  UNION ALL SELECT 'Supplier#JSON1', 4242.5, 3
) s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3' AND s.s_acctbal >= 4242
"""


def q_export_roundtrip(spark, sf_dir):
    """export RDF -> re-parse -> per-predicate counts (worker/export.go
    + chunker/rdf_parser.go round trip). A lossless bijection check:
    every exported N-Quad line parses back to exactly one triple."""
    from dgraph_spark.sources.rdf import export_rdf, parse_nquads

    g = _g(spark, sf_dir)
    sub = Graph(spark=spark,
                preds={k: g.preds[k] for k in ("n_name", "r_name", "in_region")},
                schema=g.schema)
    lines = export_rdf(sub).withColumnRenamed("line", "value")
    return (parse_nquads(lines)
            .groupBy("predicate").agg(F.count("*").alias("n"))
            .orderBy("predicate"))


SQL_export_roundtrip = """
SELECT * FROM (
  SELECT 'in_region' AS predicate, count(*) AS n FROM nation
  UNION ALL SELECT 'n_name', count(*) FROM nation
  UNION ALL SELECT 'r_name', count(*) FROM region
) ORDER BY predicate
"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal pipeline with a REAL decode kernel: each document
    becomes a genuine P6 PPM (solid color keyed to doc_id), and the
    pure-numpy decoder (operators/multimodal.py decode_ppm) must parse
    the header and de-interleave RGB to recover the channel means —
    which have closed-form SQL twins."""
    from dgraph_spark.operators.multimodal import (
        extract_image_features, media_table_from_docs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = media_table_from_docs(docs)
    return extract_image_features(media).select(
        "media_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"))


SQL_multimodal_features = """
SELECT doc_id AS media_id,
       32 AS width,
       (n_chars % 97) + 1 AS height,
       round((doc_id % 256)::DOUBLE, 6) AS mean_r,
       round((doc_id * 7 % 256)::DOUBLE, 6) AS mean_g,
       round((doc_id * 13 % 256)::DOUBLE, 6) AS mean_b
FROM documents
"""


def q_multimodal_audio(spark, sf_dir):
    """Audio pipeline with a REAL decode kernel: each document becomes
    a genuine PCM16 WAV (square wave keyed to doc_id), and the
    pure-numpy RIFF parser (operators/multimodal.py decode_wav) must
    recover the sample rate, count, and RMS — closed-form SQL twins."""
    from dgraph_spark.operators.multimodal import (audio_table_from_docs,
                                                   extract_audio_features)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = audio_table_from_docs(docs)
    return extract_audio_features(media).select(
        "media_id", "sample_rate", "channels", "n_samples",
        F.round("rms", 6).alias("rms"))


SQL_multimodal_audio = """
SELECT doc_id AS media_id,
       8000 AS sample_rate,
       1 AS channels,
       ((n_chars % 50) + 1) * 16 AS n_samples,
       round((doc_id % 1000)::DOUBLE, 6) AS rms
FROM documents
"""


def q_multimodal_flac(spark, sf_dir):
    """Lossless-compressed-audio pipeline with a REAL in-container
    decoder (operators/flaccodec.py: STREAMINFO walk, frame-header
    CRC-8, FIXED-prediction subframes, rice residual decode, frame
    CRC-16): each document becomes a native FLAC stream of the same
    square wave as the WAV entry — lossless, so the closed-form RMS
    oracle is shared verbatim."""
    from dgraph_spark.operators.multimodal import (extract_audio_features,
                                                   flac_table_from_docs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = flac_table_from_docs(docs)
    return extract_audio_features(media).select(
        "media_id", "sample_rate", "channels", "n_samples",
        F.round("rms", 6).alias("rms"))


SQL_multimodal_flac = SQL_multimodal_audio


def q_multimodal_frames(spark, sf_dir):
    """Frame-sampling stub over the binary column: one pseudo-frame per
    1 KiB chunk (operators/multimodal.py:103); per-media frame counts."""
    from dgraph_spark.operators.multimodal import (
        media_table_from_docs, sample_frames)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = media_table_from_docs(docs)
    return (sample_frames(media, every_n_bytes=1024)
            .groupBy("media_id").agg(F.count("*").alias("frames")))


SQL_multimodal_frames = """
SELECT doc_id AS media_id,
       ((11 + length(((n_chars % 97) + 1)::VARCHAR)
         + 96 * ((n_chars % 97) + 1)) + 1023) // 1024 AS frames
FROM documents
"""


def q_multimodal_png(spark, sf_dir):
    """Compressed-codec pipeline with a REAL in-container decoder: each
    document becomes a genuine zlib-compressed CRC'd PNG (solid color
    keyed to doc_id), and decode_png (operators/multimodal.py) must
    walk the chunk stream, inflate, and unfilter the scanlines to
    recover the channel means — same closed-form SQL twin as the PPM
    entry, different codec under it."""
    from dgraph_spark.operators.multimodal import (
        extract_image_features, png_table_from_docs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = png_table_from_docs(docs)
    return extract_image_features(media).select(
        "media_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"))


SQL_multimodal_png = SQL_multimodal_features


def q_multimodal_jpeg(spark, sf_dir):
    """Entropy-coded-codec pipeline with a REAL in-container baseline
    JPEG decoder (operators/jpegcodec.py: marker walk, Huffman decode,
    dequantize, IDCT, MCU crop): each document becomes a genuine
    Huffman-coded grayscale JPEG of solid value doc_id % 256. The
    fixture's exact-roundtrip quant table (DC step 8 divides the flat
    block's DC = 8*(v-128) exactly) keeps the SQL twin closed-form;
    grayscale replicates into all three channel means."""
    from dgraph_spark.operators.multimodal import (
        extract_image_features, jpeg_table_from_docs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = jpeg_table_from_docs(docs)
    return extract_image_features(media).select(
        "media_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"))


SQL_multimodal_jpeg = """
SELECT doc_id AS media_id,
       32 AS width,
       (n_chars % 97) + 1 AS height,
       round((doc_id % 256)::DOUBLE, 6) AS mean_r,
       round((doc_id % 256)::DOUBLE, 6) AS mean_g,
       round((doc_id % 256)::DOUBLE, 6) AS mean_b
FROM documents
"""


def q_robots_filter(spark, sf_dir):
    """robots.txt politeness filter (operators/robots.py, RFC 9309):
    per-domain robots with prefix/wildcard/anchor rules are parsed to
    a rules table and urls are judged by broadcast-join + longest-
    match argmax; the fixture picks each document's path from four
    cases whose verdicts are closed-form."""
    from dgraph_spark.operators.robots import robots_filter, robots_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("d"), (F.col("doc_id") % 20).cast("string"))
         .alias("domain"),
        F.element_at(
            F.array(F.lit("/a"), F.lit("/private/x"),
                    F.lit("/private/ok/y"), F.lit("/tmp/z")),
            (F.col("doc_id") % 4 + 1).cast("int")).alias("path"))
    txt = ("User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
           "Disallow: /tmp/*\nAllow: /tmp/keep$\n")
    robots = urls.select("domain").distinct().withColumn(
        "robots_txt", F.lit(txt))
    out = robots_filter(urls, robots_rules(robots))
    return out.select("doc_id", "domain", "path", "allowed")


SQL_robots_filter = """
SELECT doc_id,
       concat('d', (doc_id % 20)::VARCHAR) AS domain,
       CASE doc_id % 4 WHEN 0 THEN '/a' WHEN 1 THEN '/private/x'
            WHEN 2 THEN '/private/ok/y' ELSE '/tmp/z' END AS path,
       CASE doc_id % 4 WHEN 0 THEN true WHEN 1 THEN false
            WHEN 2 THEN true ELSE false END AS allowed
FROM documents
"""


def q_sitemap_urls(spark, sf_dir):
    """Sitemap discovery feed (operators/robots.py parse_sitemap):
    each document becomes a genuine namespaced <urlset> with
    (doc_id % 4 + 1) entries whose loc/lastmod/priority are id-keyed —
    the exploded table is closed-form for the DuckDB twin."""
    from dgraph_spark.operators.robots import sitemap_urls

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def build(batches):
        import pandas as pd
        for pdf in batches:
            out = {"domain": [], "sitemap_xml": [], "doc_id": []}
            for did in pdf["doc_id"]:
                d = int(did)
                urls = "".join(
                    f"<url><loc>http://d{d % 20}.com/p/{d}/{k}</loc>"
                    f"<lastmod>2026-01-{(d + k) % 28 + 1:02d}</lastmod>"
                    f"<priority>0.{k + 1}</priority></url>"
                    for k in range(d % 4 + 1))
                xml = ('<?xml version="1.0"?><urlset xmlns='
                       '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                       f"{urls}</urlset>")
                out["domain"].append(f"d{d % 20}.com")
                out["sitemap_xml"].append(xml)
                out["doc_id"].append(d)
            yield pd.DataFrame(out)

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    maps = docs.select("doc_id").mapInPandas(build, StructType([
        StructField("domain", StringType()),
        StructField("sitemap_xml", StringType()),
        StructField("doc_id", LongType())]))
    parsed = sitemap_urls(maps)
    return parsed.select(
        "domain", "loc", "lastmod", "priority",
        F.col("is_index").cast("boolean").alias("is_index"))


SQL_sitemap_urls = """
SELECT concat('d', (doc_id % 20)::VARCHAR, '.com') AS domain,
       concat('http://d', (doc_id % 20)::VARCHAR, '.com/p/',
              doc_id::VARCHAR, '/', k::VARCHAR) AS loc,
       concat('2026-01-', lpad(((doc_id + k) % 28 + 1)::VARCHAR, 2, '0'))
         AS lastmod,
       concat('0.', (k + 1)::VARCHAR) AS priority,
       false AS is_index
FROM documents, (SELECT unnest(range(4)) AS k)
WHERE k < doc_id % 4 + 1
"""


def q_warc_roundtrip(spark, sf_dir):
    """WARC container round-trip (sources/warc.py): each document is
    framed as a REAL one-record .warc.gz member (header block,
    Content-Length framing, HTTP response wrapper, gzip) and parsed
    back; the parsed status/URI/payload-size are closed-form."""
    from dgraph_spark.sources.warc import build_warc, parse_warc_bytes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(batches):
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "warc_type": [], "target_uri": [],
                   "http_status": [], "n_payload_bytes": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(did)
                blob = build_warc([{
                    "warc_type": "response",
                    "target_uri": f"http://example.com/doc/{d}",
                    "content_type": "text/html",
                    "http_status": 200 + d % 300,
                    "payload": (text or "").encode("utf-8")}])
                (rec,) = parse_warc_bytes(blob)
                out["doc_id"].append(d)
                out["warc_type"].append(rec["warc_type"])
                out["target_uri"].append(rec["target_uri"])
                out["http_status"].append(rec["http_status"])
                out["n_payload_bytes"].append(len(rec["payload"]))
            yield pd.DataFrame(out)

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("http_status", LongType()),
        StructField("n_payload_bytes", LongType())])
    return docs.select("doc_id", "text").mapInPandas(run, schema)


SQL_warc_roundtrip = """
SELECT doc_id,
       'response' AS warc_type,
       concat('http://example.com/doc/', doc_id::VARCHAR) AS target_uri,
       200 + doc_id % 300 AS http_status,
       octet_length(encode(text)) AS n_payload_bytes
FROM documents
"""


def q_url_canonical(spark, sf_dir):
    """URL canonicalization (operators/urls.py, pure codegen
    expressions): dirty URLs are synthesized from doc_id (mixed-case
    scheme/host, default ports, tracking params, unsorted query,
    fragment) and the canonicalizer must produce the closed-form
    canonical string the DuckDB twin writes directly."""
    from dgraph_spark.operators.urls import canonical_url

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP://"))
             .otherwise(F.lit("HTTPS://")),
            F.lit("WWW.Example"), (F.col("doc_id") % 3).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(".COM:80"))
             .otherwise(F.lit(".COM:443")),
            F.lit("/Path"), (F.col("doc_id") % 7).cast("string"),
            F.lit("/page?utm_source=feed&z=26&b="),
            (F.col("doc_id") % 11).cast("string"),
            F.lit("&a=1&utm_medium=x&fbclid=abc#Frag"),
            F.col("doc_id").cast("string")).alias("url"))
    return dirty.select(
        "doc_id", canonical_url("url").alias("url_canon"))


SQL_url_canonical = """
SELECT doc_id,
       concat(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END,
              '://www.example', (doc_id % 3)::VARCHAR, '.com',
              '/Path', (doc_id % 7)::VARCHAR,
              '/page?a=1&b=', (doc_id % 11)::VARCHAR, '&z=26')
         AS url_canon
FROM documents
"""


def q_html_extract(spark, sf_dir):
    """HTML -> text extraction (WET-generation step) with a REAL
    stdlib-parser block model (operators/htmlextract.py): each document
    is wrapped in a genuine HTML page (head with script/style payloads,
    link-only nav/footer chrome, body paragraphs), and the extractor
    must strip the chrome by link density and recover exactly the
    whitespace-collapsed text plus closed-form block/link counts."""
    from dgraph_spark.operators.htmlextract import (html_extract,
                                                    html_table_from_docs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = html_table_from_docs(docs)
    return html_extract(pages).select(
        "doc_id", "text", "n_blocks", "n_links",
        F.round("link_density", 6).alias("link_density"))


SQL_html_extract = """
WITH base AS (
  SELECT doc_id,
         trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) AS collapsed,
         length(regexp_replace(text, '[ \t\n\r]+', '', 'g')) AS nchars,
         4 * (doc_id % 5 + 1) + 5 AS link_chars
  FROM documents
)
SELECT doc_id,
       collapsed AS text,
       CASE WHEN collapsed = '' THEN 0
            ELSE CAST(ceil(array_length(string_split(collapsed, ' '))
                           / 12.0) AS BIGINT) END AS n_blocks,
       doc_id % 5 + 2 AS n_links,
       round(link_chars / (link_chars + nchars)::DOUBLE, 6)
         AS link_density
FROM base
"""


def q_multimodal_video(spark, sf_dir):
    """Video-container pipeline with a REAL ISO-BMFF parser
    (operators/multimodal.py parse_mp4_meta: box-tree walk with 32/
    64-bit sizes, mvhd v0/v1 duration, tkhd 16.16 fixed-point dims):
    each document becomes a container-valid MP4 whose metadata is
    id-keyed and closed-form for the SQL twin. Codec payloads stay
    opaque (frame work plugs pyav into sample_frames)."""
    from dgraph_spark.operators.multimodal import (extract_video_metadata,
                                                   video_table_from_docs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = video_table_from_docs(docs)
    return extract_video_metadata(media).select(
        "media_id", F.round("duration_s", 6).alias("duration_s"),
        "width", "height", "n_tracks")


SQL_multimodal_video = """
SELECT doc_id AS media_id,
       round((n_chars % 600) / 10.0, 6) AS duration_s,
       16 * (doc_id % 90 + 1) AS width,
       16 * (doc_id % 50 + 1) AS height,
       1 AS n_tracks
FROM documents
"""


def q_multimodal_tiff(spark, sf_dir):
    """Strip-layout codec pipeline with a REAL in-container TIFF
    decoder (operators/multimodal.py decode_tiff: IFD walk, PackBits
    decompression, photometric handling): each document becomes a
    genuine PackBits-compressed TIFF with the PPM entry's solid color,
    sharing its closed-form SQL twin."""
    from dgraph_spark.operators.multimodal import (
        extract_image_features, tiff_table_from_docs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = tiff_table_from_docs(docs)
    return extract_image_features(media).select(
        "media_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"))


SQL_multimodal_tiff = SQL_multimodal_features


def q_multimodal_gif(spark, sf_dir):
    """LZW-codec pipeline with a REAL in-container GIF decoder
    (operators/multimodal.py decode_gif: variable-width LSB-first LZW,
    clear/EOI handling, palette lookup, interlace): each document
    becomes a genuine GIF89a checkerboard of two id-keyed palette
    colors; width 32 is even so each channel mean is exactly the
    two-color average — closed-form for the SQL twin."""
    from dgraph_spark.operators.multimodal import (
        extract_image_features, gif_table_from_docs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = gif_table_from_docs(docs)
    return extract_image_features(media).select(
        "media_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"))


SQL_multimodal_gif = """
SELECT doc_id AS media_id,
       32 AS width,
       (n_chars % 97) + 1 AS height,
       round((doc_id % 256 + doc_id * 3 % 256) / 2.0, 6) AS mean_r,
       round((doc_id * 7 % 256 + doc_id * 5 % 256) / 2.0, 6) AS mean_g,
       round((doc_id * 13 % 256 + doc_id * 11 % 256) / 2.0, 6) AS mean_b
FROM documents
"""


def q_cdc_diff(spark, sf_dir):
    """CDC egress payload: the set/del change events between two graph
    snapshots (worker/cdc.go:44-260 txn set/del event lists), here from
    a mutation's before/after states."""
    from dgraph_spark.mutations import mutate
    from dgraph_spark.streaming.cdc import graph_diff

    g = _g(spark, sf_dir)
    c3, c7 = uid_of("customer", 3), uid_of("customer", 7)
    g2 = mutate(g, f'''{{
      set {{
        <0x7f000000000001> <c_name> "Customer#CDC1" .
        <{hex(c3)}> <c_mktsegment> "SEGMENT-X" .
      }}
      delete {{
        <{hex(c7)}> <c_mktsegment> * .
      }}
    }}''')
    keep = ("c_name", "c_mktsegment")
    old = Graph(spark=spark, preds={k: g.preds[k] for k in keep}, schema=g.schema)
    new = Graph(spark=spark, preds={k: g2.preds[k] for k in keep}, schema=g2.schema)
    return graph_diff(old, new).select("op", "subject", "predicate", "value_str")


SQL_cdc_diff = """
SELECT 'set' AS op, (127::BIGINT << 48) + 1 AS subject,
       'c_name' AS predicate, 'Customer#CDC1' AS value_str
UNION ALL
SELECT 'set', (3::BIGINT << 40) + 3, 'c_mktsegment', 'SEGMENT-X'
UNION ALL
SELECT 'del', (3::BIGINT << 40) + 3, 'c_mktsegment', c_mktsegment
FROM customer WHERE c_custkey = 3
UNION ALL
SELECT 'del', (3::BIGINT << 40) + 7, 'c_mktsegment', c_mktsegment
FROM customer WHERE c_custkey = 7
"""


def q_stateful_counts(spark, sf_dir):
    """Stateful running count+sum per key (applyInPandasWithState shape,
    streaming/stateful.py:79). The batch path shares the declared
    semantics; multi-micro-batch state evolution is covered by
    tests/test_stateful_streaming.py."""
    from dgraph_spark.sources.events import read_events
    from dgraph_spark.streaming.stateful import running_counts

    ev = read_events(spark, sf_dir)
    out = running_counts(ev, "event_type", "value")
    return out.withColumn("total_value", F.round("total_value", 2))


SQL_stateful_counts = """
SELECT event_type AS key, COUNT(*) AS total,
       round(SUM(value), 2) AS total_value
FROM events GROUP BY event_type
"""


def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup (applyInPandasWithState shape,
    streaming/stateful.py:47): one output row per first-seen key.
    The batch path shares the declared semantics (first_seen_batch =
    rows seen when the key first appears — the whole relation in one
    batch); multi-micro-batch suppression is covered by
    tests/test_stateful_streaming.py::test_running_dedup_emits_once."""
    from dgraph_spark.sources.events import read_events
    from dgraph_spark.streaming.stateful import running_dedup

    ev = read_events(spark, sf_dir)
    return running_dedup(ev, "user_id")


SQL_stream_dedup = """
SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS first_seen_batch
FROM events GROUP BY user_id
"""


def q_since_math(spark, sf_dir):
    """math(since(t)) — seconds-since-now arithmetic on a datetime value
    var (query/aggregator.go:566-574 since). Day-floored so the Spark
    and DuckDB `now()` (evaluated seconds apart) agree."""
    return _flat(spark, sf_dir, '''
    { q(func: type(Order)) @filter(gt(o_totalprice, 300000)) {
        o_totalprice
        d as o_orderdate
        age_days: math(floor(since(d) / 86400.0))
    } }''')


SQL_since_math = """
SELECT o_totalprice, o_orderdate,
       floor((epoch(now()) - epoch(o_orderdate)) / 86400.0)::BIGINT AS age_days
FROM orders WHERE o_totalprice > 300000
"""


def q_schema_introspect(spark, sf_dir):
    """schema(pred: [...]) {} introspection (worker/schema.go,
    edgraph/server.go Query schema path) as a checkable relation."""
    g = _g(spark, sf_dir)
    rows = Executor(g).execute(
        'schema(pred: [c_name, c_acctbal, in_nation, placed]) {}')["schema"]
    return spark.createDataFrame(
        [(r["predicate"], r["type"], bool(r.get("list", False)),
          bool(r.get("reverse", False))) for r in rows],
        "predicate string, type string, is_list boolean, has_reverse boolean")


SQL_schema_introspect = """
SELECT * FROM (VALUES
  ('c_name', 'string', false, false),
  ('c_acctbal', 'float', false, false),
  ('in_nation', 'uid', false, true),
  ('placed', 'uid', true, true)
) AS t(predicate, type, is_list, has_reverse)
"""


def q_json_load_roundtrip(spark, sf_dir):
    """JSON document loader: rows -> JSON melt -> graph -> DQL query
    (chunker/json_parser.go). Nested region object becomes a uid edge."""
    from dgraph_spark.sources.json_loader import json_to_graph

    docs = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .join(spark.read.parquet(f"{sf_dir}/region.parquet"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_name").alias("name"),
            F.struct(F.col("r_name").alias("rname")).alias("region"),
        )
    )
    g = json_to_graph(spark, docs, type_name="Nation")
    return Executor(g).execute_flat('''
    { q(func: has(name)) { name region { rname } } }''')


SQL_json_load_roundtrip = """
SELECT n_name AS name, r_name AS rname
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_backup_restore(spark, sf_dir):
    """Backup (parquet snapshot) -> restore -> query the restored graph
    (worker/backup*.go, worker/restore_map.go semantics: a full export/
    import cycle preserves every predicate)."""
    import tempfile

    g = _g(spark, sf_dir)
    sub = Graph(spark=spark,
                preds={k: g.preds[k] for k in ("n_name", "r_name", "in_region")},
                schema=g.schema)
    path = tempfile.mkdtemp(prefix="dgs_backup_")
    sub.write_parquet(path)
    restored = Graph.read_parquet(spark, path)
    return Executor(restored).execute_flat('''
    { q(func: has(n_name)) {
        n_name
        in_region { r_name }
    } }''')


SQL_backup_restore = """
SELECT n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_graphql_query(spark, sf_dir):
    """GraphQL facade: queryT(filter, order, first) rewritten to the same
    engine (graphql/rewriter.py; reference graphql/resolve). The JSON
    result rows become the oracle-checked DataFrame."""
    from dgraph_spark.graphql import execute_graphql

    g = _g(spark, sf_dir)
    res = execute_graphql(g, '''
    {
      queryCustomer(filter: {c_acctbal: {gt: 9000}},
                    order: {desc: c_acctbal}, first: 20) {
        c_name
        c_acctbal
      }
    }''')
    rows = res["data"]["queryCustomer"]
    return spark.createDataFrame(
        [(r["c_name"], float(r["c_acctbal"])) for r in rows],
        "c_name string, c_acctbal double")


SQL_graphql_query = """
SELECT c_name, c_acctbal FROM customer WHERE c_acctbal > 9000
ORDER BY c_acctbal DESC, (3::BIGINT << 40) + c_custkey LIMIT 20
"""


def q_chunk_docs(spark, sf_dir):
    """Fixed-size token chunking with overlap (training-data windows):
    one row per (doc, chunk) with token count and text."""
    from dgraph_spark.operators.pipeline_text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs, window=64, overlap=16)


SQL_chunk_docs = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
  FROM documents),
b2 AS (SELECT doc_id, toks, len(toks) AS n FROM base),
b3 AS (SELECT doc_id, toks, n,
       CASE WHEN n <= 64 THEN 1
            ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) + 1 END AS nch
       FROM b2)
SELECT doc_id,
       CAST(s / 48 AS INT) AS chunk_id,
       least(n - s, 64) AS n_tokens,
       array_to_string(toks[s + 1 : s + 64], ' ') AS chunk
FROM b3, UNNEST(range(0, nch * 48, 48)) AS t(s)
"""


def q_scrub_pii(spark, sf_dir):
    """PII redaction (emails/URLs/phone runs -> placeholders) over text
    with synthesized PII appended so every pattern actually fires."""
    from dgraph_spark.operators.pipeline_text import scrub_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    withpii = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 123-4567 via "
              "https://ex.example/a?b=1 now"))
    return docs.select("doc_id", scrub_pii(withpii).alias("scrubbed"))


def _sql_scrub_pii() -> str:
    from dgraph_spark.operators.pipeline_text import PII_PATTERNS

    expr = ("text || ' contact u' || CAST(doc_id AS VARCHAR) || "
            "'@example.com or +1 (555) 123-4567 via "
            "https://ex.example/a?b=1 now'")
    for pat, repl in PII_PATTERNS:
        # duckdb single-quote strings keep backslashes verbatim — only
        # quotes need escaping; the RE2/Java-common patterns pass as-is
        pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"SELECT doc_id, {expr} AS scrubbed FROM documents"


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-source balanced sample (md5-ordered cap=20):
    the training-mix balancing primitive."""
    from dgraph_spark.operators.pipeline_text import sample_stratified

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sample_stratified(docs, stratum_col="source", cap=20)
    return out.select("doc_id", "source")


SQL_sample_stratified = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
         AS rn
  FROM documents) WHERE rn <= 20
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: drop every document sharing a word
    3-gram with the 'benchmark' subset (doc_id % 97 == 0)."""
    from dgraph_spark.operators.pipeline_text import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, n=3).select("doc_id", "source")


SQL_decontaminate = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                      ' ') AS t
  FROM documents),
grams AS (
  SELECT doc_id, array_to_string(t[i : i + 2], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)),
bad AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hit AS (SELECT DISTINCT doc_id FROM grams JOIN bad USING (g))
SELECT d.doc_id, d.source FROM documents d ANTI JOIN hit USING (doc_id)
"""


def q_dedup_spans(spark, sf_dir):
    """Exact duplicated 10-token spans across documents (word-aligned
    Lee et al. 2021 substring dedup): span + doc/occurrence counts."""
    from dgraph_spark.operators.dedup import duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicate_spans(docs, n=10, min_docs=2)


SQL_dedup_spans = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^\pL\pM\pN]+'),
                     x -> x != '') AS t
  FROM documents),
grams AS (
  SELECT doc_id, array_to_string(t[i : i + 9], ' ') AS span
  FROM toks, UNNEST(range(1, greatest(len(t) - 9, 0) + 1)) AS u(i))
SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
FROM grams GROUP BY span HAVING count(DISTINCT doc_id) >= 2
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals per document."""
    from dgraph_spark.operators.textstats import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs)


SQL_repetition_stats = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^\pL\pM\pN]+'),
                     x -> x != '') AS t
  FROM documents),
base AS (
  SELECT doc_id, t, len(t) AS n, len(list_distinct(t)) AS nd,
         length(array_to_string(t, ' ')) AS nchars
  FROM toks),
tok_top AS (
  SELECT doc_id, max(c) AS topc FROM (
    SELECT doc_id, x, count(*) AS c
    FROM toks, UNNEST(t) AS u(x) GROUP BY doc_id, x)
  GROUP BY doc_id),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
  FROM toks, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)),
gram_top AS (
  SELECT doc_id, c, g FROM (
    SELECT doc_id, g, count(*) AS c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY count(*) DESC, g DESC) AS rn
    FROM grams GROUP BY doc_id, g) WHERE rn = 1)
SELECT b.doc_id,
       b.n AS n_tokens,
       CASE WHEN b.n > 0 THEN round(1.0 - b.nd / CAST(b.n AS DOUBLE), 4)
            ELSE 0.0 END AS dup_token_frac,
       CASE WHEN b.n > 0 THEN round(tt.topc / CAST(b.n AS DOUBLE), 4)
            ELSE 0.0 END AS top_token_frac,
       CASE WHEN b.n >= 2 THEN
            round(gt.c * length(gt.g) / CAST(b.nchars AS DOUBLE), 4)
            ELSE 0.0 END AS top_bigram_char_frac
FROM base b
LEFT JOIN tok_top tt USING (doc_id)
LEFT JOIN gram_top gt USING (doc_id)
"""


def q_contamination_scores(spark, sf_dir):
    """Graded benchmark overlap: per-doc fraction of word 3-grams that
    appear in the benchmark subset (doc_id % 97 == 0)."""
    from dgraph_spark.operators.pipeline_text import contamination_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    return contamination_scores(docs, bench, n=3)


SQL_contamination_scores = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                      ' ') AS t
  FROM documents),
grams AS (
  SELECT doc_id, array_to_string(t[i : i + 2], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)),
bad AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
tot AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
hit AS (SELECT doc_id, count(*) AS matched
        FROM grams JOIN bad USING (g) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(t.n_grams, 0) AS n_grams,
       coalesce(h.matched, 0) AS matched,
       CASE WHEN coalesce(t.n_grams, 0) > 0
            THEN round(coalesce(h.matched, 0)
                       / CAST(t.n_grams AS DOUBLE), 4)
            ELSE 0.0 END AS overlap_frac
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN hit h USING (doc_id)
"""


def q_corpus_report(spark, sf_dir):
    """Per-source dataset card: doc/token/char totals, mean tokens,
    distinct languages — the mixing-weight input."""
    from dgraph_spark.operators.pipeline_text import corpus_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_report(docs)


# DuckDB sum(BIGINT) is HUGEINT -> pandas float64; the driver's value
# hash is dtype-sensitive (512 != 512.0), so every sum is pinned to
# BIGINT to match Spark's LongType (commit f7bfc3a's contract).
SQL_corpus_report = r"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
                                x -> x != ''))) AS BIGINT) AS n_tokens,
       round(avg(len(list_filter(string_split_regex(text, '\s+'),
                                 x -> x != ''))), 4) AS mean_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       count(DISTINCT lang) AS n_langs
FROM documents GROUP BY source
"""


def q_quality_filter(spark, sf_dir):
    """Gopher-rules document filter: keep flag + failed-rule reasons
    (comma-joined — the driver's pandas canonicalizer can't hash
    array cells, and rule order is deterministic)."""
    from dgraph_spark.operators.textstats import gopher_quality_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_quality_filter(docs, reasons_as_string=True)


SQL_quality_filter = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^\pL\pM\pN]+'),
                     x -> x != '') AS t
  FROM documents),
base AS (
  SELECT doc_id, t, len(t) AS n, len(list_distinct(t)) AS nd,
         length(array_to_string(t, ' ')) AS nchars
  FROM toks),
tok_top AS (
  SELECT doc_id, max(c) AS topc FROM (
    SELECT doc_id, x, count(*) AS c
    FROM toks, UNNEST(t) AS u(x) GROUP BY doc_id, x)
  GROUP BY doc_id),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
  FROM toks, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)),
gram_top AS (
  SELECT doc_id, c, g FROM (
    SELECT doc_id, g, count(*) AS c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY count(*) DESC, g DESC) AS rn
    FROM grams GROUP BY doc_id, g) WHERE rn = 1),
stats AS (
  SELECT b.doc_id, b.n,
         CASE WHEN b.n > 0 THEN round(1.0 - b.nd / CAST(b.n AS DOUBLE), 4)
              ELSE 0.0 END AS dupf,
         CASE WHEN b.n > 0 THEN round(tt.topc / CAST(b.n AS DOUBLE), 4)
              ELSE 0.0 END AS topf,
         CASE WHEN b.n >= 2 THEN
              round(gt.c * length(gt.g) / CAST(b.nchars AS DOUBLE), 4)
              ELSE 0.0 END AS bigf
  FROM base b
  LEFT JOIN tok_top tt USING (doc_id)
  LEFT JOIN gram_top gt USING (doc_id))
SELECT doc_id, len(reasons) = 0 AS keep,
       array_to_string(reasons, ',') AS reasons FROM (
  SELECT doc_id, list_filter([
      CASE WHEN n < 16 THEN 'too_few_tokens' END,
      CASE WHEN n > 100000 THEN 'too_many_tokens' END,
      CASE WHEN dupf > 0.6 THEN 'dup_tokens' END,
      CASE WHEN topf > 0.3 THEN 'top_token' END,
      CASE WHEN bigf > 0.18 THEN 'top_bigram' END
    ], x -> x IS NOT NULL) AS reasons
  FROM stats)
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup: cosine pairs within embedding
    blocks -> transitive closure -> canonical keep flag."""
    from dgraph_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, threshold=0.43, block_col="label")


SQL_semantic_dedup = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS i, b.vec_id AS j
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.43
),
sym AS (SELECT i AS a, j AS b FROM pairs
        UNION ALL SELECT j, i FROM pairs),
rec AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM rec r JOIN sym s ON r.b = s.a
)
SELECT id, cluster, id = cluster AS keep FROM (
  SELECT a AS id, least(a, min(b)) AS cluster FROM rec GROUP BY a)
"""


def q_pack_sequences(spark, sf_dir):
    """Sequence packing: per-source token stream cut into 512-token
    training sequences; each doc's offset + first/last sequence."""
    from dgraph_spark.operators.pipeline_text import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, budget=512, stratum_col="source")


# Window sum is HUGEINT in DuckDB -> float64 in pandas; BIGINT casts
# keep the dtype identical to Spark's LongType (driver hash contract).
SQL_pack_sequences = r"""
WITH sized AS (
  SELECT source, doc_id,
         len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
         AS n_tokens
  FROM documents),
offs AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
         - n_tokens AS tok_offset
  FROM sized)
SELECT source, doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(tok_offset // 512 AS BIGINT) AS first_seq,
       CAST((tok_offset + greatest(n_tokens, 1) - 1) // 512 AS BIGINT)
         AS last_seq
FROM offs
"""


def q_line_stats(spark, sf_dir):
    """Gopher line-level repetition signals (textstats.
    line_repetition_stats). The synthetic documents are single-line,
    so the entry derives a multi-line corpus first by turning two
    frequent vocabulary words into line breaks — deterministic and
    identical in the twin (leftmost non-overlapping replace in both
    engines)."""
    from dgraph_spark.operators.textstats import line_repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lined = docs.withColumn(
        "text", F.regexp_replace("text", r" (table|value) ", "\n"))
    return line_repetition_stats(lined)


SQL_line_stats = r"""
WITH lined AS (
  SELECT doc_id,
         regexp_replace(text, ' (table|value) ', chr(10), 'g') AS text
  FROM documents),
lines AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)), x -> x != '') AS l
  FROM lined),
base AS (
  SELECT doc_id, len(l) AS n, len(list_distinct(l)) AS nd,
         list_sum(list_transform(l, x -> length(x))) AS chars,
         list_sum(list_transform(list_distinct(l),
             d -> (len(list_filter(l, x -> x = d)) - 1) * length(d)))
           AS dupchars
  FROM lines)
SELECT doc_id, CAST(n AS BIGINT) AS n_lines,
       CASE WHEN n > 0 THEN round(1.0 - nd / CAST(n AS DOUBLE), 4)
            ELSE 0.0 END AS dup_line_frac,
       CASE WHEN chars > 0
            THEN round(dupchars / CAST(chars AS DOUBLE), 4)
            ELSE 0.0 END AS dup_line_char_frac
FROM base
"""


_BLOCKLIST = ["spark", "vector"]


def q_blocklist(spark, sf_dir):
    """C4-style phrase-blocklist filter (textstats.blocklist_filter)
    with a two-phrase demo list that splits the corpus."""
    from dgraph_spark.operators.textstats import blocklist_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return blocklist_filter(docs, _BLOCKLIST)


SQL_blocklist = """
SELECT doc_id, n_hits = 0 AS keep, n_hits FROM (
  SELECT doc_id,
         CAST(len(list_filter(['spark', 'vector'],
                              p -> contains(lower(text), p))) AS BIGINT)
           AS n_hits
  FROM documents)
"""


def q_prepare_corpus(spark, sf_dir):
    """The one-call pipeline recipe (operators/recipes.py): quality
    filter -> exact-dedup keep-min -> hash split -> per-(source,split)
    packing. The STAGES are individually oracled; this entry gates the
    WIRING (semi-join keeps, loser anti-joins, composite pack keys) —
    the only place a composition bug could hide."""
    from dgraph_spark.operators.recipes import prepare_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return prepare_corpus(docs)["corpus"].select(
        "doc_id", "source", "split", "n_tokens", "tok_offset",
        "first_seq", "last_seq")


def _sql_prepare_corpus() -> str:
    # the split CASE comes from the same accumulation as hash_split so
    # the hex thresholds match bit-for-bit (prepare_corpus defaults:
    # 0.98/0.01/0.01)
    from dgraph_spark.operators.pipeline_text import _hex_frac_literal

    fracs = {"train": 0.98, "val": 0.01, "test": 0.01}
    whens, acc = [], 0.0
    names = list(fracs)
    for name in names[:-1]:
        acc += fracs[name]
        whens.append(
            f"WHEN substr(md5('split|' || doc_id::VARCHAR), 1, 8) "
            f"< '{_hex_frac_literal(min(acc, 1.0))}' THEN '{name}'")
    case = f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"
    return r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^\pL\pM\pN]+'),
                     x -> x != '') AS t
  FROM documents),
base AS (
  SELECT doc_id, t, len(t) AS n, len(list_distinct(t)) AS nd,
         length(array_to_string(t, ' ')) AS nchars
  FROM toks),
tok_top AS (
  SELECT doc_id, max(c) AS topc FROM (
    SELECT doc_id, x, count(*) AS c
    FROM toks, UNNEST(t) AS u(x) GROUP BY doc_id, x)
  GROUP BY doc_id),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
  FROM toks, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)),
gram_top AS (
  SELECT doc_id, c, g FROM (
    SELECT doc_id, g, count(*) AS c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY count(*) DESC, g DESC) AS rn
    FROM grams GROUP BY doc_id, g) WHERE rn = 1),
stats AS (
  SELECT b.doc_id, b.n,
         CASE WHEN b.n > 0 THEN round(1.0 - b.nd / CAST(b.n AS DOUBLE), 4)
              ELSE 0.0 END AS dupf,
         CASE WHEN b.n > 0 THEN round(tt.topc / CAST(b.n AS DOUBLE), 4)
              ELSE 0.0 END AS topf,
         CASE WHEN b.n >= 2 THEN
              round(gt.c * length(gt.g) / CAST(b.nchars AS DOUBLE), 4)
              ELSE 0.0 END AS bigf
  FROM base b
  LEFT JOIN tok_top tt USING (doc_id)
  LEFT JOIN gram_top gt USING (doc_id)),
keepers AS (
  SELECT doc_id FROM stats
  WHERE NOT (n < 16 OR n > 100000 OR dupf > 0.6
             OR topf > 0.3 OR bigf > 0.18)),
clean0 AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN keepers USING (doc_id)),
fp AS (
  SELECT doc_id, source, text,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
  FROM clean0),
winners AS (
  SELECT doc_id, source, text, """ + case + r""" AS split
  FROM (SELECT *, min(doc_id) OVER (PARTITION BY f) AS m FROM fp)
  WHERE doc_id = m),
sized AS (
  SELECT source, split, doc_id,
         len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
           AS n_tokens
  FROM winners),
offs AS (
  SELECT source, split, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source, split ORDER BY doc_id)
         - n_tokens AS tok_offset
  FROM sized)
SELECT doc_id, source, split,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(tok_offset // 2048 AS BIGINT) AS first_seq,
       CAST((tok_offset + greatest(n_tokens, 1) - 1) // 2048 AS BIGINT)
         AS last_seq
FROM offs
"""


def q_word_freqs(spark, sf_dir):
    """BPE's one full-corpus pass: distinct normalized words with
    frequencies (operators/bpe.py word_frequencies), top-50 by
    (freq desc, word) for a deterministic slice."""
    from dgraph_spark.operators.bpe import word_frequencies

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (word_frequencies(docs)
            .orderBy(F.desc("freq"), "word").limit(50))


SQL_word_freqs = r"""
SELECT x AS word, count(*) AS freq
FROM (SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         w -> w != '') AS t
      FROM documents), UNNEST(t) AS u(x)
GROUP BY x
ORDER BY freq DESC, word
LIMIT 50
"""


def q_bpe_tokens(spark, sf_dir):
    """BPE tokenize the corpus with merges trained on it: per-doc
    (doc_id, n_words, n_bpe_tokens). Train = one distributed word-freq
    aggregation + driver merge loop; encode = shuffle-free
    mapInPandas (operators/bpe.py)."""
    from dgraph_spark.operators.bpe import bpe_encode, bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(docs, num_merges=60)
    return bpe_encode(docs, merges)


def _sql_bpe_tokens() -> str:
    """Oracle for bpe_tokens: BPE is iterative (not SQL-expressible),
    so the twin is tools/naive_bpe — an independently-implemented
    from-scratch trainer + in-order encoder — run over the SAME
    parquet and serialized as a VALUES literal. Pinned to the
    driver's oracle scale (sf0.01; tools/check_oracle.py exports
    DGSPARK_ORACLE_SF_DIR when run at another sf)."""
    import os as _os

    import pyarrow.parquet as _pq

    sf_dir = _os.environ.get("DGSPARK_ORACLE_SF_DIR",
                             "/root/testdata/sf0.01")
    tbl = _pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    from tools.naive_bpe import encode_corpus, train, word_frequencies

    merges = train(word_frequencies(texts), 60)
    vals = ",".join(
        f"({i},{nw},{nt})"
        for i, (nw, nt) in zip(ids, encode_corpus(texts, merges)))
    # BIGINT casts: the Spark side emits longs and DuckDB would
    # otherwise infer INTEGER for small VALUES literals
    return ("SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(n_words AS BIGINT) AS n_words, "
            "CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens "
            f"FROM (VALUES {vals}) AS t(doc_id, n_words, n_bpe_tokens)")


def q_c4_clean(spark, sf_dir):
    """C4-style line cleaning (Raffel et al. §2.2). The synthetic
    corpus has no line structure, so the entry builds it first —
    8-token lines, '.' appended on even lines, a code brace injected
    every 37th doc and 'lorem ipsum' every 41st — then runs
    c4_line_clean; the oracle repeats the same construction in SQL."""
    from dgraph_spark.operators.pipeline_text import c4_line_clean

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    nl = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    # guard: Spark's sequence(0, -1) is DECREASING ([0, -1]), so an
    # empty-token doc must yield an empty line list (matches the
    # oracle's range(0, 0); same pitfall as decontaminate's shingles)
    lines = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), nl - 1),
            lambda i: F.concat(
                F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
                F.when(i % 2 == 0, F.lit(".")).otherwise(F.lit(""))))
    ).otherwise(F.array().cast("array<string>"))
    base = F.array_join(lines, "\n")
    text2 = (
        F.when(F.col("doc_id") % 37 == 0,
               F.concat(base, F.lit("\nvar x = { nope }")))
        .when(F.col("doc_id") % 41 == 0,
              F.concat(F.lit("Lorem ipsum dolor sit amet.\n"), base))
        .otherwise(base))
    return c4_line_clean(
        docs.select("doc_id", text2.alias("text")),
        min_words=3, min_lines=2)


SQL_c4_clean = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w != '') AS t
  FROM documents),
lined AS (
  SELECT doc_id,
         array_to_string(
           [array_to_string(t[i * 8 + 1 : i * 8 + 8], ' ')
              || CASE WHEN i % 2 = 0 THEN '.' ELSE '' END
            FOR i IN range(0, CAST(ceil(len(t) / 8.0) AS INT))],
           chr(10)) AS base
  FROM toks),
built AS (
  SELECT doc_id,
         CASE WHEN doc_id % 37 = 0
                THEN base || chr(10) || 'var x = { nope }'
              WHEN doc_id % 41 = 0
                THEN 'Lorem ipsum dolor sit amet.' || chr(10) || base
              ELSE base END AS text2
  FROM lined),
split_lines AS (
  SELECT doc_id, text2,
         list_filter(string_split(text2, chr(10)),
                     l -> trim(l) != '') AS lines
  FROM built),
kept AS (
  SELECT doc_id, text2, lines,
         list_filter(lines,
           l -> regexp_matches(trim(l), '[.!?"]$')
                AND len(list_filter(
                        string_split_regex(trim(l), '\s+'),
                        w -> w != '')) >= 3) AS keptl
  FROM split_lines)
SELECT doc_id,
       keep, CAST(len(lines) AS INT) AS n_lines,
       CAST(len(keptl) AS INT) AS n_kept,
       CASE WHEN keep THEN array_to_string(keptl, chr(10)) END
         AS clean_text
FROM (
  SELECT doc_id, lines, keptl,
         NOT (contains(lower(text2), '{') OR contains(lower(text2), '}')
              OR contains(lower(text2), 'lorem ipsum'))
           AND len(keptl) >= 2 AS keep
  FROM kept)
"""


# the domain_mix entry's weight table (source -> training-mix weight);
# everything else defaults to 1.0
_MIX_WEIGHTS = {"src0": 2.5, "src1": 0.25, "src2": 0.0, "src3": 1.75}


def q_domain_mix(spark, sf_dir):
    """Deterministic domain re-weighting for a training mixture:
    md5-hash up/down-sampling to per-source weights
    (operators/pipeline_text.py domain_mix)."""
    from dgraph_spark.operators.pipeline_text import domain_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return domain_mix(docs, _MIX_WEIGHTS)


def _sql_domain_mix() -> str:
    from dgraph_spark.operators.pipeline_text import _hex_frac_literal

    whole = " ".join(
        f"WHEN '{d}' THEN {int(w)}" for d, w in sorted(_MIX_WEIGHTS.items()))
    frac = " ".join(
        f"WHEN '{d}' THEN '{_hex_frac_literal(w - int(w))}'"
        for d, w in sorted(_MIX_WEIGHTS.items()))
    return f"""
WITH sized AS (
  SELECT doc_id, source AS domain,
         CASE source {whole} ELSE 1 END
         + CASE WHEN substr(md5(doc_id::VARCHAR || '|' || source), 1, 8)
                     < CASE source {frac} ELSE '00000000' END
                THEN 1 ELSE 0 END AS k
  FROM documents)
SELECT doc_id, domain, CAST(x AS INT) AS copy
FROM sized, UNNEST(range(0, k)) AS u(x)
WHERE k > 0
"""


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style bigram-LM perplexity scoring (self-perplexity:
    model trained on the scored corpus; operators/ngram_lm.py)."""
    from dgraph_spark.operators.ngram_lm import perplexity_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return perplexity_report(docs)


SQL_lm_perplexity = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     w -> w != '') AS t
  FROM documents),
uni AS (SELECT x AS w1, count(*) AS cu
        FROM toks, UNNEST(t) AS u(x) GROUP BY x),
vocab AS (SELECT count(*) AS v FROM uni),
bigr AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
  WHERE len(t) >= 2),
bc AS (SELECT w1, w2, count(*) AS cb FROM bigr GROUP BY 1, 2),
scored AS (
  SELECT b.doc_id,
         ln((coalesce(bc.cb, 0) + 0.4)
            / (coalesce(u.cu, 0) + 0.4 * (SELECT v FROM vocab))) AS logp
  FROM bigr b
  LEFT JOIN bc USING (w1, w2)
  LEFT JOIN uni u USING (w1))
SELECT d.doc_id, coalesce(s.n, 0) AS n_bigrams, s.avg_logp, s.ppl
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n, round(avg(logp), 4) AS avg_logp,
         round(exp(-avg(logp)), 4) AS ppl
  FROM scored GROUP BY doc_id) s USING (doc_id)
"""


def q_asof_join(spark, sf_dir):
    """As-of join (operators/asof.py): each purchase + the latest
    preceding click by the same user — union+window formulation (one
    sort shuffle, no range-join blowup). Oracle: DuckDB's native
    ASOF LEFT JOIN over the same deduped right side."""
    from dgraph_spark.operators.asof import asof_join
    from dgraph_spark.sources.events import read_events

    ev = read_events(spark, sf_dir)
    buys = ev.where("event_type = 'purchase'").select(
        "event_id", "ts", "user_id", "value")
    clicks = ev.where("event_type = 'click'")
    out = asof_join(buys, clicks, on="user_id", ts_col="ts",
                    right_cols=("event_id", "value"))
    return out.select("event_id", "user_id", "r_event_id",
                      F.round("r_value", 2).alias("r_value"))


SQL_asof_join = """
WITH clicks AS (
  SELECT user_id, ts, event_id, value FROM (
    SELECT user_id, ts, event_id, value,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click') WHERE rn = 1),
buys AS (SELECT event_id, ts, user_id FROM events
         WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, r.event_id AS r_event_id,
       round(r.value, 2) AS r_value
FROM buys l ASOF LEFT JOIN clicks r
  ON l.user_id = r.user_id AND r.ts <= l.ts
"""


def q_interval_join(spark, sf_dir):
    """Interval (range) join: click -> purchase pairs by the same user
    within 30 minutes (operators/asof.py interval_join)."""
    from dgraph_spark.operators.asof import interval_join
    from dgraph_spark.sources.events import read_events

    ev = read_events(spark, sf_dir)
    clicks = ev.where("event_type = 'click'").select(
        "event_id", "ts", "user_id")
    buys = ev.where("event_type = 'purchase'").select(
        "event_id", "ts", "user_id", "value")
    out = interval_join(clicks, buys, on="user_id", ts_col="ts",
                        lower="0 seconds", upper="30 minutes")
    return out.select("event_id", F.col("r_event_id"),
                      F.round("r_value", 2).alias("r_value"))


SQL_interval_join = """
SELECT c.event_id, p.event_id AS r_event_id, round(p.value, 2) AS r_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization rollup (operators/asof.py
    session_stats): per (user, session) event count, duration and
    value sum with a 30-minute gap."""
    from dgraph_spark.operators.asof import session_stats
    from dgraph_spark.sources.events import read_events

    ev = read_events(spark, sf_dir)
    return session_stats(ev, gap="30 minutes")


SQL_sessionize = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_seq
  FROM marked)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       date_diff('second', min(ts), max(ts)) AS dur_s,
       round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_seq
"""


_BM25_QUERY = "spark merge join scan"


def q_bm25_search(spark, sf_dir):
    """BM25 ranked fulltext top-k (operators/bm25.py) — the ranked
    counterpart of anyoftext's unranked match set."""
    from dgraph_spark.operators.bm25 import bm25_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_search(docs, _BM25_QUERY, k=10)


def _sql_bm25_search() -> str:
    # the operator's own query tokenizer (ASCII-\s + lower), so the
    # twin can never drift from the engine's term spec
    from dgraph_spark.operators.bm25 import query_terms

    terms = query_terms(_BM25_QUERY)
    lits = ", ".join(f"'{t}'" for t in terms)
    parts = []
    for t in terms:
        tf = f"CAST(len(list_filter(t, x -> x = '{t}')) AS DOUBLE)"
        df = (f"(SELECT count(*) FROM toks WHERE "
              f"list_contains(t, '{t}'))")
        idf = f"ln((s.n - {df} + 0.5) / ({df} + 0.5) + 1.0)"
        parts.append(
            f"{idf} * {tf} * 2.2 / ({tf} + 1.2 * "
            f"(1 - 0.75 + 0.75 * len(t) / s.avgdl))")
    score = " + ".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     w -> w != '') AS t
  FROM documents),
s AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM toks)
SELECT doc_id, round({score}, 4) AS score
FROM toks, s
WHERE list_has_any(t, [{lits}])
ORDER BY score DESC, doc_id
LIMIT 10
"""


_SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_hash_split(spark, sf_dir):
    """Deterministic md5-interval train/val/test split
    (operators/pipeline_text.py hash_split)."""
    from dgraph_spark.operators.pipeline_text import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hash_split(docs, _SPLIT_FRACS).select("doc_id", "split")


def _sql_hash_split() -> str:
    from dgraph_spark.operators.pipeline_text import _hex_frac_literal

    whens, acc = [], 0.0
    names = list(_SPLIT_FRACS)
    for name in names[:-1]:
        # identical float accumulation to hash_split so the hex
        # literals match bit-for-bit
        acc += _SPLIT_FRACS[name]
        whens.append(
            f"WHEN substr(md5('split|' || doc_id::VARCHAR), 1, 8) "
            f"< '{_hex_frac_literal(min(acc, 1.0))}' THEN '{name}'")
    return (f"SELECT doc_id, CASE {' '.join(whens)} "
            f"ELSE '{names[-1]}' END AS split FROM documents")


QUERIES: dict[str, tuple] = {
    # Entries the driver's pinned correctness list has never
    # exercised run FIRST, so a prefix-limited driver still
    # covers the newest surfaces (round-3 verdict, driver note).
    "stream_session": (q_stream_session, SQL_stream_session),
    "q5_local_supplier": (q_q5_local_supplier, SQL_q5_local_supplier),
    "groupby_uid_pred": (q_groupby_uid_pred, SQL_groupby_uid_pred),
    "geo_within": (q_geo_within, SQL_geo_within),
    "geo_contains": (q_geo_contains, SQL_geo_contains),
    "after_uid": (q_after_uid, SQL_after_uid),
    "facet_order": (q_facet_order, SQL_facet_order),
    "len_filter": (q_len_filter, SQL_len_filter),
    "len_filter_combinator": (q_len_filter_combinator,
                              SQL_len_filter_combinator),
    "facet_var_order": (q_facet_var_order, SQL_facet_var_order),
    "ignorereflex": (q_ignorereflex, SQL_ignorereflex),
    "anyof_custom": (q_anyof_custom, SQL_anyof_custom),
    "multimodal_features": (q_multimodal_features, SQL_multimodal_features),
    "multimodal_frames": (q_multimodal_frames, SQL_multimodal_frames),
    "multimodal_png": (q_multimodal_png, SQL_multimodal_png),
    "multimodal_jpeg": (q_multimodal_jpeg, SQL_multimodal_jpeg),
    "multimodal_flac": (q_multimodal_flac, SQL_multimodal_flac),
    "multimodal_gif": (q_multimodal_gif, SQL_multimodal_gif),
    "multimodal_tiff": (q_multimodal_tiff, SQL_multimodal_tiff),
    "multimodal_video": (q_multimodal_video, SQL_multimodal_video),
    "html_extract": (q_html_extract, SQL_html_extract),
    "url_canonical": (q_url_canonical, SQL_url_canonical),
    "warc_roundtrip": (q_warc_roundtrip, SQL_warc_roundtrip),
    "robots_filter": (q_robots_filter, SQL_robots_filter),
    "sitemap_urls": (q_sitemap_urls, SQL_sitemap_urls),
    "multimodal_audio": (q_multimodal_audio, SQL_multimodal_audio),
    "ann_lsh": (q_ann_lsh, _sql_ann_lsh()),
    "dedup_clusters": (q_dedup_clusters, _sql_dedup_clusters()),
    "cdc_diff": (q_cdc_diff, SQL_cdc_diff),
    "stateful_counts": (q_stateful_counts, SQL_stateful_counts),
    "since_math": (q_since_math, SQL_since_math),
    "schema_introspect": (q_schema_introspect, SQL_schema_introspect),
    "json_load_roundtrip": (q_json_load_roundtrip, SQL_json_load_roundtrip),
    "backup_restore": (q_backup_restore, SQL_backup_restore),
    "mutation_roundtrip": (q_mutation_roundtrip, SQL_mutation_roundtrip),
    "json_mutation_roundtrip": (q_json_mutation_roundtrip, SQL_json_mutation_roundtrip),
    "export_roundtrip": (q_export_roundtrip, SQL_export_roundtrip),
    "graphql_query": (q_graphql_query, SQL_graphql_query),
    # --- driver-covered since r3 ---
    "root_eq_reverse_traversal": (q_root_eq_reverse_traversal, SQL_root_eq_reverse_traversal),
    "eq_val_var": (q_eq_val_var, SQL_eq_val_var),
    "between_dates": (q_between_dates, SQL_between_dates),
    "count_having": (q_count_having, SQL_count_having),
    "topk_root_order": (q_topk_root_order, SQL_topk_root_order),
    "per_parent_topk": (q_per_parent_topk, SQL_per_parent_topk),
    "anyofterms": (q_anyofterms, SQL_anyofterms),
    "allofterms": (q_allofterms, SQL_allofterms),
    "regexp": (q_regexp, SQL_regexp),
    "fuzzy_match": (q_fuzzy_match, SQL_fuzzy_match),
    "math_per_uid": (q_math_per_uid, SQL_math_per_uid),
    "agg_math_root": (q_agg_math_root, SQL_agg_math_root),
    "expand_all": (q_expand_all, SQL_expand_all),
    "recurse_depth5": (q_recurse_depth5, SQL_recurse_depth5),
    "geo_intersects": (q_geo_intersects, SQL_geo_intersects),
    "geo_near_poly": (q_geo_near_poly, SQL_geo_near_poly),
    "level_agg_sum": (q_level_agg_sum, SQL_level_agg_sum),
    "groupby_q1": (q_groupby_q1, SQL_groupby_q1),
    "uid_in": (q_uid_in, SQL_uid_in),
    "uid_literal": (q_uid_literal, SQL_uid_literal),
    "not_has": (q_not_has, SQL_not_has),
    "facet_filter": (q_facet_filter, SQL_facet_filter),
    "count_uid_root": (q_count_uid_root, SQL_count_uid_root),
    "cascade": (q_cascade, SQL_cascade),
    "lang_preference": (q_lang_preference, SQL_lang_preference),
    "recurse_reach": (q_recurse_reach, SQL_recurse_reach),
    "shortest_path": (q_shortest_path, SQL_shortest_path),
    "similar_to": (q_similar_to, SQL_similar_to),
    "stream_tumbling": (q_stream_tumbling, SQL_stream_tumbling),
    "dedup_exact": (q_dedup_exact, SQL_dedup_exact),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_dedup_ngram_jaccard),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, _sql_dedup_minhash_lsh()),
    "dedup_simhash": (q_dedup_simhash, SQL_dedup_simhash),
    "dedup_embedding_cosine": (q_dedup_embedding_cosine, SQL_dedup_embedding_cosine),
    "dedup_embedding_lsh": (q_dedup_embedding_lsh, _sql_dedup_embedding_lsh()),
    "text_stats": (q_text_stats, _text_stats_sql()),
    "similar_to_dql": (q_similar_to_dql, SQL_similar_to_dql),
    "similar_to_uid": (q_similar_to_uid, SQL_similar_to_uid),
    "chain_region_revenue": (q_chain_region_revenue, SQL_chain_region_revenue),
    "order_by_val": (q_order_by_val, SQL_order_by_val),
    "facet_output": (q_facet_output, SQL_facet_output),
    "connected_components": (q_connected_components, SQL_connected_components),
    "pagerank": (q_pagerank, _sql_pagerank()),
    "anyoftext": (q_anyoftext, _sql_anyoftext()),
    "alloftext": (q_alloftext, _sql_alloftext()),
    "anyoftext_de": (_q_anyoftext_lang("de", "tables und joins"),
                     _sql_anyoftext_lang("de", "tables und joins")),
    "anyoftext_fr": (_q_anyoftext_lang("fr", "les tables scannees"),
                     _sql_anyoftext_lang("fr", "les tables scannees")),
    "anyoftext_es": (_q_anyoftext_lang("es", "las tables ordenamiento"),
                     _sql_anyoftext_lang("es", "las tables ordenamiento")),
    "anyoftext_zh": (_q_anyoftext_lang("zh", "spark merge"),
                     _sql_anyoftext_lang("zh", "spark merge")),
    "ngram_search": (q_ngram_search, SQL_ngram_search),
    "stream_sliding": (q_stream_sliding, SQL_stream_sliding),
    "stem_tokens_it": (_q_stem_tokens("it"), _sql_stem_tokens("it")),
    "stem_tokens_pt": (_q_stem_tokens("pt"), _sql_stem_tokens("pt")),
    "stem_tokens_ru": (q_stem_tokens_ru, _sql_stem_tokens_ru()),
    "stem_tokens_sv": (_q_stem_tokens("sv"), _sql_stem_tokens("sv")),
    "stem_tokens_da": (_q_stem_tokens("da"), _sql_stem_tokens("da")),
    "stem_tokens_no": (_q_stem_tokens("no"), _sql_stem_tokens("no")),
    "stem_tokens_nl": (_q_stem_tokens("nl"), _sql_stem_tokens("nl")),
    "stem_tokens_ro": (_q_stem_tokens("ro"), _sql_stem_tokens("ro")),
    "stem_tokens_fi": (_q_stem_tokens("fi"), _sql_stem_tokens("fi")),
    "stem_tokens_hu": (_q_stem_tokens("hu"), _sql_stem_tokens("hu")),
    "stem_tokens_en": (_q_stem_tokens("en"), _sql_stem_tokens("en")),
    "stem_tokens_tr": (_q_stem_tokens("tr"), _sql_stem_tokens("tr")),
    "dedup_spans": (q_dedup_spans, SQL_dedup_spans),
    "repetition_stats": (q_repetition_stats, SQL_repetition_stats),
    "pack_sequences": (q_pack_sequences, SQL_pack_sequences),
    "prepare_corpus": (q_prepare_corpus, _sql_prepare_corpus),
    "line_stats": (q_line_stats, SQL_line_stats),
    "blocklist": (q_blocklist, SQL_blocklist),
    "quality_filter": (q_quality_filter, SQL_quality_filter),
    "semantic_dedup": (q_semantic_dedup, SQL_semantic_dedup),
    "stream_dedup": (q_stream_dedup, SQL_stream_dedup),
    "contamination_scores": (q_contamination_scores, SQL_contamination_scores),
    "corpus_report": (q_corpus_report, SQL_corpus_report),
    "knn_batch": (q_knn_batch, SQL_knn_batch),
    "chunk_docs": (q_chunk_docs, SQL_chunk_docs),
    "scrub_pii": (q_scrub_pii, _sql_scrub_pii()),
    "sample_stratified": (q_sample_stratified, SQL_sample_stratified),
    "decontaminate": (q_decontaminate, SQL_decontaminate),
    "bigfloat_agg": (q_bigfloat_agg, SQL_bigfloat_agg),
    "stem_tokens_ar": (_q_stem_tokens_translit("ar"),
                       _sql_stem_tokens_translit("ar")),
    "stem_tokens_ckb": (_q_stem_tokens_translit("ckb"),
                        _sql_stem_tokens_translit("ckb")),
    "stem_tokens_hi": (_q_stem_tokens_translit("hi"),
                       _sql_stem_tokens_translit("hi")),
    "word_freqs": (q_word_freqs, SQL_word_freqs),
    "bpe_tokens": (q_bpe_tokens, _sql_bpe_tokens),
    "c4_clean": (q_c4_clean, SQL_c4_clean),
    "domain_mix": (q_domain_mix, _sql_domain_mix()),
    "hash_split": (q_hash_split, _sql_hash_split()),
    "lm_perplexity": (q_lm_perplexity, SQL_lm_perplexity),
    "bm25_search": (q_bm25_search, _sql_bm25_search()),
    "asof_join": (q_asof_join, SQL_asof_join),
    "interval_join": (q_interval_join, SQL_interval_join),
    "sessionize": (q_sessionize, SQL_sessionize),
}


# Driver rotation: the per-round correctness harness runs a 50-entry
# prefix, so entries sort by the round of their newest GREEN driver row
# (never-green first, ties alphabetical). _NEWEST_GREEN_ROW is baked
# from the CORRECTNESS_r0*.json history — regenerate each round (red
# rows do NOT advance the watermark: round 8's four oracle-contract
# reds sort to the front of round 9's sample alongside brand-new
# entries). With 116+ entries and a 50-slot sample, nothing should
# ever be more than two rounds stale.
_NEWEST_GREEN_ROW = {
    "after_uid": 9,
    "agg_math_root": 9,
    "allofterms": 9,
    "alloftext": 9,
    "ann_lsh": 8,
    "anyof_custom": 8,
    "anyofterms": 9,
    "anyoftext": 9,
    "anyoftext_de": 9,
    "anyoftext_es": 9,
    "anyoftext_fr": 9,
    "anyoftext_zh": 9,
    "asof_join": 8,
    "backup_restore": 9,
    "between_dates": 9,
    "bigfloat_agg": 9,
    "blocklist": 9,
    "bm25_search": 8,
    "bpe_tokens": 8,
    "c4_clean": 8,
    "cascade": 9,
    "cdc_diff": 8,
    "chain_region_revenue": 8,
    "chunk_docs": 8,
    "connected_components": 9,
    "contamination_scores": 8,
    "corpus_report": 9,
    "count_having": 9,
    "count_uid_root": 9,
    "decontaminate": 8,
    "dedup_clusters": 8,
    "dedup_embedding_cosine": 8,
    "dedup_embedding_lsh": 8,
    "dedup_exact": 8,
    "dedup_minhash_lsh": 8,
    "dedup_ngram_jaccard": 8,
    "dedup_simhash": 8,
    "dedup_spans": 8,
    "domain_mix": 8,
    "eq_val_var": 9,
    "expand_all": 9,
    "export_roundtrip": 9,
    "facet_filter": 9,
    "facet_order": 9,
    "facet_output": 9,
    "facet_var_order": 9,
    "fuzzy_match": 9,
    "geo_contains": 9,
    "geo_intersects": 9,
    "geo_near_poly": 9,
    "geo_within": 9,
    "graphql_query": 9,
    "groupby_q1": 9,
    "groupby_uid_pred": 9,
    "hash_split": 8,
    "ignorereflex": 8,
    "interval_join": 8,
    "json_load_roundtrip": 9,
    "json_mutation_roundtrip": 9,
    "knn_batch": 8,
    "lang_preference": 8,
    "len_filter": 9,
    "level_agg_sum": 7,
    "line_stats": 9,
    "lm_perplexity": 8,
    "math_per_uid": 7,
    "multimodal_audio": 8,
    "multimodal_features": 8,
    "multimodal_frames": 8,
    "mutation_roundtrip": 7,
    "ngram_search": 9,
    "not_has": 7,
    "order_by_val": 8,
    "pack_sequences": 9,
    "pagerank": 9,
    "per_parent_topk": 7,
    "prepare_corpus": 9,
    "q5_local_supplier": 7,
    "quality_filter": 9,
    "recurse_depth5": 7,
    "recurse_reach": 8,
    "regexp": 7,
    "repetition_stats": 8,
    "root_eq_reverse_traversal": 7,
    "sample_stratified": 8,
    "schema_introspect": 7,
    "scrub_pii": 8,
    "semantic_dedup": 8,
    "sessionize": 9,
    "shortest_path": 8,
    "similar_to": 8,
    "similar_to_dql": 8,
    "similar_to_uid": 8,
    "since_math": 7,
    "stateful_counts": 8,
    "stem_tokens_ar": 7,
    "stem_tokens_ckb": 7,
    "stem_tokens_da": 9,
    "stem_tokens_en": 8,
    "stem_tokens_fi": 7,
    "stem_tokens_hi": 7,
    "stem_tokens_hu": 7,
    "stem_tokens_it": 9,
    "stem_tokens_nl": 7,
    "stem_tokens_no": 7,
    "stem_tokens_pt": 9,
    "stem_tokens_ro": 7,
    "stem_tokens_ru": 9,
    "stem_tokens_sv": 9,
    "stem_tokens_tr": 8,
    "stream_dedup": 8,
    "stream_session": 7,
    "stream_sliding": 9,
    "stream_tumbling": 8,
    "text_stats": 8,
    "topk_root_order": 7,
    "uid_in": 7,
    "uid_literal": 7,
    "word_freqs": 8,
}


QUERIES = {k: QUERIES[k]
           for k in sorted(QUERIES,
                           key=lambda k: (_NEWEST_GREEN_ROW.get(k, 0), k))}

# Oracles COMPUTED from the parquet at registry-import time (VALUES
# literals) are pinned to $DGSPARK_ORACLE_SF_DIR (default sf0.01, the
# driver's oracle scale). Harnesses that check another sf must rebuild
# them with the env var set — tools/check_oracle.py and tests/
# test_oracle.py both do, through this table.
COMPUTED_ORACLES = {"bpe_tokens": _sql_bpe_tokens}


def resolve_sql(sql):
    """Oracle entries are SQL strings or zero-arg builders (computed
    oracles that read the parquet — deferred so importing the registry
    has no I/O side effect). Consumers call this at use time."""
    return sql() if callable(sql) else sql

