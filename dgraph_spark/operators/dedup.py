"""Document deduplication operators for training-data pipelines.

Four families, all shuffle-conscious:

- exact_duplicates: hash-groupBy on normalized text (one shuffle).
- ngram_jaccard_pairs: EXACT near-dup pairs via shingle inverted index
  (explode -> equi-join on shingle -> jaccard filter). This is the
  correctness baseline; the inverted-index join IS the scalable exact
  algorithm (no all-pairs scan; work ~ sum of posting-list squares).
- minhash_lsh_pairs: MinHash signatures + banded LSH candidate
  generation, exact-jaccard verification of candidates only — the
  100 TB path (recall < 1 by design; verified precision = 1).
- simhash64: 64-bit SimHash fingerprints + near-dup pairs within
  Hamming distance via band join.
- embedding_near_dups: cosine near-dup pairs over an embedding column,
  blocked by a coarse key (label / LSH bucket) to avoid all-pairs.

Everything is built-in column expressions (xxhash64, explode, windows)
— no row-at-a-time Python UDFs; the one Python hot path is the
Arrow-vectorized pair-dot (similarity.pair_dot_vec), used only where
the interpreted zip_with/aggregate lambda was measured ~10x slower on
pair-count-bound verification.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dgraph_spark.functions.tokenizers import TERM_SPLIT_RE

# Relations at or under this row count may be broadcast; larger ones
# degrade to shuffle joins (a broadcast of an unbounded corpus OOMs the
# executors at 100x the data).
BROADCAST_ROW_CAP = 2_000_000

# All-pairs (cross-join) fallbacks refuse above this row count — at
# 100k rows that's already 5e9 comparisons; beyond it the caller must
# provide a blocking column or use an LSH-bucketed variant.
ALL_PAIRS_ROW_CAP = 100_000


# (session id, plan semantic hash, data snapshot, ...) -> persisted
# relations. One persisted shingle relation serves every dedup operator
# over the same corpus (jaccard + minhash + simhash all shingle the same
# documents) AND repeated invocations — without the cache each call
# re-persisted a fresh copy, leaking executor memory run over run.
_SHINGLE_CACHE: dict[tuple, tuple[DataFrame, int]] = {}

import os as _os
import weakref as _weakref

# Live sessions by id(): a WeakValueDictionary entry dies with its
# session, so a cache key whose session id is no longer here is known
# stale (id() may be reused after GC) and is pruned before lookup.
_LIVE_SESSIONS: "_weakref.WeakValueDictionary[int, object]" = (
    _weakref.WeakValueDictionary())
_ALL_CACHES: list[dict] = []


def _corpus_key(docs: DataFrame, *extra) -> tuple | None:
    """Cache key for a corpus DataFrame: (session id, plan semantic hash,
    input-file snapshot, *extra). The snapshot (sorted file paths +
    mtimes) distinguishes a rewritten parquet directory from the prior
    contents even though the PLAN hash is identical; in-memory
    DataFrames (no input files) are immutable so the plan hash alone
    suffices. Sources with NO file snapshot whose plan hash is also
    data-independent (spark.read.table over a mutable catalog table,
    JDBC) are NOT cacheable — an in-session data change would silently
    serve stale stats — so when the snapshot is empty every leaf must
    be immutable-by-construction: LocalRelation/Range (literal data in
    the plan) or LogicalRDD (createDataFrame — the RDD id is part of
    the plan hash and RDD lineage is immutable).
    Returns None when the key can't be built (no caching)."""
    try:
        sess = docs.sparkSession
        sid = id(sess)
        _LIVE_SESSIONS[sid] = sess
        for cache in _ALL_CACHES:  # prune entries from dead sessions
            for k in [k for k in cache if k[0] not in _LIVE_SESSIONS]:
                _drop_entry(cache, k)
        snap = []
        for f in docs.inputFiles():
            p = f[7:] if f.startswith("file://") else f
            try:
                snap.append((f, _os.path.getmtime(p)))
            except OSError:
                snap.append((f, None))
        if not snap:
            immutable = {"LocalRelation", "LogicalRDD", "Range",
                         "OneRowRelation"}
            leaves = docs._jdf.queryExecution().analyzed().collectLeaves()
            if not all(leaves.apply(i).nodeName() in immutable
                       for i in range(leaves.size())):
                return None
        key = (sid, docs._jdf.semanticHash(), tuple(sorted(snap))) + extra
        # A rewritten parquet dir produces a new snapshot under the same
        # (session, plan, extras); the superseded entry can never be hit
        # again, so unpersist it now instead of waiting for session death.
        for cache in _ALL_CACHES:
            for k in [k for k in cache
                      if len(k) == len(key) and k != key
                      and k[:2] == key[:2] and k[3:] == key[3:]]:
                _drop_entry(cache, k)
        return key
    except Exception:
        return None


def _drop_entry(cache: dict, key: tuple) -> None:
    val = cache.pop(key, None)
    for item in (val if isinstance(val, tuple) else (val,)):
        if isinstance(item, DataFrame):
            try:
                item.unpersist()
            except Exception:
                pass


def invalidate_dedup_caches() -> None:
    """Unpersist and drop every cached dedup index/shingle relation —
    call after rewriting a corpus in place within one session."""
    for cache in _ALL_CACHES:
        for k in list(cache):
            _drop_entry(cache, k)


_ALL_CACHES.append(_SHINGLE_CACHE)


def _materialized_shingles(
    docs: DataFrame, text_col: str, id_col: str, n: int
) -> tuple[DataFrame, int]:
    """Persist + materialize the shingle relation once per (corpus, n).
    Shingling is the CPU-heavy step (regex split + n-gram zip); every
    dedup pipeline reads it 2-3 times, so recomputing it per stage both
    triples the work and forces the JVM to re-JIT the large generated
    expression in every consumer stage. Returns (persisted df, row count)."""
    key = _corpus_key(docs, text_col, id_col, n)
    if key is None:  # semanticHash unavailable (e.g. connect) — no cache
        sh = _shingled(docs, text_col, id_col, n).persist(StorageLevel.MEMORY_AND_DISK)
        return sh, sh.count()
    if key not in _SHINGLE_CACHE:
        sh = _shingled(docs, text_col, id_col, n).persist(StorageLevel.MEMORY_AND_DISK)
        _SHINGLE_CACHE[key] = (sh, sh.count())
    return _SHINGLE_CACHE[key]


def _partition_count(df: DataFrame) -> int:
    """Physical partition count of ``df``. Prefers the InternalRow RDD
    (``queryExecution().toRdd()``) over ``df.rdd`` — same physical
    planning, but no Python-serializer plan / RDD wrapper construction
    (round-11: the probe is on every spread call site's hot path).
    Raises under Spark Connect (no classic queryExecution handle) —
    callers treat that as "unknown, do nothing"."""
    try:
        return df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df.rdd.getNumPartitions()


def _input_bytes(df: DataFrame) -> int | None:
    """Total size of the DataFrame's input files (analyzed-plan walk —
    no physical planning, no job). None when there are no file inputs
    (in-memory relations) or the probe is unavailable (Connect)."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        total = 0
        for f in files:
            p = f[7:] if f.startswith("file://") else f
            total += _os.path.getsize(p)
        return total
    except Exception:
        return None


# A partition is "fat" past this many input bytes: a handful of such
# partitions on a wide machine leaves cores idle for a compute-bound
# consumer even when the raw partition count clears the //2 trigger.
# 256 MB = 2x the default scan split, i.e. clearly coarser than Spark
# would choose on its own.
SPREAD_FAT_PARTITION_BYTES = 256 * 1024 * 1024


def compute_spread(df: DataFrame) -> DataFrame:
    """Round-robin-spread an under-parallel DataFrame for a COMPUTE-
    bound consumer (tokenizer/shingle/codec expressions at ~0.1-1 ms
    per row). Spark sizes scan partitions for I/O (maxPartitionBytes),
    so a small corpus — one parquet file with one row group — reads as
    ONE task and the whole per-row program runs single-core no matter
    how many cores the session has. When the input already has
    reasonable parallelism (any real crawl-scale table) this is a
    no-op, so the exchange never ships big data anywhere.
    Scale-adaptive by construction: the triggers and the target are all
    derived from defaultParallelism, not from a local constant.

    Triggers (round 11 — unit-pinned in tests/test_spread_barrier.py):
      1. partitions < max(2, defaultParallelism/2): an under-parallel
         input (the original round-10 rule).
      2. partitions < defaultParallelism AND input bytes/partition >
         SPREAD_FAT_PARTITION_BYTES: few-but-FAT partitions (e.g. 40
         unsplittable 25 GB row groups on 64 cores) — partition count
         alone is a weak proxy for idle capacity, so the byte estimate
         (file metadata only, no job) breaks the tie.

    Connect-safe: every probe is wrapped — when the classic-API handles
    are unavailable (Spark Connect) the input is returned unchanged
    (no spread is always semantics-preserving), mirroring
    ``_corpus_key``'s degrade-to-uncached behavior."""
    try:
        if df.isStreaming:
            return df
        sc = df.sparkSession.sparkContext
        par = sc.defaultParallelism
        nparts = _partition_count(df)
        if nparts < max(2, par // 2):
            return df.repartition(par)
        if nparts < par:
            b = _input_bytes(df)
            if b is not None and b / nparts > SPREAD_FAT_PARTITION_BYTES:
                return df.repartition(par)
        return df
    except Exception:
        return df


def nopush(cond: Column) -> Column:
    """Pushdown barrier for an expensive deterministic predicate:
    ``when(monotonically_increasing_id() >= 0, cond).otherwise(true)``
    is semantically identical to ``cond`` (the id is always >= 0), but
    the branch condition is nondeterministic, so the WHOLE expression
    is nondeterministic and PushPredicateThroughNonJoin cannot move it
    below a compute_spread Exchange or inline it through a Project.

    Without this, ``spread.where(expensive)`` is silently rewritten to
    ``where(expensive).spread`` — the predicate lands on the single
    scan task and the repartition spreads rows that are already
    filtered (measured on prepare_corpus: the whole Gopher predicate
    ran single-core at the scan; plans/r10/). A second benefit on
    filter-over-projection shapes: pushdown INLINES the projected
    expression into the scan filter (SPARK-36718 protects aliases from
    collapse, not from pushdown), so un-let-bound programs like the
    shingle zip_with were being evaluated once in the pushed filter
    and again in the surviving projection; the barrier keeps them
    single-evaluation."""
    return (F.when(F.monotonically_increasing_id() >= 0, cond)
            .otherwise(F.lit(True)))


def normalized(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical text form."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def norm_tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text — the ONE canonical
    word spec shared by bpe/bm25/ngram_lm (ASCII \\s, matching Java's
    regex class; worker-side twins must split the same way)."""
    return F.filter(F.split(normalized(col), " "), lambda t: t != "")


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents: (fingerprint,
    ids, cnt) for cnt > 1."""
    return (
        docs.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"), F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def _shingled(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, sh) with the CPU-bound shingling spread across cores — a
    single small parquet file otherwise runs the whole corpus in one
    task."""
    return (
        compute_spread(docs)
        .select(F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh"))
        # nopush: without the barrier this size-guard is pushed below
        # the repartition AND inlines the whole shingle program into a
        # scan-side filter (single task, and the zip_with re-splits the
        # text per reference) — shingling then runs twice, once
        # single-core. With it: one parallel evaluation in the
        # projection, the guard tests the materialized column.
        .where(nopush(F.size("sh") > 0))
    )


def word_shingles(col: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles of the text.

    Built with zip_with over shifted slices — NOT transform+element_at,
    which would inline (and re-evaluate) the split() expression once per
    element, turning shingling O(words^2) per document."""
    words = F.filter(F.split(F.lower(col), TERM_SPLIT_RE), lambda t: t != "")
    grams = words
    for j in range(1, n):
        shifted = F.slice(words, j + 1, F.greatest(F.size(words) - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    # zip_with pads the shorter side with null -> trailing null concats
    return F.array_distinct(F.filter(grams, lambda g: g.isNotNull()))


# (session, corpus hash, threshold, n, cols) -> (pref_sz, sh, bm, n_docs).
# The prefix inverted index and bitset dictionary are INDEX structures:
# like dgraph's persistent trigram/term indexes (tok/tok.go, posting/),
# they are built once per corpus and amortized across queries, not
# rebuilt per invocation. All persisted MEMORY_AND_DISK.
_JACCARD_INDEX_CACHE: dict[tuple, tuple] = {}
_ALL_CACHES.append(_JACCARD_INDEX_CACHE)


def _jaccard_index(
    docs: DataFrame, threshold: float, n: int, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame | None, int, int]:
    """Build (or fetch) the PPJoin index for a corpus: the per-document
    prefix posting rows ``pref_sz(id, g, p, sz)``, the shingle-array
    relation ``sh``, an optional dense-vocab bitset relation ``bm``,
    the corpus row count, and ``cand_bound`` — sum over prefix tokens g
    of C(postings_g, 2), the exact row count of the self-join on g
    BEFORE the length/positional filters. cand_bound is the density
    meter: it is what actually explodes on a duplicate-dense corpus."""
    ck = _corpus_key(docs, round(threshold, 9), n, text_col, id_col)
    if ck is not None and ck in _JACCARD_INDEX_CACHE:
        return _JACCARD_INDEX_CACHE[ck]

    sh, n_docs = _materialized_shingles(docs, text_col, id_col, n)
    # global document frequency per shingle; (df, g) IS the rarest-first
    # total order — no global row_number/sort needed. df_rank is read
    # three times during the build (the ranked join, the vocab probe,
    # the bitset dictionary): persist it for the build's duration so
    # the posting explode+aggregate runs ONCE instead of per consumer
    # (round 11 — the cold index build is now artifact-visible as
    # cold_first_run_s, guide §5 "reused AND expensive to recompute").
    posting_all = sh.select("id", F.explode("sh").alias("g"))
    df_rank = posting_all.groupBy("g").agg(F.count("*").alias("df")).persist(
        StorageLevel.MEMORY_AND_DISK)
    ranked = (
        posting_all.join(df_rank, "g")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "g"))).alias("rg"))
        .select("id", F.col("rg").alias("rg"), F.size("rg").alias("sz"))
    )
    # prefix length = sz - ceil(t*sz) + 1
    prefix_len = (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int")
    pref_sz = ranked.select(
        "id", F.posexplode(F.slice("rg", 1, prefix_len)).alias("p", "e"), "sz"
    ).select("id", F.col("e.g").alias("g"), "p", "sz").persist(
        StorageLevel.MEMORY_AND_DISK)
    pref_sz.count()

    # vocab (dictionary size — the dense/sparse decision) and
    # cand_bound (the density meter) ride ONE collect, keyed by an
    # explicit marker (union output order is not contractual — same
    # ritual as min_label_closure's probe): both sub-plans read only
    # persisted relations, so fusing them saves a driver round trip,
    # not recompute.
    probe = {r["k"]: r["v"] for r in (
        df_rank.agg(F.count("*").alias("v")).withColumn("k", F.lit(1))
        .unionAll(
            pref_sz.groupBy("g").agg(F.count("*").alias("c"))
            .agg(F.coalesce(F.sum(F.expr("c * (c - 1) / 2")), F.lit(0))
                 .cast("long").alias("v")).withColumn("k", F.lit(2)))
        .collect())}
    vocab, cand_bound = int(probe[1]), int(probe[2])
    bm = None
    if vocab <= 131_072:
        # DENSE-VOCABULARY bitsets: when the global shingle dictionary is
        # small (template-heavy corpora — exactly the case where prefix
        # filtering is weakest and the candidate set largest), encode
        # each document's shingle set as a packed bitset over the
        # dictionary so verification is popcount(a & b). A 64-bit word
        # of AND+bit_count replaces 64 hash probes of string
        # array_intersect — same exact jaccard, ~an order of magnitude
        # less CPU per candidate. Dictionary + bitsets stay bounded
        # (<=2k longs/doc); sparse corpora (real text at 100 TB, vocab
        # >> 131k) verify against the shingle arrays instead.
        # Assembly (round 11): two-level bit_or — word w of the bitset
        # is bit_or(1 << gid%64) over the doc's gids with gid div 64 =
        # w. bit_or partial-aggregates map-side, so the exchange
        # carries <= nw rows per doc instead of every posting (the old
        # collect_list shipped each (id, gid) row — no map-side
        # combine), and the builtin replaces the O(nw * |ids|)
        # interpreted aggregate/filter loop per document.
        from pyspark.sql.window import Window

        nw = (vocab + 63) // 64
        dict_df = df_rank.select("g").withColumn(
            "gid", F.row_number().over(Window.orderBy("g")) - 1)
        bm = (
            posting_all.join(F.broadcast(dict_df), "g")
            .groupBy("id", F.expr("gid div 64").alias("w"))
            .agg(F.expr("bit_or(shiftleft(1L, int(gid % 64)))").alias("word"),
                 F.count("*").alias("c"))
            .groupBy("id")
            .agg(F.map_from_entries(
                     F.collect_list(F.struct("w", "word"))).alias("m"),
                 F.sum("c").cast("int").alias("sz"))
            .select(
                "id", "sz",
                F.expr(f"transform(sequence(0, {nw - 1}), "
                       "w -> coalesce(m[w], 0L))").alias("bm"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        bm.count()

    # pref_sz and bm are materialized; the build-scoped frequency
    # relation is no longer reachable from any consumer plan's
    # execution (persisted parents never recompute their lineage)
    df_rank.unpersist()

    out = (pref_sz, sh, bm, n_docs, cand_bound)
    if ck is not None:
        _JACCARD_INDEX_CACHE[ck] = out
    return out


# Candidate-density ceiling for the exact jaccard join, in prefix-join
# rows PER DOCUMENT. Measured regimes (2-gram shingles, t=0.7): the
# sf0.1 documents table runs at ~1.9k/doc (1.6 s), the 10x synth at
# ~19k/doc (12 s) — both fine; growth is ~linear in corpus size on a
# duplicate-dense corpus (replicas share shingles), so a 100x crawl
# sits at ~200k/doc and the join output alone is ~10^13 rows. The
# default cap is ~5x the largest measured-good regime.
JACCARD_CANDIDATES_PER_DOC_CAP = 100_000.0


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidates_per_doc: float | None = JACCARD_CANDIDATES_PER_DOC_CAP,
) -> DataFrame:
    """EXACT jaccard near-dup pairs (i < j) via prefix-filtered inverted
    index (AllPairs/PPJoin candidate filter).

    Exactness-preserving pruning: with |A∩B|/|A∪B| >= t, the docs must
    share a shingle within the first ``|sh| - ceil(t*|sh|) + 1`` entries
    of a GLOBALLY consistently ordered shingle list. Ordering rarest-
    first makes those prefix posting lists tiny, so the candidate join
    touches ~near-dups only instead of squaring every frequent shingle's
    posting list (the naive index is quadratic in document frequency —
    unusable at scale). Candidates are then verified with exact jaccard.

    Density guard: PPJoin is the right EXACT algorithm, but exact pair
    output is inherently quadratic in duplicate density — on a corpus
    past ``max_candidates_per_doc`` prefix-join rows per document this
    raises (loudly, BEFORE launching the join) and advises
    ``minhash_lsh_pairs``, whose banded index stays linear. Pass a
    higher cap or None to force the exact join anyway.
    """
    pref_sz, sh, bm, n_docs, cand_bound = _jaccard_index(
        docs, threshold, n, text_col, id_col)
    if (max_candidates_per_doc is not None and n_docs > 0
            and cand_bound / n_docs > max_candidates_per_doc):
        raise ValueError(
            f"ngram_jaccard_pairs: candidate density "
            f"{cand_bound / n_docs:,.0f} prefix-join rows/doc "
            f"({cand_bound:,} over {n_docs:,} docs) exceeds "
            f"max_candidates_per_doc={max_candidates_per_doc:,.0f}. "
            "This corpus is duplicate-dense: the exact join's output "
            "is quadratic in duplicate density. Use "
            "minhash_lsh_pairs (banded LSH, linear) instead, or pass "
            "a higher max_candidates_per_doc / None to force the "
            "exact join.")

    # PPJoin-style candidate generation, all exactness-preserving:
    #  - prefix filter: similar pairs must share a prefix shingle
    #  - length filter: t*|B| <= |A| <= |B|/t
    #  - positional filter: with first shared prefix positions (pa, pb),
    #    the overlap can be at most 1 + min(|A|-pa, |B|-pb); it must reach
    #    alpha = ceil(t/(1+t) * (|A|+|B|))
    #
    # The positional filter runs PER JOIN ROW, before pair dedup (round
    # 11, guide §2.3 "shuffle fewer bytes"): both prefix lists are
    # sliced from the SAME (df, g) total order, so for any two shared
    # tokens their relative position agrees in both docs — the first
    # shared token minimizes pa and pb SIMULTANEOUSLY, and its per-row
    # bound equals the old min(pa)/min(pb) aggregated bound exactly
    # (every other shared token's bound is tighter). Filtering rows
    # before the exchange therefore keeps exactly the pairs the old
    # post-aggregation filter kept, while the exchange carries bare
    # 16-byte (i, j) rows into a map-side-combinable distinct instead
    # of 40-byte rows plus four aggregation buffers per group.
    alpha = F.ceil(F.lit(threshold / (1.0 + threshold))
                   * (F.col("a.sz") + F.col("b.sz")))
    ubound = 1 + F.least(F.col("a.sz") - F.col("a.p"),
                         F.col("b.sz") - F.col("b.p"))
    cand = (
        pref_sz.alias("a")
        .join(pref_sz.alias("b"), "g")
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") >= threshold * F.col("b.sz"))
            & (F.col("b.sz") >= threshold * F.col("a.sz"))
            & (ubound >= alpha)
        )
        .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
        .distinct()
    )
    # verify is compute-bound, not byte-bound: spread it wide so AQE's
    # byte-based coalescing doesn't serialize millions of array
    # intersections onto a few cores
    cand = cand.repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
    # broadcast the (persisted) shingle arrays only while they fit; at
    # scale the verify degrades to a shuffle join instead of OOMing
    bc = F.broadcast if n_docs <= BROADCAST_ROW_CAP else (lambda d: d)

    if bm is not None:
        # DENSE-VOCABULARY verify (bitsets precomputed by _jaccard_index)
        out = (
            cand.join(bc(bm.select(F.col("id").alias("i"), F.col("bm").alias("bma"),
                                   F.col("sz").alias("isz"))), "i")
            .join(bc(bm.select(F.col("id").alias("j"), F.col("bm").alias("bmb"),
                               F.col("sz").alias("jsz"))), "j")
            .withColumn("inter", F.expr(
                "aggregate(zip_with(bma, bmb, (x, y) -> bit_count(x & y)), "
                "0, (a, b) -> a + b)"))
            .withColumn(
                "jac", F.col("inter") / (F.col("isz") + F.col("jsz") - F.col("inter"))
            )
            .where(F.col("jac") >= threshold)
            .select("i", "j", F.round("jac", 4).alias("jac"))
        )
        return out

    out = (
        cand.join(bc(sh.select(F.col("id").alias("i"), F.col("sh").alias("sha"))), "i")
        .join(bc(sh.select(F.col("id").alias("j"), F.col("sh").alias("shb"))), "j")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jac", F.col("inter") / (F.size("sha") + F.size("shb") - F.col("inter"))
        )
        .where(F.col("jac") >= threshold)
        .select("i", "j", F.round("jac", 4).alias("jac"))
    )
    return out


# Engine-portable hash family for MinHash/SimHash: u(g) = first 60 bits
# of md5(g), then affine maps h_k = (A_k * u + B_k) mod P over the
# Mersenne-31 field. md5 and base-16 parsing exist verbatim in DuckDB
# (('0x'||substr(md5(g),1,15))::BIGINT), so the CORRECTNESS oracle can
# reproduce signatures bit-for-bit — xxhash64 could not be mirrored.
# A_k*u < 2^62 so the arithmetic stays in signed-64 on both engines.
MH_P = 2147483647  # 2^31 - 1
import random as _random

_mh_rng = _random.Random(0x5EED)
MH_A = [_mh_rng.randrange(1, MH_P) for _ in range(256)]
MH_B = [_mh_rng.randrange(0, MH_P) for _ in range(256)]


def _md5_60(col) -> Column:
    """First 60 bits of md5 as a non-negative long — identical in Spark
    (conv) and DuckDB (hex cast)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures over word shingles.
    Hash family: affine maps over md5-60bit (engine-portable; see MH_A)."""
    sh = _shingled(docs, text_col, id_col, n) if shingles is None else shingles
    # relational min-hash: explode shingles, hash the shingle ONCE
    # (md5 is the expensive step), fan out the affine family via
    # posexplode, partial-min per (id, k). One pass over the shingles —
    # num_hashes separate array expressions would re-inline (and
    # re-evaluate) the shingling per hash function.
    posting = sh.select("id", F.explode("sh").alias("g")).select(
        "id", (_md5_60(F.col("g")) % MH_P).alias("u")
    )
    a_arr = F.array(*[F.lit(a) for a in MH_A[:num_hashes]])
    b_arr = F.array(*[F.lit(b) for b in MH_B[:num_hashes]])
    ks = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    hk = posting.select(
        "id",
        F.posexplode(
            F.transform(
                ks,
                lambda k: (
                    F.element_at(a_arr, k + 1) * F.col("u")
                    + F.element_at(b_arr, k + 1)
                ) % MH_P,
            )
        ).alias("k", "h"),
    )
    per = hk.groupBy("id", "k").agg(F.min("h").alias("m"))
    return per.groupBy("id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("k", "m"))), lambda s: s["m"]
        ).alias("sig")
    )


# (session, corpus hash, num_hashes, bands, n, cols) -> persisted banded
# relation (id, band, bh). The banded signature table IS the LSH index —
# built once per corpus and reused across queries, like dgraph's
# persistent term/trigram index tablets.
_MINHASH_INDEX_CACHE: dict[tuple, DataFrame] = {}
_ALL_CACHES.append(_MINHASH_INDEX_CACHE)


def _minhash_band_index(
    docs: DataFrame, sh: DataFrame, num_hashes: int, bands: int, n: int,
    text_col: str, id_col: str,
) -> DataFrame:
    rows = num_hashes // bands
    ck = _corpus_key(docs, num_hashes, bands, n, text_col, id_col)
    if ck is not None and ck in _MINHASH_INDEX_CACHE:
        return _MINHASH_INDEX_CACHE[ck]
    sigs = minhash_signatures(docs, num_hashes, n, text_col, id_col, shingles=sh)
    # band key = xxhash64 of the comma-joined signature segment: the
    # segment STRING is what the DuckDB oracle joins on, so candidate
    # sets agree up to a 2^-64 band-key collision; the 8-byte hash keeps
    # the shuffle narrow at scale.
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows + r + 1).cast("string")
                                for r in range(rows)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    banded.count()
    if ck is not None:
        _MINHASH_INDEX_CACHE[ck] = banded
    return banded


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH + exact-jaccard verification
    of the candidates (shingle re-check). The band join replaces the
    all-pairs comparison: candidates ~ true-positive pairs + collisions.
    """
    # one persisted shingle relation feeds BOTH the signatures and the
    # exact-jaccard verification (shingling is the CPU-heavy step)
    sh, _n_docs = _materialized_shingles(docs, text_col, id_col, n)
    banded = _minhash_band_index(docs, sh, num_hashes, bands, n, text_col, id_col)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bh"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
        .distinct()
    )
    # verify candidates with exact jaccard (precision = 1)
    out = (
        cand.join(sh.select(F.col("id").alias("i"), F.col("sh").alias("sha")), "i")
        .join(sh.select(F.col("id").alias("j"), F.col("sh").alias("shb")), "j")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jac",
            F.col("inter") / (F.size("sha") + F.size("shb") - F.col("inter")),
        )
        .where(F.col("jac") >= threshold)
        .select("i", "j", F.round("jac", 4).alias("jac"))
    )
    return out


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash long): 60-bit SimHash over word tokens — per-bit
    majority vote of token hashes. The token hash is the engine-portable
    md5-60bit (_md5_60), so the DuckDB CORRECTNESS oracle reproduces the
    exact simhash values; bits 60-63 are always 0.

    Relational formulation: explode tokens -> posexplode the 60 sign
    contributions -> groupBy(id, bit) partial-sum (map-side combine) ->
    rebuild the bitmap. 60 single-expression aggregates would re-evaluate
    the token-hash array once per bit; this shape is one pass + one
    shuffle and scales linearly."""
    words = F.filter(F.split(F.lower(F.col(text_col)), TERM_SPLIT_RE), lambda t: t != "")
    tok = docs.select(F.col(id_col).alias("id"), F.explode(words).alias("w")).select(
        "id", _md5_60(F.col("w")).alias("h")
    )
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda b: F.when(F.getbit(F.col("h"), b) == 1, 1).otherwise(-1),
    )
    votes = (
        tok.select("id", F.posexplode(signs).alias("bit", "s"))
        .groupBy("id", "bit")
        .agg(F.sum("s").alias("v"))
    )
    # shiftleft() only takes a literal shift — use expr for a column shift
    bitval = F.expr("shiftleft(1L, CAST(bit AS INT))")
    return (
        votes.groupBy("id")
        .agg(F.sum(F.when(F.col("v") > 0, bitval).otherwise(F.lit(0))).alias("simhash"))
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs within Hamming distance via 4-band block join (any pair with
    dist <= 3 shares at least one of 4 16-bit bands — pigeonhole)."""
    sims = simhash64(docs, text_col, id_col)
    banded = sims.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "key"),
    )
    # the Hamming check runs in the join condition (round 11; honest
    # plan accounting: Catalyst was ALREADY pushing the post-distinct
    # filter through the aggregate into the join — non-near collisions
    # never crossed the exchange in either form). What the explicit
    # form buys (guide §2.3): the dedup exchange carries (i, j, dist)
    # instead of (i, j, ha, hb) — one fewer long per row — and
    # bit_count is no longer recomputed from the carried signatures
    # after the aggregation. Filter-then-distinct == distinct-then-
    # filter (dist is a pure function of the pair).
    dist = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .where((F.col("a.id") < F.col("b.id")) & (dist <= max_hamming))
        .select(
            F.col("a.id").alias("i"),
            F.col("b.id").alias("j"),
            dist.alias("dist"),
        )
        .distinct()
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.98,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-duplicate pairs. With ``block_col`` the comparison is
    restricted to equal blocks (k-means cluster, label, LSH bucket —
    SemDeDup's within-cluster restriction); without it, an all-pairs
    comparison guarded by ALL_PAIRS_ROW_CAP (an unguarded product at
    10^7 rows is 10^14 comparisons — fail loudly instead; use
    embedding_near_dups_lsh for unblocked corpora).

    Execution is a within-block GEMM (applyInPandas): each block's
    vectors cross the Arrow boundary ONCE and the pairwise cosines come
    from chunked float64 matrix multiplies — a pair JOIN would ship two
    d-dim vectors per candidate (O(pairs*d) bytes vs O(rows*d)),
    measured 2x slower even with a vectorized per-pair dot. Memory is
    bounded by CHUNK x block_rows score cells per task; a block must
    fit one executor (blocks are corpus/n_clusters by construction —
    re-cluster or LSH-shard a monster block)."""
    if block_col is None:
        n = vectors.count()
        if n > ALL_PAIRS_ROW_CAP:
            raise ValueError(
                f"embedding_near_dups without block_col is all-pairs "
                f"(O(n^2)): {n} rows exceeds ALL_PAIRS_ROW_CAP="
                f"{ALL_PAIRS_ROW_CAP}. Pass block_col= or use "
                f"embedding_near_dups_lsh() for hyperplane-bucketed "
                f"candidate generation."
            )

    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        (F.col(block_col) if block_col else F.lit(0)).alias("blk"))
    return (
        v.groupBy("blk")
        .applyInPandas(_block_cosine_pairs(threshold), "i long, j long, cos double")
        .select("i", "j", F.round("cos", 4).alias("cos"))
    )


def _block_cosine_pairs(threshold: float):
    """Pandas grouped-map kernel: all within-block cosine pairs >=
    threshold, i < j by id. Chunked so the score matrix stays bounded
    regardless of block size."""
    def emit(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"i": pd.Series(dtype="int64"),
                              "j": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        m = len(pdf)
        if m < 2:
            return empty
        pdf = pdf.sort_values("id")
        mat = np.stack(pdf["v"].to_numpy()).astype("float64", copy=False)
        ids = pdf["id"].to_numpy()
        nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        nrm[nrm == 0.0] = 1.0  # zero vectors match nothing either way
        cols = np.arange(m)
        out = [empty]
        chunk = max(1, (4 << 20) // m)  # <= ~4M score cells in flight
        for s in range(0, m, chunk):
            e = min(s + chunk, m)
            scores = (mat[s:e] @ mat.T) / np.outer(nrm[s:e], nrm)
            mask = (scores >= threshold) & (cols[None, :] > np.arange(s, e)[:, None])
            ii, jj = np.nonzero(mask)
            if ii.size:
                out.append(pd.DataFrame({"i": ids[s + ii], "j": ids[jj],
                                         "cos": scores[ii, jj]}))
        return pd.concat(out, ignore_index=True)

    return emit


def lsh_planes(
    dim: int, num_tables: int, bits_per_table: int, seed: int = 0x5EED
) -> list[list[list[float]]]:
    """Deterministic Gaussian hyperplanes [table][bit][dim] — shared by
    the Spark operator and its DuckDB oracle twin (literal injection)."""
    rng = _random.Random(seed)
    return [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(bits_per_table)]
        for _ in range(num_tables)
    ]


def embedding_near_dups_lsh(
    vectors: DataFrame,
    threshold: float = 0.98,
    dim: int | None = None,
    num_tables: int = 4,
    bits_per_table: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0x5EED,
) -> DataFrame:
    """Cosine near-dup pairs over an UNBLOCKED corpus via hyperplane-LSH
    candidate generation: L independent k-bit signatures, pairs sharing
    any (table, bucket) are candidates, verified with exact cosine.
    Recall ~ 1-(1-p^k)^L where p = 1 - angle/pi — high for
    near-duplicates (angle -> 0) by construction. Replaces the O(n^2)
    cross join with L equi-joins on 2^k buckets — the 100 TB path."""
    from dgraph_spark.operators.similarity import _norm, lsh_bucket, pair_dot_vec

    if dim is None:
        first = vectors.select(F.size(vec_col)).limit(1).collect()
        if not first:
            return vectors.sparkSession.createDataFrame(
                [], "i long, j long, cos double")
        dim = first[0][0]
    all_planes = lsh_planes(dim, num_tables, bits_per_table, seed)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    v = v.withColumn("_n", _norm(F.col("v"))).persist(StorageLevel.MEMORY_AND_DISK)
    tables = []
    for t in range(num_tables):
        planes = all_planes[t]
        tables.append(
            lsh_bucket(v, planes, id_col="id", vec_col="v")
            .select("id", (F.col("bucket") + F.lit(t << bits_per_table)).alias("bkt"))
        )
    banded = tables[0]
    for t in tables[1:]:
        banded = banded.unionByName(t)
    cand = (
        banded.alias("a").join(banded.alias("b"), "bkt")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
        .distinct()
    )
    side = lambda nm, out: v.select(  # noqa: E731
        F.col("id").alias(nm), F.col("v").alias(f"v{out}"), F.col("_n").alias(f"n{out}"))
    cos = pair_dot_vec(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(side("i", "a"), "i").join(side("j", "b"), "j")
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("i", "j", F.round("cos", 4).alias("cos"))
    )


def near_dup_clusters(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidates_per_doc: float | None = JACCARD_CANDIDATES_PER_DOC_CAP,
) -> DataFrame:
    """Near-duplicate CLUSTERS: the transitive closure of the exact
    jaccard pair graph, labeled by the smallest member id — the form a
    training-data pipeline consumes ("keep one representative per
    cluster"). Returns (id, cluster, keep) for every document in a
    cluster of size >= 2; `keep` marks the canonical (minimum-id)
    member. Pair generation is the PPJoin path; the closure is
    pointer-jumped min-label propagation (same plan as
    graph_algos.connected_components, one job per round)."""
    pairs = ngram_jaccard_pairs(docs, threshold, n, text_col, id_col,
                                max_candidates_per_doc)
    return min_label_closure(pairs)


def min_label_closure(pairs: DataFrame) -> DataFrame:
    """Transitive closure of an (i, j) pair graph as (id, cluster,
    keep): min-label propagation with pointer jumping, one probe action
    per round (shared by the jaccard and embedding cluster operators)."""
    sym = pairs.select(F.col("i").alias("a"), F.col("j").alias("b")).unionByName(
        pairs.select(F.col("j").alias("a"), F.col("i").alias("b")))
    # materialize the pair graph ONCE: every propagation round joins
    # against sym, and without this each round re-executes the full
    # candidate-pair generation (cosine block join / PPJoin) — 5x wall
    # on the embedding path at sf0.1. The pair set is threshold-bounded
    # and orders of magnitude smaller than the corpus.
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "cluster", F.col("id"))

    def _round(lbl: DataFrame) -> DataFrame:
        neigh = sym.join(lbl, sym.a == lbl.id, "inner").select(
            F.col("b").alias("id"), "cluster")
        propagated = (lbl.unionByName(neigh).groupBy("id")
                      .agg(F.min("cluster").alias("cluster")))
        roots = propagated.select(F.col("id").alias("cluster"),
                                  F.col("cluster").alias("_root"))
        return (propagated.join(roots, "cluster", "left")
                .select("id", F.least(F.coalesce(F.col("_root"),
                                                 F.col("cluster")),
                                      F.col("cluster")).alias("cluster"))
                .localCheckpoint(eager=False))

    def _sum(lbl: DataFrame) -> DataFrame:
        return lbl.agg(
            F.sum(F.col("cluster").cast("decimal(38,0)")).alias("s"))

    # Rounds run in PAIRS with one probe action per pair, under the
    # small-loop conf (round 10, same ritual as connected_components:
    # labels are per-node nonincreasing under min-propagation, so equal
    # consecutive label sums prove the second round changed nothing;
    # the pair graph is threshold-bounded and tiny relative to the
    # corpus, so the default shuffle width was pure per-round overhead).
    from dgraph_spark.model import SmallLoopConf

    loop_conf = SmallLoopConf(pairs.sparkSession)
    prev_sum = None
    try:
        loop_conf.adapt(sym.count())
        for _ in range(0, 20, 2):
            l1 = _round(labels)
            l2 = _round(l1)
            # key the two probe aggregates by an explicit round marker —
            # union output ORDER is not contractually guaranteed, and a
            # positional unpack would silently corrupt the convergence
            # test if a future planner reordered the legs
            probe = {r["r"]: r["s"] for r in
                     _sum(l1).withColumn("r", F.lit(1)).unionAll(
                         _sum(l2).withColumn("r", F.lit(2))).collect()}
            s1, s2 = probe[1], probe[2]
            if s1 == prev_sum:
                break
            if s1 == s2:
                labels = l2
                break
            labels, prev_sum = l2, s2
    finally:
        loop_conf.exit()
    return labels.select(
        "id", "cluster", (F.col("id") == F.col("cluster")).alias("keep"))


def ordered_windows(words: Column, n: int) -> Column:
    """All n-token windows of a token array, in document order and WITH
    duplicates (unlike word_shingles, which is the distinct set) —
    occurrence counts matter for span-level dedup. Same incremental
    zip_with construction (O(n * words), never re-tokenizes); pass a
    bound column reference so the n-1 copies of `words` inside the
    zip_with tree are attribute lookups, not re-evaluated expressions."""
    grams = words
    for j in range(1, n):
        shifted = F.slice(words, j + 1, F.greatest(F.size(words) - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    # zip_with pads the shorter side with null -> incomplete trailing
    # windows become null concats; drop them
    return F.filter(grams, lambda g: g.isNotNull())


def duplicate_spans(
    docs: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated n-token spans across documents — the
    word-aligned form of the substring dedup in Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"):
    every distinct n-token window occurring in at least ``min_docs``
    documents, with (span, n_docs, n_occ).

    Plan shape: tokenize + window per row (narrow, no shuffle), explode,
    ONE aggregation. Map-side partial agg collapses within-document
    repeats before the shuffle; the min_docs filter runs post-agg.
    The groupBy is keyed on TWO independent xxhash64 values of the
    span — 128 bits, collision-free at any realistic corpus size —
    instead of the raw n-token text (round 11, guide §2.3). Honest
    accounting of what that buys (plan-verified): shuffle BYTES are
    roughly unchanged — the span still crosses the first exchange once
    per (group, doc) row, as the min() partial state instead of the
    key — but grouping now hashes/compares/sorts 16-byte fixed-width
    keys instead of variable-length ~10-token strings, and the
    min(string) buffer flips the plan HashAggregate → SortAggregate
    (streams; no string-keyed hash map per partition). Measured
    (interleaved in-process 6-rep medians, round 11): 2.02 → 1.80 s at
    sf0.1, 3.3 → 3.05 s at sf1, identical output. The
    decide-small-then-rejoin alternative (counts by hash only,
    broadcast survivors back onto a recomputed span stream) measured
    ~1.55x SLOWER at both SFs — the second tokenize pass costs more
    than the narrow shuffle saves. Within a hash group every span
    value is identical, so min(span) IS the span and the output is
    unchanged."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), TERM_SPLIT_RE),
                    lambda t: t != "")
    per_doc = (
        compute_spread(docs)
        .select(F.col(id_col).alias("id"), toks.alias("toks"))
        .select("id", F.explode(ordered_windows(F.col("toks"), n)).alias("span"))
    )
    return (
        per_doc.groupBy(F.xxhash64("span").alias("_h1"),
                        F.xxhash64(F.lit(1), "span").alias("_h2"))
        .agg(F.min("span").alias("span"),
             F.count_distinct(F.col("id")).alias("n_docs"),
             F.count("*").alias("n_occ"))
        .where(F.col("n_docs") >= min_docs)
        .select("span", "n_docs", "n_occ")
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.98,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cosine near-dup pairs over an embedding column (blocked by
    ``block_col`` — cluster/LSH-bucket id — which IS SemDeDup's
    "within k-means cluster" restriction), closed transitively and
    labeled with a canonical minimum-id representative. Returns
    (id, cluster, keep) for every vector in a semantic-dup group of
    size >= 2; the pipeline keeps ``keep`` rows and drops the rest.

    Scale shape: pair generation never goes all-pairs when blocked
    (equi-join on the block key); the closure is the same pointer-
    jumped min-label loop as connected_components. Degenerate blocks
    (one giant cluster) bound the pair count by the cosine threshold
    itself — at SemDeDup's operating point (eps ~ 0.02-0.05 cosine
    distance) groups are tiny."""
    pairs = embedding_near_dups(vectors, threshold, block_col,
                                id_col, vec_col)
    return min_label_closure(pairs.select("i", "j"))
