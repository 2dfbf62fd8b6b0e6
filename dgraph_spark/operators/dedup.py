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

Everything is built-in column expressions (xxhash64, explode, windows);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dgraph_spark.functions.tokenizers import TERM_SPLIT_RE


def normalized(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical text form."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents: (fingerprint,
    ids, cnt) for cnt > 1."""
    return (
        docs.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"), F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def word_shingles(col: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles of the text."""
    words = F.filter(F.split(F.lower(col), TERM_SPLIT_RE), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT jaccard near-dup pairs (i < j) via shingle inverted index.

    Plan: explode shingles -> self-equi-join on shingle (computes
    |A∩B| as a count) -> join per-doc sizes -> jaccard filter. All
    shuffles key on shingle/doc id; no cartesian product anywhere.
    """
    sh = docs.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    ).where(F.size("sh") > 0)
    sizes = sh.select("id", F.size("sh").alias("sz"))
    posting = sh.select("id", F.explode("sh").alias("g"))
    inter = (
        posting.alias("a")
        .join(posting.alias("b"), "g")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("i"), F.col("sz").alias("szi")), "i")
        .join(sizes.select(F.col("id").alias("j"), F.col("sz").alias("szj")), "j")
        .withColumn("jac", F.col("inter") / (F.col("szi") + F.col("szj") - F.col("inter")))
        .where(F.col("jac") >= threshold)
        .select("i", "j", F.round("jac", 4).alias("jac"))
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures over word shingles.
    Hash family: xxhash64(shingle, seed_k) — JVM-side, vectorized."""
    sh = docs.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    ).where(F.size("sh") > 0)
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), lambda g, k=k: F.xxhash64(g, F.lit(k))))
            for k in range(num_hashes)
        ]
    )
    return sh.select("id", sig.alias("sig"))


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
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.hash(*[F.element_at("sig", b * rows + r + 1) for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bh"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bh"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
        .distinct()
    )
    # verify candidates with exact jaccard (precision = 1)
    sh = docs.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    )
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
    """(id, simhash long): 64-bit SimHash over word tokens — per-bit
    majority vote of token hashes, as a pure column expression."""
    words = F.filter(F.split(F.lower(F.col(text_col)), TERM_SPLIT_RE), lambda t: t != "")
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    # bit b of the simhash = 1 if sum over tokens of sign(bit b) > 0.
    # NB: the vote lambda must be binary (acc, h) — pyspark introspects
    # lambda arity — so bind the bit mask via a closure factory.
    def vote_fn(b: int):
        mask = (1 << b) if b < 63 else -(2**63)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    bit_votes = [F.aggregate(hashes, F.lit(0), vote_fn(b)) for b in range(64)]
    sim = F.lit(0).cast("long")
    for b, v in enumerate(bit_votes):
        bitval = F.lit(1 << b).cast("long") if b < 63 else F.lit(-(2**63)).cast("long")
        sim = sim + F.when(v > 0, bitval).otherwise(F.lit(0).cast("long"))
    return docs.select(F.col(id_col).alias("id"), sim.alias("simhash"))


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
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("i"),
            F.col("b.id").alias("j"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("dist") <= max_hamming)
        .select("i", "j", "dist")
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.98,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-duplicate pairs. With ``block_col`` the pair join is
    restricted to equal blocks (label, LSH bucket, ...) — the scale path;
    without it, an all-pairs comparison (only for small relations)."""
    from dgraph_spark.operators.similarity import _dot, _norm

    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                       *([F.col(block_col).alias("blk")] if block_col else []))
    on = ["blk"] if block_col else []
    a, b = v.alias("a"), v.alias("b")
    pairs = (a.join(b, on) if on else a.crossJoin(b)).where(F.col("a.id") < F.col("b.id"))
    cos = _dot(F.col("a.v"), F.col("b.v")) / (_norm(F.col("a.v")) * _norm(F.col("b.v")))
    return (
        pairs.select(
            F.col("a.id").alias("i"), F.col("b.id").alias("j"), cos.alias("cos")
        )
        .where(F.col("cos") >= threshold)
        .select("i", "j", F.round("cos", 4).alias("cos"))
    )
