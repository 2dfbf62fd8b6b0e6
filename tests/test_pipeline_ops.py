"""Training-data pipeline operators: dedup, text stats, multimodal."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_exact_duplicates_synthetic(spark):
    from dgraph_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = exact_duplicates(df).collect()
    assert len(out) == 1
    assert out[0]["ids"] == [1, 2]


def test_ngram_jaccard_finds_planted_dups(docs):
    from dgraph_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, threshold=0.7).collect()
    assert len(pairs) > 0
    assert all(r["jac"] >= 0.7 for r in pairs)


def test_minhash_lsh_recall_vs_exact(docs):
    from dgraph_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {(r["i"], r["j"]) for r in ngram_jaccard_pairs(docs, 0.7).collect()}
    lsh = {(r["i"], r["j"]) for r in minhash_lsh_pairs(docs, 0.7).collect()}
    assert lsh <= exact  # exact verification => precision 1
    assert len(lsh) >= 0.8 * len(exact)  # banded LSH recall at 0.7


def test_simhash_pairs(docs):
    from dgraph_spark.operators.dedup import simhash_near_pairs

    pairs = simhash_near_pairs(docs, max_hamming=3).collect()
    assert all(r["dist"] <= 3 for r in pairs)


def test_embedding_near_dups_blocked(spark):
    from dgraph_spark.operators.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = embedding_near_dups(emb, threshold=0.3, block_col="label")
    rows = out.collect()
    assert all(r["cos"] >= 0.3 for r in rows)


def test_text_stats(docs):
    from dgraph_spark.operators.textstats import text_stats

    out = text_stats(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["n_tokens"] > 0
    assert 0.0 <= r["quality"] <= 1.0
    assert len(r["fp"]) == 32
    langs = {r["lang_pred"] for r in rows}
    assert langs <= {"en", "fr", "de", "es", "und"}


def test_lang_id_markers(spark):
    from dgraph_spark.operators.textstats import lang_id

    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("le chat est dans la maison avec les autres",),
            ("der hund ist nicht mit der katze",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    got = [r["l"] for r in df.select(lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "fr", "de", "und"]


def test_multimodal_image_features(docs):
    from dgraph_spark.operators.multimodal import (
        extract_image_features,
        media_table_from_docs,
        sample_frames,
    )

    media = media_table_from_docs(docs.limit(20))
    feats = extract_image_features(media).collect()
    assert len(feats) == 20
    f = feats[0]
    assert f["width"] >= 1 and f["height"] >= 1
    assert len(f["feature"]) == 16
    assert abs(sum(f["feature"]) - 1.0) < 1e-6

    frames = sample_frames(media.limit(3), every_n_bytes=64)
    rows = frames.collect()
    assert len(rows) >= 3
    assert all(len(bytes(r["frame"])) <= 64 for r in rows)


@pytest.fixture(scope="module")
def docs_med(spark):
    from tests.conftest import SF_MED

    return spark.read.parquet(f"{SF_MED}/documents.parquet")


def test_minhash_lsh_measured_recall_sf001(docs_med):
    """Quantitative LSH check at sf0.01 (VERDICT r1 item 4): banded
    16x4 MinHash at t=0.7 must keep recall >= 0.9 against the exact
    jaccard pairs, with precision 1 from the verify step."""
    from dgraph_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {(r["i"], r["j"]) for r in ngram_jaccard_pairs(docs_med, 0.7).collect()}
    lsh = {(r["i"], r["j"]) for r in minhash_lsh_pairs(docs_med, 0.7).collect()}
    assert lsh <= exact
    assert len(exact) > 0
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(lsh)}/{len(exact)})"


def test_simhash_banded_join_is_exact_sf001(spark, docs_med):
    """Brute-force Hamming oracle at sf0.01 (VERDICT r1 item 4): the
    4-band pigeonhole join must return EXACTLY the all-pairs set within
    Hamming distance 3 — banding is a pruning, never a loss."""
    from dgraph_spark.operators.dedup import simhash64, simhash_near_pairs

    sims = simhash64(docs_med).cache()
    brute = {
        (r["i"], r["j"])
        for r in sims.alias("a").crossJoin(sims.alias("b"))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("i"), F.col("b.id").alias("j"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("d"),
        )
        .where(F.col("d") <= 3)
        .collect()
    }
    banded = {(r["i"], r["j"]) for r in simhash_near_pairs(docs_med, 3).collect()}
    assert banded == brute


def test_dedup_index_cache_detects_rewritten_parquet(spark, tmp_path):
    """Rewriting the parquet directory between calls must MISS the
    shingle cache even though the plan semanticHash is identical
    (ADVICE r3: stale persisted index returned wrong dedup results)."""
    import time

    from dgraph_spark.operators.dedup import _materialized_shingles

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id long, text string").write.mode("overwrite").parquet(p)
    sh1, n1 = _materialized_shingles(spark.read.parquet(p), "text", "doc_id", 2)
    assert n1 == 2
    time.sleep(1.1)  # ensure mtime tick
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "delta epsilon zeta")],
        "doc_id long, text string").write.mode("overwrite").parquet(p)
    sh2, n2 = _materialized_shingles(spark.read.parquet(p), "text", "doc_id", 2)
    assert n2 == 3  # fresh index, not the stale cached one
