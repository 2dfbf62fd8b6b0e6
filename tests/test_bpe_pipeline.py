"""BPE tokenizer + round-8 pipeline additions (c4_line_clean,
domain_mix): engine vs independent naive twins.

The BPE differential runs the engine's incremental trainer and
rank-greedy encoder against tools/naive_bpe's from-scratch trainer
and in-order encoder — same spec, different mechanics — over random
corpora, so a shared bug would have to be in the spec itself.
"""

import hashlib
import random

import pytest

from tests.conftest import SF_SMALL


# ---------------------------------------------------------------- BPE

def test_bpe_train_classic_example(spark):
    """Sennrich's running example: 'est·' forms within a few merges."""
    from dgraph_spark.operators.bpe import bpe_train

    rows = [(i, t) for i, t in enumerate(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, num_merges=6)
    built = {a + b for a, b in merges}
    assert "est" in built or "est·" in built


def test_bpe_train_matches_naive_trainer():
    """Incremental pair maintenance == from-scratch recount, on random
    word-frequency tables (driver-side only; train_from_word_freqs IS
    bpe_train's post-collect loop, so this exercises the engine code,
    not a copy)."""
    from dgraph_spark.operators.bpe import train_from_word_freqs
    from tools import naive_bpe as naive

    rng = random.Random(7)
    alphabet = "abcde"
    for trial in range(5):
        wf = {}
        for _ in range(60):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 8)))
            wf[w] = wf.get(w, 0) + rng.randint(1, 9)
        assert train_from_word_freqs(wf, 40) == naive.train(wf, 40), \
            f"trial {trial}"


def test_bpe_train_public_path_matches_naive(spark):
    """The real bpe_train (Spark word_frequencies + driver loop) ==
    naive trainer over the same texts."""
    from dgraph_spark.operators.bpe import bpe_train
    from tools import naive_bpe as naive

    rng = random.Random(11)
    texts = [" ".join("".join(rng.choice("abcd")
                              for _ in range(rng.randint(1, 6)))
                      for _ in range(rng.randint(3, 12)))
             for _ in range(40)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    assert bpe_train(docs, num_merges=30) == naive.train(
        naive.word_frequencies(texts), 30)


def test_bpe_encode_rank_greedy_matches_in_order():
    """encode_word (greedy by rank) == naive apply-in-order on fuzz
    words — the equivalence the module docstrings claim."""
    from dgraph_spark.operators.bpe import encode_word
    from tools import naive_bpe as naive

    rng = random.Random(3)
    wf = {}
    for _ in range(80):
        w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 10)))
        wf[w] = wf.get(w, 0) + rng.randint(1, 5)
    merges = naive.train(wf, 50)
    ranks = {p: i for i, p in enumerate(merges)}
    for _ in range(300):
        w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 12)))
        assert encode_word(w, ranks) == naive.encode_word(w, merges), w


def test_bpe_tokens_reconstruct_word():
    """Lossless: concatenating a word's tokens and stripping the
    end-of-word marker reproduces the word."""
    from dgraph_spark.operators.bpe import EOW, encode_word
    from tools import naive_bpe as naive

    rng = random.Random(5)
    wf = {"banana": 3, "bandana": 2, "cabana": 4, "ananas": 1}
    merges = naive.train(wf, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["banana", "cab", "nanana", "x", "bananabandana"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW
        assert toks[-1].endswith(EOW)
        assert not any(EOW in t for t in toks[:-1])


def test_bpe_encode_distributed_matches_naive(spark):
    """End-to-end: Spark mapInPandas encode over the sf0.001 documents
    == naive per-text counts, token arrays included."""
    from dgraph_spark.operators.bpe import bpe_encode, bpe_train
    from tools import naive_bpe as naive

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    merges = bpe_train(docs, num_merges=40)
    out = {r["doc_id"]: r for r in
           bpe_encode(docs, merges, with_tokens=True).collect()}
    rows = docs.select("doc_id", "text").collect()
    expected = naive.encode_corpus([r["text"] for r in rows], merges)
    assert len(out) == len(rows)
    for r, (n_words, n_tok) in zip(rows, expected):
        got = out[r["doc_id"]]
        assert got["n_words"] == n_words
        assert got["n_bpe_tokens"] == n_tok
    # spot-check one token array against the naive encoder, using the
    # module's ASCII-whitespace word spec (NOT str.split, which also
    # splits unicode whitespace)
    import re

    some = rows[0]
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    toks = []
    for w in ws.split((some["text"] or "").lower()):
        if w:
            toks.extend(naive.encode_word(w, merges))
    assert out[some["doc_id"]]["bpe_tokens"] == toks


def test_bpe_word_cap_raises(spark):
    from dgraph_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_words"):
        bpe_train(docs, num_merges=5, max_words=3)


# ------------------------------------------------------ c4_line_clean

def test_c4_line_clean_rules(spark):
    from dgraph_spark.operators.pipeline_text import c4_line_clean

    rows = [
        # two good lines -> kept, short/unterminated lines removed
        (1, "This line has enough words.\nshort.\n"
            "Another good line right here!\nno terminal punct here"),
        # curly brace anywhere drops the whole doc
        (2, "Good line one here.\nGood line two here.\nfunction() {"),
        # lorem ipsum drops the whole doc
        (3, "Lorem ipsum dolor sit amet.\nAnother fine line here."),
        # fewer than min_lines retained -> dropped
        (4, "Only one good line here.\nnope\nnah"),
        (5, 'Quoted line ends in a quote."\nSecond proper line here.'),
    ]
    out = {r["doc_id"]: r for r in c4_line_clean(
        spark.createDataFrame(rows, "doc_id long, text string"),
        min_words=3, min_lines=2).collect()}
    assert out[1]["keep"] and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == (
        "This line has enough words.\nAnother good line right here!")
    assert not out[2]["keep"] and out[2]["clean_text"] is None
    assert not out[3]["keep"]
    assert not out[4]["keep"] and out[4]["n_kept"] == 1
    assert out[5]["keep"] and out[5]["n_kept"] == 2
    assert out[1]["n_lines"] == 4


def test_c4_line_clean_counts_trim(spark):
    """Blank lines are not counted; leading/trailing space doesn't
    defeat the terminal-punctuation test."""
    from dgraph_spark.operators.pipeline_text import c4_line_clean

    df = spark.createDataFrame(
        [(1, "  A padded good line here.  \n\n   \nSecond good line.")],
        "doc_id long, text string")
    r = c4_line_clean(df, min_words=3, min_lines=1).collect()[0]
    assert r["n_lines"] == 2 and r["n_kept"] == 2 and r["keep"]


# --------------------------------------------------------- domain_mix

def _hex_u(doc_id, domain):
    return hashlib.md5(f"{doc_id}|{domain}".encode()).hexdigest()[:8]


def test_domain_mix_exact(spark):
    from dgraph_spark.operators.pipeline_text import (
        _hex_frac_literal, domain_mix)

    rows = [(i, "a" if i < 40 else ("b" if i < 80 else "c"))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_mix(docs, {"a": 2.5, "b": 0.25, "c": 0.0})
    got = {}
    for r in out.collect():
        got.setdefault((r["doc_id"], r["domain"]), []).append(r["copy"])
    # independent recomputation of the per-row copy count
    for i, dom in rows:
        w = {"a": 2.5, "b": 0.25, "c": 0.0}[dom]
        k = int(w) + (1 if _hex_u(i, dom) < _hex_frac_literal(w - int(w))
                      else 0)
        copies = got.get((i, dom), [])
        assert sorted(copies) == list(range(k)), (i, dom, k, copies)
    # c is fully dropped, a is always >= 2 copies
    assert all(dom != "c" for (_, dom) in got)
    # expectation sanity: b keeps roughly a quarter
    nb = sum(1 for (_, dom) in got if dom == "b")
    assert 2 <= nb <= 20


def test_domain_mix_default_weight(spark):
    from dgraph_spark.operators.pipeline_text import domain_mix

    docs = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, source string")
    out = domain_mix(docs, {"x": 3.0}).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], 0)
        by_dom[r["domain"]] += 1
    assert by_dom == {"x": 3, "y": 1}


def test_domain_mix_rejects_negative(spark):
    from dgraph_spark.operators.pipeline_text import domain_mix

    docs = spark.createDataFrame([(1, "x")], "doc_id long, source string")
    with pytest.raises(ValueError, match="negative"):
        domain_mix(docs, {"x": -1.0})


# --------------------------------------------------------- hash_split

def test_hash_split_deterministic_and_exhaustive(spark):
    from dgraph_spark.operators.pipeline_text import (
        _hex_frac_literal, hash_split)

    docs = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r["doc_id"]: r["split"]
           for r in hash_split(docs, fr).collect()}
    assert len(out) == 300
    # independent recomputation of every assignment
    acc, bounds = 0.0, []
    for name in ["train", "val"]:
        acc += fr[name]
        bounds.append((name, _hex_frac_literal(acc)))
    for i in range(300):
        h = hashlib.md5(f"split|{i}".encode()).hexdigest()[:8]
        want = next((n for n, b in bounds if h < b), "test")
        assert out[i] == want, (i, h, out[i], want)
    # roughly proportional
    ntr = sum(1 for v in out.values() if v == "train")
    assert 200 <= ntr <= 280


def test_hash_split_stable_under_growth(spark):
    """A document's split does not change when the corpus grows."""
    from dgraph_spark.operators.pipeline_text import hash_split

    fr = {"train": 0.5, "test": 0.5}
    small = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in hash_split(small, fr).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, fr).collect()}
    assert all(b[i] == a[i] for i in a)


def test_hash_split_validates_fractions(spark):
    from dgraph_spark.operators.pipeline_text import hash_split

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="sum"):
        hash_split(docs, {"a": 0.5, "b": 0.2})


def test_pack_sequences_by_bpe_counts(spark):
    """pack_sequences(tokens_col=...) packs by joined-in subword
    counts; offsets are the running sum of n_bpe_tokens in id order."""
    from dgraph_spark.operators.bpe import bpe_encode, bpe_train
    from dgraph_spark.operators.pipeline_text import pack_sequences

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(60)
    merges = bpe_train(docs, num_merges=20)
    counts = bpe_encode(docs, merges)
    joined = docs.select("doc_id", "source", "text").join(
        counts.select("doc_id", "n_bpe_tokens"), "doc_id")
    out = pack_sequences(joined, budget=256, stratum_col="source",
                         tokens_col="n_bpe_tokens").collect()
    rows = sorted(((r["source"], r["doc_id"], r["n_tokens"],
                    r["tok_offset"]) for r in out))
    acc = {}
    for src, _id, n, off in rows:
        assert off == acc.get(src, 0), (src, _id)
        acc[src] = acc.get(src, 0) + n
    got = {r["doc_id"]: r["n_tokens"] for r in out}
    want = {r["doc_id"]: r["n_bpe_tokens"]
            for r in counts.collect() if r["doc_id"] in got}
    assert got == want


def test_bpe_merges_roundtrip(spark):
    from dgraph_spark.operators.bpe import merges_from_df, merges_to_df
    from tools import naive_bpe as naive

    merges = naive.train({"banana": 3, "cabana": 2}, 12)
    assert merges_from_df(merges_to_df(spark, merges)) == merges
