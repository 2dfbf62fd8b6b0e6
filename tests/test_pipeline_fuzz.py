"""Randomized differential tests for the round-8 pipeline additions:
each operator's Spark column program vs an independently-written
pure-Python reimplementation of the same spec (the python leg shares
no Spark expression code, so a bug must be in the spec to escape).
"""

import hashlib
import random

import pytest


def _py_c4(text: str, min_words: int, min_lines: int):
    """Independent reimplementation of the C4 rules (string ops, no
    regex except the terminal-punct test)."""
    import re

    lines = [l for l in text.split("\n") if l.strip() != ""]
    kept = []
    for l in lines:
        t = l.strip()
        words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]
        if re.search(r'[.!?"]$', t) and len(words) >= min_words:
            kept.append(l)  # the operator keeps the line as written
    low = text.lower()
    bad = "{" in low or "}" in low or "lorem ipsum" in low
    keep = (not bad) and len(kept) >= min_lines
    return {
        "keep": keep,
        "n_lines": len(lines),
        "n_kept": len(kept),
        "clean_text": "\n".join(kept) if keep else None,
    }


@pytest.mark.parametrize("seed", [20260816, 31, 77])
def test_c4_line_clean_fuzz(spark, seed):
    from dgraph_spark.operators.pipeline_text import c4_line_clean

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "lorem", "ipsum",
             "code", "word", "line"]
    ends = [".", "!", "?", '"', "", " ", ";"]
    docs = []
    for i in range(60):
        nlines = rng.randint(0, 6)
        lines = []
        for _ in range(nlines):
            n = rng.randint(0, 6)
            line = (" " * rng.randint(0, 2)
                    + " ".join(rng.choice(vocab) for _ in range(n))
                    + rng.choice(ends) + " " * rng.randint(0, 2))
            lines.append(line)
        text = "\n".join(lines)
        if rng.random() < 0.15:
            text += "\n{ }"
        docs.append((i, text))
    mw, ml = rng.randint(1, 4), rng.randint(1, 3)
    out = {r["doc_id"]: r for r in c4_line_clean(
        spark.createDataFrame(docs, "doc_id long, text string"),
        min_words=mw, min_lines=ml).collect()}
    for i, text in docs:
        want = _py_c4(text, mw, ml)
        got = out[i]
        for k, v in want.items():
            assert got[k] == v, (i, k, repr(text), got[k], v)


def _hex_frac(frac: float) -> str:
    return format(min(int(frac * 2**32), 2**32 - 1), "08x")


@pytest.mark.parametrize("seed", [20260816, 31, 77])
def test_domain_mix_fuzz(spark, seed):
    from dgraph_spark.operators.pipeline_text import domain_mix

    rng = random.Random(seed)
    doms = [f"d{k}" for k in range(rng.randint(2, 5))]
    weights = {d: rng.choice([0.0, 0.3, 1.0, 1.5, 2.25, 3.0])
               for d in doms[:-1]}  # last domain takes the 1.0 default
    rows = [(i, rng.choice(doms)) for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {}
    for r in domain_mix(docs, weights).collect():
        got.setdefault((r["doc_id"], r["domain"]), []).append(r["copy"])
    for i, dom in rows:
        w = weights.get(dom, 1.0)
        u = hashlib.md5(f"{i}|{dom}".encode()).hexdigest()[:8]
        k = int(w) + (1 if u < _hex_frac(w - int(w)) else 0)
        assert sorted(got.get((i, dom), [])) == list(range(k)), (i, dom)


@pytest.mark.parametrize("seed", [20260816, 31, 77])
def test_hash_split_fuzz(spark, seed):
    from dgraph_spark.operators.pipeline_text import hash_split

    rng = random.Random(seed)
    n = rng.randint(2, 5)
    cuts = sorted(rng.random() for _ in range(n - 1))
    fracs = {}
    prev = 0.0
    for j, c in enumerate(cuts):
        fracs[f"s{j}"] = c - prev
        prev = c
    fracs[f"s{n-1}"] = 1.0 - prev
    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = {r["doc_id"]: r["split"]
           for r in hash_split(docs, fracs).collect()}
    bounds, acc = [], 0.0
    names = list(fracs)
    for name in names[:-1]:
        acc += fracs[name]
        bounds.append((name, _hex_frac(min(acc, 1.0))))
    for i in range(200):
        h = hashlib.md5(f"split|{i}".encode()).hexdigest()[:8]
        want = next((nm for nm, b in bounds if h < b), names[-1])
        assert out[i] == want, (i, h)


def test_bpe_unicode_punct_fuzz():
    """rank-greedy == in-order on words with accents, CJK, digits and
    punctuation glued on (the normalized-text token shapes)."""
    from dgraph_spark.operators.bpe import encode_word
    from tools import naive_bpe as naive

    rng = random.Random(9)
    chars = "abcéüñ漢字99.,!-"
    wf = {}
    for _ in range(120):
        w = "".join(rng.choice(chars) for _ in range(rng.randint(1, 9)))
        wf[w] = wf.get(w, 0) + rng.randint(1, 4)
    merges = naive.train(wf, 60)
    ranks = {p: i for i, p in enumerate(merges)}
    for _ in range(400):
        w = "".join(rng.choice(chars) for _ in range(rng.randint(1, 12)))
        got = encode_word(w, ranks)
        assert got == naive.encode_word(w, merges), w
        assert "".join(got) == w + naive.EOW


def test_prepare_corpus_recipe(spark):
    """End-to-end recipe: stages compose without re-deriving semantics
    — survivors pass the quality filter, exact-dup losers and
    benchmark-contaminated docs are gone, every survivor has a split
    and consistent pack offsets."""
    from tests.conftest import SF_SMALL

    from dgraph_spark.operators.recipes import prepare_corpus

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    bench = docs.orderBy("doc_id").limit(3).select("doc_id", "text")
    out = prepare_corpus(docs, bench, pack_budget=256,
                         split_fracs={"train": 0.9, "test": 0.1})
    corpus = out["corpus"].collect()
    report = out["report"].collect()
    assert corpus and report
    ids = {r["doc_id"] for r in corpus}
    # the benchmark docs themselves share all their n-grams -> dropped
    assert not ids & {0, 1, 2}
    assert {r["split"] for r in corpus} <= {"train", "test"}
    # offsets form a consistent stream per (source, split)
    seen = {}
    for r in sorted(corpus, key=lambda r: (r["source"], r["split"],
                                           r["doc_id"])):
        k = (r["source"], r["split"])
        assert r["tok_offset"] == seen.get(k, 0)
        seen[k] = r["tok_offset"] + r["n_tokens"]
    # report covers every surviving stratum
    assert {r["source"] for r in report} >= {r["source"] for r in corpus}


def _py_perplexity(texts_by_id: dict, alpha=0.4):
    """Independent bigram-LM reimplementation (pure dicts)."""
    import math
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    toks = {i: [w for w in ws.split(t.lower()) if w]
            for i, t in texts_by_id.items()}
    uni, big = {}, {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for i, t in toks.items():
        lps = [math.log((big.get((a, b), 0) + alpha)
                        / (uni.get(a, 0) + alpha * v))
               for a, b in zip(t, t[1:])]
        if not lps:
            out[i] = (0, None, None)
        else:
            m = sum(lps) / len(lps)
            out[i] = (len(lps), round(m, 4), round(math.exp(-m), 4))
    return out


@pytest.mark.parametrize("seed", [20260816, 31])
def test_lm_perplexity_fuzz(spark, seed):
    from dgraph_spark.operators.ngram_lm import perplexity_report

    rng = random.Random(seed)
    vocab = ["the", "cat", "sat", "mat", "dog", "ran", "far", "zip"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 20))))
            for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
           for r in perplexity_report(docs).collect()}
    want = _py_perplexity(dict(rows))
    assert len(got) == len(want)
    for i in want:
        gn, ga, gp = got[i]
        wn, wa, wp = want[i]
        assert gn == wn, i
        if wa is None:
            assert ga is None and gp is None, i
        else:
            assert abs(ga - wa) < 2e-4 and abs(gp - wp) < 2e-3, (
                i, got[i], want[i])


def test_lm_perplexity_repetition_scores_lower_ppl(spark):
    """Self-perplexity intuition check: a highly repetitive doc is
    MORE predictable under the corpus model than a shuffled one."""
    from dgraph_spark.operators.ngram_lm import perplexity_report

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam spam spam"),
         (2, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["ppl"]
           for r in perplexity_report(docs).collect()}
    assert out[1] < out[2]


def test_lm_broadcast_guard_degrades_to_shuffle(spark, monkeypatch):
    """Past BROADCAST_ROW_CAP the model joins must NOT carry a
    broadcast hint (an unconditional hint on a tens-of-billions-row
    bigram table does not fail gracefully) — and the shuffle-join
    scores must be identical."""
    from dgraph_spark.operators import ngram_lm

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the dog sat on the log"),
         (3, "one token"),
         (4, "x")],
        "doc_id long, text string")
    with ngram_lm.train_bigram_lm(docs) as model:
        assert model.n_bigrams > 0 and model.vocab > 0
        fast = ngram_lm.lm_perplexity(docs, model)
        assert "ResolvedHint" in \
            fast._jdf.queryExecution().analyzed().toString()
        monkeypatch.setattr(ngram_lm, "BROADCAST_ROW_CAP", 0)
        slow = ngram_lm.lm_perplexity(docs, model)
        assert "ResolvedHint" not in \
            slow._jdf.queryExecution().analyzed().toString()
        assert sorted(map(tuple, fast.collect())) \
            == sorted(map(tuple, slow.collect()))


def _py_bm25(texts_by_id: dict, query: str, k: int):
    import math
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    toks = {i: [w for w in ws.split(t.lower()) if w]
            for i, t in texts_by_id.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    terms = sorted({w for w in ws.split(query.lower()) if w})
    out = []
    for i, t in toks.items():
        if not set(t) & set(terms):
            continue
        sc = 0.0
        for term in terms:
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            tf = float(t.count(term))
            sc += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
        out.append((i, round(sc, 4)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


@pytest.mark.parametrize("seed", [20260816, 31])
def test_bm25_fuzz(spark, seed):
    from dgraph_spark.operators.bm25 import bm25_search

    rng = random.Random(seed)
    vocab = ["the", "cat", "sat", "mat", "dog", "ran", "far", "zip",
             "qux", "rare"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 30))))
            for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for q in ["cat dog", "rare", "zip qux the", "missingword cat"]:
        got = [(r["doc_id"], r["score"])
               for r in bm25_search(docs, q, k=7).collect()]
        want = _py_bm25(dict(rows), q, 7)
        assert got == want, (q, got, want)


def test_bm25_rare_term_outranks_common(spark):
    from dgraph_spark.operators.bm25 import bm25_search

    docs = spark.createDataFrame(
        [(1, "common common common rare"),
         (2, "common common common common"),
         (3, "common other words here")],
        "doc_id long, text string")
    top = bm25_search(docs, "rare common", k=3).collect()
    assert top[0]["doc_id"] == 1  # the rare term dominates


def test_bm25_rejects_empty(spark):
    from dgraph_spark.operators.bm25 import bm25_search

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty query"):
        bm25_search(docs, "   ")


def test_bm25_corpus_stats_cached(spark):
    """The stats pass (N, avgdl, df) is per-corpus state: the second
    search on the same DataFrame must trigger NO Spark job inside
    bm25_search (job count via a job group), and a new term must cost
    exactly ONE job (df for the missing term only)."""
    from dgraph_spark.operators.bm25 import bm25_search

    docs = spark.createDataFrame(
        [(i, "cat dog sat rare mat"[: 3 + (i % 3) * 4]) for i in range(20)],
        "doc_id long, text string")
    sc = spark.sparkContext
    group = "bm25-cache-test"
    sc.setJobGroup(group, "bm25 cache test")
    try:
        def njobs():
            return len(sc.statusTracker().getJobIdsForGroup(group))

        df1 = bm25_search(docs, "cat dog", k=3)
        after_first = njobs()
        assert after_first >= 1  # the stats aggregate ran
        df2 = bm25_search(docs, "dog cat", k=3)  # same term set
        assert njobs() == after_first  # cache hit: zero new jobs
        df3 = bm25_search(docs, "cat sat", k=3)  # one missing term
        after_miss = njobs()
        assert after_miss > after_first  # df(sat) had to run
        bm25_search(docs, "sat cat dog", k=3)  # all terms now cached
        assert njobs() == after_miss  # zero new jobs again
        assert [tuple(r) for r in df1.collect()] \
            == [tuple(r) for r in df2.collect()]
        assert df3.count() >= 0
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)


def test_bm25_query_tokenizer_matches_doc_spec(spark):
    """Documents tokenize on ASCII whitespace only (norm_tokens):
    a non-breaking space is PART of a token. The query tokenizer must
    agree, or 'cat\\xa0dog' as a query could never match the document
    token 'cat\\xa0dog'."""
    from dgraph_spark.operators.bm25 import bm25_search, query_terms

    assert query_terms("CAT\xa0dog sat") == ["cat\xa0dog", "sat"]
    docs = spark.createDataFrame(
        [(1, "cat\xa0dog sat"), (2, "plain words here")],
        "doc_id long, text string")
    top = bm25_search(docs, "cat\xa0dog", k=2).collect()
    assert [r["doc_id"] for r in top] == [1]


def _py_line_stats(text: str):
    # space-only trim — the engine (F.trim) and the DuckDB twin (trim)
    # both strip ASCII spaces, NOT tabs; str.strip() would diverge on
    # tab-padded lines
    lines = [l.strip(" ") for l in text.split("\n")]
    lines = [l for l in lines if l]
    n = len(lines)
    if n == 0:
        return (0, 0.0, 0.0)
    nd = len(set(lines))
    chars = sum(len(l) for l in lines)
    dupchars = sum((lines.count(d) - 1) * len(d) for d in set(lines))
    return (n, round(1.0 - nd / n, 4),
            round(dupchars / chars, 4) if chars > 0 else 0.0)


@pytest.mark.parametrize("seed", [20260816, 77])
def test_line_stats_fuzz(spark, seed):
    from dgraph_spark.operators.textstats import line_repetition_stats

    rng = random.Random(seed)
    frags = ["aa bb", "cc", "dd ee ff", "  ", "", "gg", " \tcc ",
             "\t", "zz\t  "]
    rows = [(i, "\n".join(rng.choice(frags)
                          for _ in range(rng.randint(0, 12))))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["dup_line_frac"],
                         r["dup_line_char_frac"])
           for r in line_repetition_stats(docs).collect()}
    for i, text in rows:
        assert got[i] == _py_line_stats(text), (i, text)


@pytest.mark.parametrize("seed", [20260816, 78])
def test_blocklist_fuzz(spark, seed):
    from dgraph_spark.operators.textstats import blocklist_filter

    rng = random.Random(seed)
    vocab = ["safe", "fine", "BadWord", "sketchy", "ok", "worse stuff"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 15))))
            for i in range(120)]
    phrases = ["badword", "worse STUFF", "absent"]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], r["n_hits"])
           for r in blocklist_filter(docs, phrases).collect()}
    for i, text in rows:
        hits = sum(1 for p in phrases if p.lower() in text.lower())
        assert got[i] == (hits == 0, hits), (i, text)


def _py_rep_stats(text: str):
    """Independent reimplementation of repetition_stats (Counter-based;
    the engine now computes top counts via sorted max-run aggregates,
    so this leg guards the run-length/tie-break equivalence)."""
    import re
    from collections import Counter

    toks = [w for w in re.split(r"[\W_]+", text.lower(), flags=re.UNICODE)
            if w]
    n = len(toks)
    if n == 0:
        return (0, 0.0, 0.0, 0.0)
    cnt = Counter(toks)
    dupf = round(1.0 - len(cnt) / n, 4)
    topf = round(max(cnt.values()) / n, 4)
    if n >= 2:
        grams = Counter(" ".join(p) for p in zip(toks, toks[1:]))
        mx = max(grams.values())
        g = max(k for k, v in grams.items() if v == mx)  # tie: greatest
        bigf = round(mx * len(g) / len(" ".join(toks)), 4)
    else:
        bigf = 0.0
    return (n, dupf, topf, bigf)


@pytest.mark.parametrize("seed", [20260816, 41])
def test_repetition_stats_fuzz(spark, seed):
    from dgraph_spark.operators.textstats import repetition_stats

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd"]  # tiny vocab -> many count ties
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 25))))
            for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_token_frac"],
                         r["top_token_frac"], r["top_bigram_char_frac"])
           for r in repetition_stats(docs).collect()}
    for i, text in rows:
        assert got[i] == _py_rep_stats(text), (i, text)
