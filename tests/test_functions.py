"""Tokenizer / scalar function tests (model: tok/tok_test.go)."""

import pyspark.sql.functions as F
import pytest

from dgraph_spark.functions import tokenizers as tok


@pytest.fixture(scope="module")
def one(spark):
    return spark.createDataFrame([("x",)], "dummy string")


def _eval(one, col):
    return one.select(col.alias("v")).collect()[0]["v"]


def test_term_tokens(one):
    got = _eval(one, tok.term_tokens(F.lit("Hello, World-Foo  bar")))
    assert got == ["hello", "world", "foo", "bar"]


def test_any_all_terms(one):
    c = F.lit("the quick brown fox")
    assert _eval(one, tok.any_of_terms(c, "fox dog"))
    assert not _eval(one, tok.any_of_terms(c, "dog cat"))
    assert _eval(one, tok.all_of_terms(c, "quick fox"))
    assert not _eval(one, tok.all_of_terms(c, "quick dog"))


def test_fulltext_stemming(one):
    c = F.lit("running dogs jumped")
    assert _eval(one, tok.any_of_text(c, "run"))  # running -> runn? no: run/runn
    assert _eval(one, tok.any_of_text(c, "dog"))
    assert _eval(one, tok.any_of_text(c, "jump"))
    assert not _eval(one, tok.any_of_text(c, "the"))  # stopword-only query


def test_regexp(one):
    assert _eval(one, tok.regexp_match(F.lit("Hello"), "/^hel/i"))
    assert not _eval(one, tok.regexp_match(F.lit("Hello"), "/^hel/"))


def test_fuzzy(one):
    assert _eval(one, tok.fuzzy_match(F.lit("kitten"), "sitten", 1))
    assert not _eval(one, tok.fuzzy_match(F.lit("kitten"), "sitting", 2))


def test_ngrams(one):
    got = _eval(one, tok.trigrams(F.lit("abcd")))
    assert got == ["abc", "bcd"]
    assert _eval(one, tok.ngram_search(F.lit("hello world"), "lo wo"))
    assert not _eval(one, tok.ngram_search(F.lit("hello world"), "xyz"))


def test_multilang_fulltext_analyzers(spark):
    """Per-language analyzers (tok/stemmers.go, tok/stopwords.go):
    stopwords drop, accents fold, suffixes strip per language."""
    import pyspark.sql.functions as F

    from dgraph_spark.functions.tokenizers import fulltext_tokens, stem_lang_py

    def toks(text, lang):
        df = spark.createDataFrame([(text,)], "t string")
        return df.select(fulltext_tokens(F.col("t"), lang).alias("x")).collect()[0]["x"]

    de = toks("die sch\u00f6nen Tabellen und Ordnungen", "de")
    fr = toks("les donn\u00e9es \u00e9tait tri\u00e9es", "fr")
    es = toks("las tablas ordenadas y el \u00edndice", "es")
    # light-stemmer behavior (Lucene de/fr/es light via bleve —
    # tok/stemmers.go stemmer_de_light/fr_light/es_light)
    assert "schon" in de and "und" not in de and "tabell" in de
    assert "done" in fr and "les" not in fr  # données -> done (fr light)
    assert "tabl" in es and "el" not in es and "índic" in es
    # python twins agree with the expression-side stemmers
    assert stem_lang_py("tabellen", "de") == "tabell"
    assert stem_lang_py("donn\u00e9es", "fr") == "done"
    assert stem_lang_py("ordenadas", "es") == "ordenad"


def test_ru_it_pt_fulltext_analyzers(spark):
    """ru/it/pt analyzers (tok/stemmers.go:33-50 lists these snowball
    languages): Cyrillic suffix stripping, accent folding, stopwords."""
    import pyspark.sql.functions as F

    from dgraph_spark.functions.tokenizers import fulltext_tokens, stem_lang_py

    def toks(text, lang):
        df = spark.createDataFrame([(text,)], "t string")
        return df.select(fulltext_tokens(F.col("t"), lang).alias("x")).collect()[0]["x"]

    ru = toks("\u0431\u044b\u0441\u0442\u0440\u044b\u0435 \u0442\u0430\u0431\u043b\u0438\u0446\u044b \u0438 \u0438\u043d\u0434\u0435\u043a\u0441\u044b", "ru")
    it = toks("le tabelle ordinate e gli indici", "it")
    pt = toks("as tabelas ordenadas e os \u00edndices", "pt")
    assert "\u0438" not in ru and any(t.startswith("\u0442\u0430\u0431\u043b\u0438\u0446") for t in ru)
    assert "le" not in it and any(t.startswith("tabell") for t in it)
    assert "as" not in pt and any(t.startswith("tabel") for t in pt)
    # expression-side and python-twin stemmers agree
    for w, lang in (("\u0442\u0430\u0431\u043b\u0438\u0446\u044b", "ru"),
                    ("tabelle", "it"), ("tabelas", "pt")):
        got = toks(w, lang)
        assert got == [stem_lang_py(w, lang)]


def test_zh_fulltext_analyzer(spark):
    """zh: the reference's cjk_bigram — OVERLAPPING bigrams per CJK run,
    a unigram only for an isolated single char, latin/digit runs kept
    (tok/stemmers.go routes zh/ja/ko -> cjk_bigram)."""
    import pyspark.sql.functions as F

    from dgraph_spark.functions.tokenizers import (
        _query_text_tokens, fulltext_tokens)

    df = spark.createDataFrame([("\u67e5\u8be2spark\u8868",)], "t string")
    got = df.select(fulltext_tokens(F.col("t"), "zh").alias("x")).collect()[0]["x"]
    assert got == ["\u67e5\u8be2", "spark", "\u8868"]
    # adjacent chars in the query bigram too; the space splits runs
    assert _query_text_tokens("\u67e5\u8868 spark", "zh") == \
        ["\u67e5\u8868", "spark"]


@pytest.mark.slow
def test_remaining_snowball_languages(spark):
    """da/nl/fi/hu/no/ro/sv/tr complete the reference's snowball set
    (tok/stemmers.go:33-50); ja/ko route through the CJK segmenter."""
    import pyspark.sql.functions as F

    from dgraph_spark.functions.tokenizers import (
        _query_text_tokens, fulltext_tokens)

    def toks(text, lang):
        df = spark.createDataFrame([(text,)], "t string")
        return df.select(fulltext_tokens(F.col("t"), lang).alias("x")).collect()[0]["x"]

    cases = {
        # da now runs full Danish snowball: step-4 undoubles -ll
        "da": ("og hurtige tabeller sorteres", "tabel"),
        "nl": ("de snelle tabellen worden gesorteerd", "tabell"),
        "fi": ("nopeat taulukot ja indeksit", "tauluko"),
        # hu full Snowball keeps the accent: ák→a plural rule → tábla
        "hu": ("a gyors táblák és indexek", "tábla"),
        "no": ("og raske tabeller sorteres", "tabell"),
        "ro": ("și tabelele rapide sunt sortate", "tabel"),
        "sv": ("och snabba tabeller sorteras", "tabell"),
        "tr": ("ve hızlı tablolar sıralanır", "tablo"),
    }
    stop0 = {"da": "og", "nl": "de", "fi": "ja", "hu": "a",
             "no": "og", "ro": "și", "sv": "och", "tr": "ve"}
    for lang, (text, stem) in cases.items():
        got = toks(text, lang)
        assert stem in got, (lang, got)
        assert stop0[lang] not in got, (lang, got)  # stopword removed
        # query side tokenizes through the SAME analyzer
        assert _query_text_tokens("tabellen tabelele tablolar taulukot", lang)
    # ja/ko: per-char CJK segmentation + latin runs, both sides
    for lang, text in (("ja", "クエリspark表"),
                       ("ko", "쿼리spark표")):
        got = toks(text, lang)
        assert "spark" in got and len(got) >= 3
        assert _query_text_tokens(text, lang) == got


def test_prefilter_superset():
    """The anyoftext substring prefilter must be a SUPERSET test: for
    every language that uses it, _stem_substring(stem(w)) must be a
    substring of the (folded) token. Audit over synthetic suffix-rich
    vocab; PREFILTER_UNSAFE languages are exempt because they skip the
    prefilter (tr: devoice/append/held-head reassembly; fr: mid-word
    double-letter contraction)."""
    import random

    from dgraph_spark.functions.tokenizers import (_FOLD, _LANG_TABLES,
                                                   PREFILTER_UNSAFE,
                                                   _fold_py,
                                                   _stem_substring,
                                                   stem_lang_py)

    ALPH = {"ru": "абвгдежзиклмнопрстуфхцчшщыьэюя",
            "ar": "ابثدةفجهيذكلمنظحقرستعغوخصز",
            "ckb": "ابچدەفگهیژکلمنۆپقرستێڤعخغز",
            "hi": "ाबचदेफगहिजकलमनोपटरसतुवधखयश"}
    EXTRA = {"fi": "äöå", "nl": "éëïö", "da": "åäö", "no": "åäö",
             "sv": "åäö", "hu": "áéíóöőúüű", "ro": "ăâîșşțţ"}
    SUF = {"nl": ["heden", "ingen", "en", "e", "heid", "lijkheden"],
           "fi": ["issa", "illa", "inen", "aatto", "illaan", "ttaa"],
           "hu": ["ák", "ek", "ban", "nak", "val", "unk"],
           "ro": ["aţiune", "ele", "ilor", "ează", "uri"],
           "ru": ["иями", "ость", "ая", "ует", "ить"],
           "en": ["ization", "ousness", "ies", "ing", "biliti"],
           "ar": ["ها", "ات", "ون", "ال"], "ckb": ["ەکان", "ێک", "دا"],
           "hi": ["ों", "ाएं", "ियों"]}
    langs = ["en", "de", "es", "it", "pt", "da", "no", "sv", "ru",
             "nl", "ro", "fi", "hu", "ar", "ckb", "hi"]
    for lang in langs:
        assert lang not in PREFILTER_UNSAFE
        rng = random.Random(13)
        alpha = ALPH.get(lang, "abcdefghijklmnopqrstuvwxyz"
                         + EXTRA.get(lang, ""))
        sufs = SUF.get(lang, ["s", "en", "e", "ungen", "aciones"])
        bad = []
        for _ in range(1500):
            w = ("".join(rng.choice(alpha)
                         for _ in range(rng.randint(2, 9)))
                 + rng.choice(sufs))
            stem = stem_lang_py(w, lang)
            if not stem:
                continue
            needle = _stem_substring(stem, lang)
            hay = (_fold_py(w.lower(), lang)
                   if lang in _LANG_TABLES and lang in _FOLD
                   else w.lower())
            if needle and needle not in hay:
                bad.append((w, stem, needle))
        assert not bad, (lang, bad[:5])
