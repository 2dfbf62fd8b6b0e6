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
    assert "schon" in de and "und" not in de and "tabell" in de
    assert "donn" in fr and "les" not in fr
    assert "tabl" in es and "el" not in es and "indic" in es
    # python twins agree with the expression-side stemmers
    assert stem_lang_py("tabellen", "de") == "tabell"
    assert stem_lang_py("donn\u00e9es", "fr") == "donn"
    assert stem_lang_py("ordenadas", "es") == "ordenad"
