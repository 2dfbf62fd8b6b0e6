"""Dedicated stemmers (ar/ckb/hi): hand-computed goldens from the
published Lucene algorithms (bleve's ports, routed by
tok/stemmers.go:33-56) and 3-backend agreement on suffix-rich fuzz
vocabulary."""

import random

import pytest

from dgraph_spark.functions.dedicated_stemmers import (
    dedicated_stem_py,
    dedicated_tokens_expr,
    dedicated_tokens_sql,
)

AR_CASES = [
    # one definite-article strip + iterative suffix strips (light10)
    ("الكتاب", "كتاب"),
    ("والمكتبة", "مكتب"),
    ("بالبيت", "بيت"),
    ("كتابها", "كتاب"),
    ("وكتب", "كتب"),          # wa- prefix needs len >= 4
    ("وهم", "وهم"),           # len 3 < 4: wa- NOT stripped
    ("المسلمون", "مسلم"),     # ال + ون
    ("معلمين", "معلم"),       # ين
    ("مدرسة", "مدرس"),        # ة
    ("لل", "لل"),             # prefix == whole word: len gate blocks
    ("فقه", "فق"),            # suffix ه: len 3 >= 1+2 strips
]

CKB_CASES = [
    ("پیاوەکان", "پیاو"),     # definite plural ەکان
    ("کتێبێکی", "کتێب"),      # indefinite singular ezafe ێکی
    ("ماڵەکە", "ماڵە"),       # کە fires (ەکە needs len > 6)
    ("شارەکانی", "شارەکان"),  # absolute singular ezafe ی
    # postposition دا strips, then the possessive stage sees the
    # shortened form ending تان and strips again (Lucene cascades)
    ("کوردستاندا", "کوردس"),
    ("هاتنەوە", "هاتن"),      # postposition ەوە (len 7 > 6)
    ("برامان", "برامان"),     # possessive مان needs len > 6: blocked
]

HI_CASES = [
    ("लड़कियां", "लड़क"),      # ियां (4-char group)
    ("लड़का", "लड़क"),         # final ा
    ("करेंगे", "कर"),          # ेंगे
    ("बनाकर", "बन"),           # ाकर (3-char, len 6 > 4)
    ("किताबें", "किताब"),      # ें
    ("जाता", "जा"),            # ता
    ("घर", "घर"),              # too short for any strip
]


@pytest.mark.parametrize("word,want", AR_CASES)
def test_ar_stemmer(word, want):
    assert dedicated_stem_py(word, "ar") == want


@pytest.mark.parametrize("word,want", CKB_CASES)
def test_ckb_stemmer(word, want):
    assert dedicated_stem_py(word, "ckb") == want


@pytest.mark.parametrize("word,want", HI_CASES)
def test_hi_stemmer(word, want):
    assert dedicated_stem_py(word, "hi") == want


def test_ar_strips_only_first_prefix_but_all_suffixes():
    # prefix loop stops after one strip; suffix loop keeps going:
    # ون then... كتابهاة is artificial but exercises iterative strips
    assert dedicated_stem_py("الكتابها", "ar") == "كتاب"
    # two stackable suffixes in table order (ها then ة not both at end;
    # use ...انها? ها strips first (order), then ان can strip)
    assert dedicated_stem_py("معلمانها", "ar") == "معلم"


def _fuzz_vocab(lang, n=600, seed=31):
    rng = random.Random(seed)
    if lang == "ar":
        alphabet = "ابتثجحخدذرزسشصضطظعغفقكلمنهوية"
        pres = ["", "ال", "وال", "بال", "كال", "فال", "لل", "و"]
        sufs = ["", "ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة",
                "ي", "هاة", "انها"]
    elif lang == "ckb":
        alphabet = "ئابپتجچحخدرڕزژسشعغفڤقکگلڵمنهەوۆیێ"
        pres = [""]
        sufs = ["", "دا", "نا", "ەوە", "مان", "یان", "تان", "ێکی",
                "یەکی", "ێک", "یەک", "ەکە", "کە", "ەکان", "کان",
                "یانە", "انە", "ایە", "ەیە", "ە", "ی", "داکان"]
    else:
        alphabet = "कखगघचछजझटठडढणतथदधनपफबभमयरलवशषसह"
        pres = [""]
        sufs = ["", "ाएंगी", "ाइयों", "ाएगा", "ेंगे", "ियां", "ाकर",
                "ाया", "ाने", "ाती", "तीं", "कर", "ने", "ता", "ों",
                "ें", "ो", "े", "ी", "ा", "ु"]
    return sorted({
        rng.choice(pres)
        + "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        + rng.choice(sufs) for _ in range(n)})


@pytest.mark.parametrize("lang", ["ar", "ckb", "hi"])
def test_three_backend_agreement(spark, lang):
    import duckdb
    import pyspark.sql.functions as F

    vocab = _fuzz_vocab(lang)
    py_out = [dedicated_stem_py(w, lang) for w in vocab]

    vals = ", ".join("'" + w + "'" for w in vocab)
    sql_out = duckdb.connect().execute(
        "SELECT " + dedicated_tokens_sql(f"[{vals}]", lang)).fetchone()[0]
    assert sql_out == py_out

    df = spark.createDataFrame([(vocab,)], "toks array<string>")
    sp_out = df.select(
        dedicated_tokens_expr(F.col("toks"), lang).alias("o")
    ).collect()[0]["o"]
    assert sp_out == py_out
