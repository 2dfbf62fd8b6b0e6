"""Dedicated (non-Snowball) stemmers for ar/ckb/hi — the algorithms
behind the reference's fulltext analyzers for those languages
(tok/stemmers.go:33-56 langStemmers routes ar -> "stemmer_ar",
ckb -> "stemmer_ckb", hi -> "stemmer_hi"; bleve's analysis/lang/{ar,
ckb,hi} packages register ports of Lucene's ArabicStemmer (Larkey's
light10), SoraniStemmer and HindiStemmer). Note the reference's
filterStemmers fetches ONLY the stemmer filter — the per-language
normalizer filters (normalize_ar etc.) are never in the chain — so
these stemmers run on lowercased NFKC tokens directly, as here.

Each language is ONE declarative spec (a list of stages) interpreted
by three backends that agree by construction
(tests/test_dedicated_stemmers.py cross-checks them):

- a Python function (query-literal stemming),
- a Spark Column transform (JVM-side inside F.transform),
- a DuckDB SQL expression chain (the CORRECTNESS oracle twin).

Stage kinds (all length conditions are on the RUNNING token):

  ("prefix", [(min_len, prefix), ...])   strip the FIRST matching
      prefix (token length must be >= min_len), then stop — Lucene
      ArabicStemmer.stemPrefix's single-strip loop.
  ("first", [(min_len_exclusive, suffix, strip_n), ...])   strip the
      first rule whose suffix matches with len > min_len_exclusive
      (Lucene's if/else-if dispatch chains); strip_n chars removed.
  ("each", [(min_len_exclusive, suffix, strip_n), ...])    try every
      rule IN ORDER on the running value (Lucene ArabicStemmer's
      suffix loop strips multiple suffixes).

All lengths are in code points (these scripts are BMP: Go runes,
Python len, Spark length() and DuckDB length() all agree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- specs

# Lucene ArabicStemmer (light10): one prefix strip then iterative
# suffix strips. canStemPrefix: a 1-char prefix needs len >= 4, others
# len >= len(prefix) + 2; canStemSuffix: len >= len(suffix) + 2.
_AR_PREFIXES = ["ال", "وال", "بال", "كال", "فال", "لل", "و"]
_AR_SUFFIXES = ["ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي"]

AR_SPEC = [
    ("prefix", [(4 if len(p) == 1 else len(p) + 2, p)
                for p in _AR_PREFIXES]),
    ("each", [(len(s) + 1, s, len(s)) for s in _AR_SUFFIXES]),
]

# Lucene SoraniStemmer: postposition, possessive pronoun, then the
# ezafe/definite/demonstrative dispatch chain (early returns).
CKB_SPEC = [
    ("first", [  # postposition
        (5, "دا", 2), (4, "نا", 1), (6, "ەوە", 3),
    ]),
    ("first", [  # possessive pronoun
        (6, "مان", 3), (6, "یان", 3), (6, "تان", 3),
    ]),
    ("first", [  # the return chain: ezafe / (in)definite / demonstrative
        (6, "ێکی", 3), (7, "یەکی", 4),
        (5, "ێک", 2), (6, "یەک", 3), (6, "ەکە", 3), (5, "کە", 2),
        (7, "ەکان", 4), (6, "کان", 3), (7, "یانە", 4), (6, "انە", 3),
        (6, "ایە", 2), (6, "ەیە", 2), (5, "ە", 1), (5, "ی", 1),
    ]),
]

# Lucene HindiStemmer (Ramanathan & Rao lightweight stemmer): strip the
# longest of the suffix groups, gated by descending length thresholds.
_HI_GROUPS = [
    (6, ["ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां"]),
    (5, ["ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां"]),
    (4, ["ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं"]),
    (3, ["कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
         "ती", "ता", "ाँ", "ां", "ों", "ें"]),
    (2, ["ो", "े", "ू", "ु", "ी", "ि", "ा"]),
]

HI_SPEC = [
    ("first", [(mn, s, len(s)) for mn, sufs in _HI_GROUPS for s in sufs]),
]

DEDICATED_STEM_LANGS = {"ar": AR_SPEC, "ckb": CKB_SPEC, "hi": HI_SPEC}


# --------------------------------------------------------------- python

def dedicated_stem_py(token: str, lang: str) -> str:
    t = token
    for stage in DEDICATED_STEM_LANGS[lang]:
        kind, rules = stage
        if kind == "prefix":
            for mn, p in rules:
                if len(t) >= mn and t.startswith(p):
                    t = t[len(p):]
                    break
        elif kind == "first":
            for mn, s, k in rules:
                if len(t) > mn and t.endswith(s):
                    t = t[:-k]
                    break
        else:  # each
            for mn, s, k in rules:
                if len(t) > mn and t.endswith(s):
                    t = t[:-k]
    return t


# ---------------------------------------------------------------- spark

def _sp_stage(stage):
    kind, rules = stage

    def fn(t: Column) -> Column:
        if kind == "prefix":
            expr = None
            for mn, p in rules:
                c = (F.length(t) >= mn) & t.startswith(p)
                stripped = t.substr(F.lit(len(p) + 1), F.length(t))
                expr = F.when(c, stripped) if expr is None else \
                    expr.when(c, stripped)
            return expr.otherwise(t)
        if kind == "first":
            expr = None
            for mn, s, k in rules:
                c = (F.length(t) > mn) & t.endswith(s)
                stripped = t.substr(F.lit(1), F.length(t) - k)
                expr = F.when(c, stripped) if expr is None else \
                    expr.when(c, stripped)
            return expr.otherwise(t)
        mn, s, k = rules[0]  # each-rule: exactly one rule per pass
        c = (F.length(t) > mn) & t.endswith(s)
        return F.when(c, t.substr(F.lit(1), F.length(t) - k)).otherwise(t)

    return fn


def _passes(spec):
    """One expression pass per stage — except 'each' stages, which get
    one pass PER RULE so the running token appears once per pass
    instead of nesting exponentially."""
    for stage in spec:
        if stage[0] == "each":
            for rule in stage[1]:
                yield ("each", [rule])
        else:
            yield stage


def dedicated_tokens_expr(tokens: Column, lang: str) -> Column:
    """array<string> -> stemmed array<string>, pure JVM expressions."""
    out = tokens
    for stage in _passes(DEDICATED_STEM_LANGS[lang]):
        out = F.transform(out, _sp_stage(stage))
    return out


# --------------------------------------------------------------- duckdb

def _sql_stage(stage, v: str = "x") -> str:
    kind, rules = stage
    if kind == "prefix":
        whens = []
        for mn, p in rules:
            c = f"length({v}) >= {mn} AND starts_with({v}, '{p}')"
            whens.append(f"WHEN {c} THEN substr({v}, {len(p) + 1})")
        return f"(CASE {' '.join(whens)} ELSE {v} END)"
    if kind == "first":
        whens = []
        for mn, s, k in rules:
            c = f"length({v}) > {mn} AND ends_with({v}, '{s}')"
            whens.append(
                f"WHEN {c} THEN substr({v}, 1, length({v}) - {k})")
        return f"(CASE {' '.join(whens)} ELSE {v} END)"
    mn, s, k = rules[0]  # each-rule: exactly one rule per pass
    c = f"length({v}) > {mn} AND ends_with({v}, '{s}')"
    return (f"(CASE WHEN {c} THEN substr({v}, 1, length({v}) - {k}) "
            f"ELSE {v} END)")


def dedicated_tokens_sql(list_expr: str, lang: str) -> str:
    """DuckDB twin over a VARCHAR[] expression."""
    out = list_expr
    for stage in _passes(DEDICATED_STEM_LANGS[lang]):
        out = f"list_transform({out}, x -> {_sql_stage(stage)})"
    return out
