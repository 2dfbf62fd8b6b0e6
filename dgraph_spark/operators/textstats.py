"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All are deterministic pure column expressions so every one has an exact
DuckDB oracle twin (the formulas below ARE the spec — they are
intentionally simple rule systems, not ML models).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dgraph_spark.functions.tokenizers import TERM_SPLIT_RE
from dgraph_spark.operators.dedup import normalized

# marker words per language for rule-based language ID (votes; argmax,
# ties and zero votes -> 'und'). Deliberately tiny + deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "is", "that", "with"],
    "fr": ["le", "la", "les", "des", "une", "est", "dans", "avec"],
    "de": ["der", "die", "das", "und", "ist", "mit", "ein", "nicht"],
    "es": ["el", "los", "las", "una", "es", "con", "para", "por"],
}


def tokens_col(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TERM_SPLIT_RE), lambda t: t != "")


def token_count(col: Column) -> Column:
    """Whitespace/punct token count (BPE-ish proxy: tokens, not chars)."""
    return F.size(tokens_col(col))


def lang_votes(col: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens_col(col), lambda t: F.array_contains(markers, t)))


def lang_id(col: Column) -> Column:
    """argmax of marker votes; ties or no votes -> 'und'.
    Deterministic tie-break: the languages are compared in fixed order
    and a strictly-greater vote is required to take the lead."""
    langs = list(LANG_MARKERS)
    best_lang = F.lit("und")
    best_votes = F.lit(0)
    for lang in langs:
        v = lang_votes(col, lang)
        take = v > best_votes
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_votes = F.when(take, v).otherwise(best_votes)
    return best_lang


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]:
      0.4 * alpha_ratio + 0.3 * clamp(tokens/64) + 0.3 * distinct_ratio
    where alpha_ratio = letters/chars, distinct_ratio = distinct tokens /
    tokens. The formula is the spec (oracle-matched)."""
    s = normalized(col)
    chars = F.greatest(F.length(s), F.lit(1))
    alpha = F.length(F.regexp_replace(s, r"[^a-z]", ""))
    toks = tokens_col(col)
    ntok = F.greatest(F.size(toks), F.lit(1))
    ndis = F.size(F.array_distinct(toks))
    score = (
        0.4 * (alpha / chars)
        + 0.3 * F.least(F.size(toks) / F.lit(64.0), F.lit(1.0))
        + 0.3 * (ndis / ntok)
    )
    return F.round(score, 4)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document stats relation."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fp"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021
    §A1.1 repetition filters, re-specified deterministically):

      - n_tokens          term-token count
      - dup_token_frac    1 - distinct_tokens/tokens   (0 when empty)
      - top_token_frac    count(most frequent token)/tokens
      - top_bigram_char_frac  count(top 2-gram) * len(top 2-gram)
                              / len(tokens joined by ' ')  (0 when <2)

    "top 2-gram" ties break to the struct-max (count, then
    lexicographically greatest gram) — any fixed rule works; this one
    is expressible identically in both engines. All pure column
    expressions over a materialized token array: per-row cost is
    O(distinct * tokens) on short web documents (bounded by chunking
    upstream), and the operator is a narrow projection — zero shuffle
    at any scale."""
    base = _rep_base(docs, text_col, id_col)
    cols = _rep_cols()
    return base.select(
        id_col,
        cols["n_tokens"].alias("n_tokens"),
        cols["dup_token_frac"].alias("dup_token_frac"),
        cols["top_token_frac"].alias("top_token_frac"),
        cols["top_bigram_char_frac"].alias("top_bigram_char_frac"),
    )


def _rep_base(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Project materialized token (`t`) and bigram (`g2`) arrays: every
    stat references them several times inside lambdas, and a bound
    attribute is a lookup where an inlined expression would re-run the
    tokenizer/zip_with per array element (SPARK-36718 keeps non-cheap
    multi-referenced aliases un-inlined)."""
    from dgraph_spark.operators.dedup import ordered_windows

    toks = tokens_col(F.col(text_col))
    return docs.select(F.col(id_col), toks.alias("t")).select(
        id_col, "t", ordered_windows(F.col("t"), 2).alias("g2"))


def _rep_cols() -> dict[str, Column]:
    """Repetition-signal expressions over _rep_base's t/g2 columns."""
    t, grams = F.col("t"), F.col("g2")
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    top_tok = F.array_max(
        F.transform(F.array_distinct(t),
                    lambda g: F.size(F.filter(t, lambda x: x == g))))
    top_gram = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda g: F.struct(
                F.size(F.filter(grams, lambda x: x == g)).alias("c"),
                g.alias("g"))))
    joined_len = F.length(F.array_join(t, " "))
    return {
        "n_tokens": n,
        "dup_token_frac": F.when(n > 0, F.round(1.0 - nd / n, 4))
                           .otherwise(F.lit(0.0)),
        "top_token_frac": F.when(n > 0, F.round(top_tok / n, 4))
                           .otherwise(F.lit(0.0)),
        "top_bigram_char_frac": F.when(
            n >= 2,
            F.round(top_gram["c"] * F.length(top_gram["g"]) / joined_len, 4),
        ).otherwise(F.lit(0.0)),
    }


# (rule name, predicate builder) in fixed evaluation order — the rule
# list IS the spec; thresholds follow Gopher's published defaults where
# the corpus makes them meaningful (token bounds scaled to web docs).
GOPHER_RULES: list[tuple[str, object]] = [
    ("too_few_tokens", lambda c, p: c["n_tokens"] < p["min_tokens"]),
    ("too_many_tokens", lambda c, p: c["n_tokens"] > p["max_tokens"]),
    ("dup_tokens", lambda c, p: c["dup_token_frac"] > p["max_dup_token_frac"]),
    ("top_token", lambda c, p: c["top_token_frac"] > p["max_top_token_frac"]),
    ("top_bigram", lambda c, p:
        c["top_bigram_char_frac"] > p["max_top_bigram_char_frac"]),
]


def gopher_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 16,
    max_tokens: int = 100_000,
    max_dup_token_frac: float = 0.6,
    max_top_token_frac: float = 0.3,
    max_top_bigram_char_frac: float = 0.18,
    reasons_as_string: bool = False,
) -> DataFrame:
    """Gopher-rules document filter (Rae et al. 2021 §A1.1): emits
    (id, keep, reasons) where ``reasons`` lists every failed rule in
    GOPHER_RULES order and ``keep`` is reasons == []. Pure column
    program over the same materialized token/bigram arrays as
    repetition_stats — zero shuffle; filter + prune push to the scan.

    ``reasons_as_string`` emits reasons comma-joined instead of as an
    array (rule order is deterministic, so the string is too) — for
    consumers whose row canonicalizers can't hash list cells (the
    correctness driver's pandas hasher is one)."""
    params = {
        "min_tokens": min_tokens,
        "max_tokens": max_tokens,
        "max_dup_token_frac": max_dup_token_frac,
        "max_top_token_frac": max_top_token_frac,
        "max_top_bigram_char_frac": max_top_bigram_char_frac,
    }
    base = _rep_base(docs, text_col, id_col)
    cols = _rep_cols()
    reasons = F.filter(
        F.array(*[
            F.when(pred(cols, params), F.lit(name))
             .otherwise(F.lit(None).cast("string"))
            for name, pred in GOPHER_RULES
        ]),
        lambda r: r.isNotNull(),
    )
    return base.select(
        id_col,
        reasons.alias("reasons"),
    ).select(
        id_col,
        (F.size("reasons") == 0).alias("keep"),
        (F.array_join("reasons", ",") if reasons_as_string
         else F.col("reasons")).alias("reasons"),
    )
