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


def _lang_votes(t: Column, lang: str) -> Column:
    """Marker votes over a BOUND token array (a lambda variable or
    cheap attribute — never pass a raw tokenizer expression)."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(t, lambda x: F.array_contains(markers, x)))


def lang_votes(col: Column, lang: str) -> Column:
    return _let(tokens_col(col), lambda t: _lang_votes(t, lang))


def _lang_id_from(t: Column) -> Column:
    """argmax over a bound token array; each language's vote is
    let-bound because the argmax chain references it twice."""
    def fold(votes):
        best_lang = F.lit("und")
        best_votes = F.lit(0)
        for i, lang in enumerate(LANG_MARKERS):
            take = votes[i] > best_votes
            best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
            best_votes = F.when(take, votes[i]).otherwise(best_votes)
        return best_lang

    return _let(F.array(*[_lang_votes(t, lang) for lang in LANG_MARKERS]),
                fold)


def lang_id(col: Column) -> Column:
    """argmax of marker votes; ties or no votes -> 'und'.
    Deterministic tie-break: the languages are compared in fixed order
    and a strictly-greater vote is required to take the lead.
    One tokenizer pass per row wherever the expression lands
    (let-bound — see _let)."""
    return _let(tokens_col(col), _lang_id_from)


def _quality_from(s: Column, t: Column) -> Column:
    """Quality score over bound normalized text + token array."""
    chars = F.greatest(F.length(s), F.lit(1))
    alpha = F.length(F.regexp_replace(s, r"[^a-z]", ""))
    ntok = F.greatest(F.size(t), F.lit(1))
    ndis = F.size(F.array_distinct(t))
    score = (
        0.4 * (alpha / chars)
        + 0.3 * F.least(F.size(t) / F.lit(64.0), F.lit(1.0))
        + 0.3 * (ndis / ntok)
    )
    return F.round(score, 4)


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]:
      0.4 * alpha_ratio + 0.3 * clamp(tokens/64) + 0.3 * distinct_ratio
    where alpha_ratio = letters/chars, distinct_ratio = distinct tokens /
    tokens. The formula is the spec (oracle-matched)."""
    return _let(normalized(col),
                lambda s: _let(tokens_col(col),
                               lambda t: _quality_from(s, t)))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document stats relation — literally: the four
    outputs derive from ONE let-bound (normalized, tokens) pair, so
    the tokenizer runs once per row in the projection AND once inside
    any filter a consumer pushes over it (before the binding, a
    ``where(quality > x)`` predicate inlined 33 tokenizer copies)."""
    c = F.col(text_col)
    fused = _let(normalized(c), lambda s: _let(
        tokens_col(c),
        lambda t: F.struct(
            F.size(t).alias("n_tokens"),
            _lang_id_from(t).alias("lang_pred"),
            _quality_from(s, t).alias("quality"),
            F.md5(s).alias("fp"),
        )))
    return docs.select(F.col(id_col), fused.alias("_s")).select(
        id_col,
        F.col("_s.n_tokens").alias("n_tokens"),
        F.col("_s.lang_pred").alias("lang_pred"),
        F.col("_s.quality").alias("quality"),
        F.col("_s.fp").alias("fp"),
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
    expressions with let-bound token/bigram arrays (_rep_struct):
    per-row cost is O(distinct * tokens) on short web documents
    (bounded by chunking upstream), and the operator is a narrow
    projection — zero shuffle at any scale."""
    s = _rep_struct(F.col(text_col))
    return docs.select(F.col(id_col), s.alias("_s")).select(
        id_col,
        F.col("_s.n_tokens").alias("n_tokens"),
        F.col("_s.dup_token_frac").alias("dup_token_frac"),
        F.col("_s.top_token_frac").alias("top_token_frac"),
        F.col("_s.top_bigram_char_frac").alias("top_bigram_char_frac"),
    )


def _let(val: Column, body) -> Column:
    """Single-value let binding: evaluate ``val`` ONCE per row and
    reference it many times in ``body`` — encoded as a one-element
    transform, because a lambda parameter is Catalyst's only true
    binder. Unlike a projected alias (which SPARK-36718 protects only
    until a FILTER is pushed through the projection and inlines a
    fresh copy of the expression per reference), a let-bound value
    stays single-evaluation inside every inlined copy — so operators
    built this way survive ``.where(...)`` pushdown without the
    exponential re-evaluation that made `where(keep)` 100x the
    projection cost."""
    return F.get(F.transform(F.array(val), body), 0)


def _max_run(arr: Column) -> Column:
    """struct(..., bc, bg): the maximum occurrence count of any value
    in ``arr`` (bc) and the value achieving it (bg; ties -> greatest
    value) — computed as the longest equal-run in the sorted array
    with ONE O(n) aggregate. Equivalent to array_max over
    struct(count, value) built from a distinct x filter double loop,
    but O(n log n) instead of O(distinct * n) interpreted lambda
    calls. The ascending scan makes `run >= best` reproduce the
    greatest-value tie-break exactly."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("bc"),
        F.lit(None).cast("string").alias("bg"))

    def step(acc, x):
        run = (F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long")))
        better = run >= acc["bc"]
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["bc"]).alias("bc"),
            F.when(better, x).otherwise(acc["bg"]).alias("bg"))

    return F.aggregate(F.array_sort(arr), init, step)


def _rep_struct(text: Column) -> Column:
    """struct(n_tokens, dup_token_frac, top_token_frac,
    top_bigram_char_frac) for one document as a SINGLE self-contained
    expression: token array, bigram array, and the scalar aggregates
    are each let-bound, so the whole program costs one tokenizer pass
    per row wherever it lands (projection, filter, join key)."""
    from dgraph_spark.operators.dedup import ordered_windows

    def over_tokens(t):
        def over_grams(g2):
            n = F.size(t)
            nd = F.size(F.array_distinct(t))
            # top occurrence counts via sorted max-run-length: O(n log n)
            # native sort + O(n) aggregate, vs the naive
            # distinct x filter double loop (O(d*n) interpreted lambda
            # calls — the dominant per-document cost at ~0.2 us per
            # interpreted call). Values identical: a run length in the
            # sorted array IS the occurrence count, and the (count,
            # value)-max with ascending ties matches array_max over
            # struct(c, g) (max count, tie -> greatest value).
            top_tok = _max_run(t)["bc"]
            top_gram = _max_run(g2)
            joined_len = F.length(F.array_join(t, " "))
            scalars = F.struct(
                n.alias("n"), nd.alias("nd"), top_tok.alias("topc"),
                top_gram["bc"].alias("gc"), top_gram["bg"].alias("gg"),
                joined_len.alias("jlen"))

            def over_scalars(s):
                return F.struct(
                    s["n"].alias("n_tokens"),
                    F.when(s["n"] > 0,
                           F.round(1.0 - s["nd"] / s["n"], 4))
                     .otherwise(F.lit(0.0)).alias("dup_token_frac"),
                    F.when(s["n"] > 0, F.round(s["topc"] / s["n"], 4))
                     .otherwise(F.lit(0.0)).alias("top_token_frac"),
                    F.when(s["n"] >= 2,
                           F.round(s["gc"] * F.length(s["gg"])
                                   / s["jlen"], 4))
                     .otherwise(F.lit(0.0)).alias("top_bigram_char_frac"),
                )

            return _let(scalars, over_scalars)

        return _let(ordered_windows(t, 2), over_grams)

    return _let(tokens_col(text), over_tokens)


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


def gopher_reasons_expr(text: Column, params: dict) -> Column:
    """The failed-rule reasons array for one document as a single
    let-bound Column — the building block shared by
    gopher_quality_filter and recipes.prepare_corpus (the recipe
    filters on ``size(reasons) == 0`` directly so the predicate pushes
    to the scan as one tokenizer pass)."""
    def over_stats(c):
        return F.filter(
            F.array(*[
                F.when(pred(c, params), F.lit(name))
                 .otherwise(F.lit(None).cast("string"))
                for name, pred in GOPHER_RULES
            ]),
            lambda r: r.isNotNull(),
        )

    return _let(_rep_struct(text), over_stats)


GOPHER_DEFAULTS = {
    "min_tokens": 16,
    "max_tokens": 100_000,
    "max_dup_token_frac": 0.6,
    "max_top_token_frac": 0.3,
    "max_top_bigram_char_frac": 0.18,
}


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
    correctness driver's pandas hasher is one).

    The whole rule program is ONE let-bound expression (_rep_struct +
    _let), so ``.where("keep")`` — the recipe's hot path — pushes to
    the parquet scan as a single-tokenizer-pass predicate instead of
    inlining a fresh copy of the array program per rule (measured
    100x at sf0.1 before the binding)."""
    params = {
        "min_tokens": min_tokens,
        "max_tokens": max_tokens,
        "max_dup_token_frac": max_dup_token_frac,
        "max_top_token_frac": max_top_token_frac,
        "max_top_bigram_char_frac": max_top_bigram_char_frac,
    }
    reasons = gopher_reasons_expr(F.col(text_col), params)
    return docs.select(
        F.col(id_col),
        reasons.alias("reasons"),
    ).select(
        id_col,
        (F.size("reasons") == 0).alias("keep"),
        (F.array_join("reasons", ",") if reasons_as_string
         else F.col("reasons")).alias("reasons"),
    )


def line_repetition_stats(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Gopher's LINE-level repetition signals (Rae et al. 2021 §A1.1
    "repetition removal" at line granularity; the token/bigram
    signals live in repetition_stats):

      - n_lines             non-empty trimmed lines
      - dup_line_frac       1 - distinct_lines/lines      (0 when none)
      - dup_line_char_frac  chars inside REPEATED occurrences
                            (sum over distinct lines of
                            (count-1)*len(line)) / total line chars

    Both fractions are occurrence-order-independent, so the DuckDB
    twin is exact. One let-bound expression per row (see _let) — no
    shuffle at any scale, filter-pushdown safe.

    dup-chars is O(n log n) per row: sort the lines, then ONE
    aggregate pass where each line equal to its predecessor in sorted
    order contributes its length — exactly sum over distinct lines of
    (count-1)*len(line). (The first implementation re-filtered the
    full array per distinct line — O(distinct x total), ~2.5e9
    comparisons for the 50k-line boilerplate docs this filter exists
    to catch; A/B in PLANS.md.)"""
    def over_lines(lines):
        def over_scalars(s):
            return F.struct(
                s["n"].cast("long").alias("n_lines"),
                F.when(s["n"] > 0,
                       F.round(1.0 - s["nd"] / s["n"], 4))
                 .otherwise(F.lit(0.0)).alias("dup_line_frac"),
                F.when(s["chars"] > 0,
                       F.round(s["dupchars"] / s["chars"], 4))
                 .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
            )

        n = F.size(lines)
        nd = F.size(F.array_distinct(lines))
        chars = F.aggregate(lines, F.lit(0).cast("long"),
                            lambda acc, l: acc + F.length(l))
        dupchars = F.aggregate(
            F.array_sort(lines),
            F.struct(F.lit(None).cast("string").alias("prev"),
                     F.lit(0).cast("long").alias("dup")),
            lambda acc, l: F.struct(
                l.alias("prev"),
                (acc["dup"] + F.when(acc["prev"].eqNullSafe(l),
                                     F.length(l))
                               .otherwise(F.lit(0))).alias("dup")),
            lambda acc: acc["dup"])
        return _let(F.struct(n.alias("n"), nd.alias("nd"),
                             chars.alias("chars"),
                             dupchars.alias("dupchars")), over_scalars)

    # NB: F.transform(col, F.trim) misbinds — trim's optional second
    # parameter would receive the element INDEX; bind explicitly
    lines_expr = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "")
    fused = _let(lines_expr, over_lines)
    return docs.select(F.col(id_col), fused.alias("_s")).select(
        id_col,
        F.col("_s.n_lines").alias("n_lines"),
        F.col("_s.dup_line_frac").alias("dup_line_frac"),
        F.col("_s.dup_line_char_frac").alias("dup_line_char_frac"),
    )


def blocklist_filter(
    docs: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style phrase-blocklist document filter (Raffel et al. 2020
    §2.2 applied a public "bad words" list with substring matching):
    ``keep`` is true iff NONE of ``phrases`` occurs as a substring of
    the lowercased text; ``n_hits`` counts matching phrases. The
    phrase list is a broadcast-free literal array (bounded list — the
    public lists are a few hundred entries), the match one let-bound
    pass per row; pushdown-safe like every keep-flag operator here."""
    if not phrases:
        raise ValueError("empty blocklist")
    plit = F.array(*[F.lit(p.lower()) for p in phrases])

    def over_low(low):
        def over_hits(nhits):
            return F.struct((nhits == 0).alias("keep"),
                            nhits.alias("n_hits"))

        return _let(
            F.size(F.filter(plit, lambda p: low.contains(p)))
             .cast("long"),
            over_hits)

    fused = _let(F.lower(F.col(text_col)), over_low)
    return docs.select(F.col(id_col), fused.alias("_s")).select(
        id_col,
        F.col("_s.keep").alias("keep"),
        F.col("_s.n_hits").alias("n_hits"),
    )
