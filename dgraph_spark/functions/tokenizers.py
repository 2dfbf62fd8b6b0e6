"""Tokenizers as column expressions (reference: tok/tok.go).

All hot-path tokenizers are pure Catalyst expressions (split/lower/
transform/filter) so term/fulltext search stays inside whole-stage
codegen — the Spark equivalent of dgraph's index tokenization, done at
scan time instead of write time. No Python UDFs here.

- term  (tok/tok.go:369-389): unicode-word split + lowercase.
- fulltext (tok/tok.go:558-575): term + stopwords + stemming. We apply a
  lightweight English suffix-stemmer; full bleve/snowball parity is out
  of scope and documented as a divergence.
- trigram (tok/tok.go:616): dgraph uses trigrams only as a lossy regex
  prefilter — Spark evaluates regexes exactly, so trigram is exposed for
  parity/tests but not needed for correctness (SURVEY.md §4).
- ngram (tok/tok.go:447-551).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matches dgraph's term tokenizer: split on non-letter/digit, lowercase.
TERM_SPLIT_RE = r"[^\p{L}\p{N}]+"

# Minimal English stopword list (subset of bleve's en stopwords,
# tok/stopwords.go) — applied in fulltext mode.
EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
]


def term_tokens(col: Column) -> Column:
    """array<string> of lowercase word tokens; empty strings removed."""
    return F.filter(F.split(F.lower(col), TERM_SPLIT_RE), lambda t: t != "")


def _dedouble(x: Column) -> Column:
    """Porter-style double-consonant reduction after ing/ed stripping
    (running -> runn -> run); ll/ss kept."""
    # explicit alternation (no backreference) so the same pattern works
    # in RE2-based engines (DuckDB oracles)
    return F.when(
        F.regexp_extract(x, r"(bb|dd|ff|gg|mm|nn|pp|rr|tt)$", 0) != "",
        x.substr(F.lit(1), F.length(x) - 1),
    ).otherwise(x)


def stem_token(t: Column) -> Column:
    """Cheap English suffix stemmer (porter step-1-ish), pure expression:
    sses->ss, ies->y, ss stays, trailing s dropped, ing/ed stripped (with
    double-consonant reduction) when a long-enough stem remains."""
    ln = F.length(t)
    return (
        F.when((ln > 4) & t.endswith("sses"), t.substr(F.lit(1), ln - 2))
        .when((ln > 3) & t.endswith("ies"), F.concat(t.substr(F.lit(1), ln - 3), F.lit("y")))
        .when((ln > 4) & t.endswith("ing"), _dedouble(t.substr(F.lit(1), ln - 3)))
        .when((ln > 3) & t.endswith("ed") & ~t.endswith("eed"),
              _dedouble(t.substr(F.lit(1), ln - 2)))
        .when((ln > 2) & t.endswith("s") & ~t.endswith("ss") & ~t.endswith("us"),
              t.substr(F.lit(1), ln - 1))
        .otherwise(t)
    )


def fulltext_tokens(col: Column) -> Column:
    """term tokens minus stopwords, suffix-stemmed (expression-only)."""
    toks = term_tokens(col)
    toks = F.filter(toks, lambda t: ~t.isin(*EN_STOPWORDS))
    return F.transform(toks, stem_token)


def _dedouble_py(t: str) -> str:
    if len(t) >= 2 and t[-1] == t[-2] and t[-1] in "bdfgmnprt":
        return t[:-1]
    return t


def _stem_py(tok: str) -> str:
    """Python twin of stem_token for query-side literals."""
    t = tok
    n = len(t)
    if n > 4 and t.endswith("sses"):
        return t[:-2]
    if n > 3 and t.endswith("ies"):
        return t[:-3] + "y"
    if n > 4 and t.endswith("ing"):
        return _dedouble_py(t[:-3])
    if n > 3 and t.endswith("ed") and not t.endswith("eed"):
        return _dedouble_py(t[:-2])
    if n > 2 and t.endswith("s") and not t.endswith("ss") and not t.endswith("us"):
        return t[:-1]
    return t


def ngrams(col: Column, n: int = 3) -> Column:
    """Character n-grams of the lowercased string (tok/tok.go ngram)."""
    lowered = F.lower(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lowered) - (n - 1), F.lit(0))),
        lambda i: lowered.substr(i, F.lit(n)),
    )


def trigrams(col: Column) -> Column:
    return ngrams(col, 3)


def any_of_terms(col: Column, query: str) -> Column:
    """anyofterms(p, "a b") — any whitespace-separated query term present."""
    qtoks = [t.lower() for t in query.split() if t]
    if not qtoks:
        return F.lit(False)
    return F.arrays_overlap(term_tokens(col), F.array(*[F.lit(t) for t in qtoks]))


def all_of_terms(col: Column, query: str) -> Column:
    """allofterms — every query term present (worker/task.go:303-305
    needsIntersect)."""
    qtoks = list(dict.fromkeys(t.lower() for t in query.split() if t))
    if not qtoks:
        return F.lit(True)
    toks = term_tokens(col)
    cond = F.array_contains(toks, qtoks[0])
    for t in qtoks[1:]:
        cond = cond & F.array_contains(toks, t)
    return cond


def any_of_text(col: Column, query: str) -> Column:
    """anyoftext — fulltext analyzer applied to both sides."""
    qtoks = [_stem_py(t.lower()) for t in query.split()
             if t and t.lower() not in EN_STOPWORDS]
    if not qtoks:
        return F.lit(False)
    return F.arrays_overlap(fulltext_tokens(col), F.array(*[F.lit(t) for t in qtoks]))


def all_of_text(col: Column, query: str) -> Column:
    qtoks = [_stem_py(t.lower()) for t in query.split()
             if t and t.lower() not in EN_STOPWORDS]
    if not qtoks:
        return F.lit(True)
    toks = fulltext_tokens(col)
    cond = F.array_contains(toks, qtoks[0])
    for t in qtoks[1:]:
        cond = cond & F.array_contains(toks, t)
    return cond


# ---- custom tokenizer plugins (tok/tok.go:134-151 LoadCustomTokenizer;
# queried via anyof/allof — worker/task.go:269-270). A tokenizer is any
# Column -> Column(array<string>) function registered by name.
_CUSTOM_TOKENIZERS: dict = {}


def register_tokenizer(name: str, fn) -> None:
    """Register a custom tokenizer: ``fn(col) -> array<string> Column``.
    The Spark analogue of dgraph's Go-plugin tokenizers — a column
    expression (or pandas-UDF-backed column) instead of a shared object."""
    _CUSTOM_TOKENIZERS[name] = fn


def get_tokenizer(name: str):
    if name not in _CUSTOM_TOKENIZERS:
        raise KeyError(f"unknown custom tokenizer {name!r}")
    return _CUSTOM_TOKENIZERS[name]


def any_of_custom(col: Column, tokenizer: str, query: str) -> Column:
    """anyof(pred, tokenizer, q) — any shared custom token."""
    fn = get_tokenizer(tokenizer)
    toks = fn(col)
    qtoks = [t for t in query.split() if t]
    if not qtoks:
        return F.lit(False)
    return F.arrays_overlap(toks, F.array(*[F.lit(t) for t in qtoks]))


def all_of_custom(col: Column, tokenizer: str, query: str) -> Column:
    fn = get_tokenizer(tokenizer)
    toks = fn(col)
    qtoks = list(dict.fromkeys(t for t in query.split() if t))
    if not qtoks:
        return F.lit(True)
    cond = F.array_contains(toks, qtoks[0])
    for t in qtoks[1:]:
        cond = cond & F.array_contains(toks, t)
    return cond


def regexp_match(col: Column, pattern: str) -> Column:
    """regexp(p, /re/flags) — flags: i. Spark evaluates the regex exactly;
    no trigram prefilter + verify pass needed (worker/task.go:1161-1199)."""
    body, _, flags = pattern.rpartition("/")
    body = body.lstrip("/") if body.startswith("/") else body
    if "i" in flags:
        body = "(?i)" + body
    return col.rlike(body)


def fuzzy_match(col: Column, target: str, max_dist: int) -> Column:
    """match(p, s, dist) — Levenshtein <= dist (worker/match.go:24)."""
    return F.levenshtein(F.lower(col), F.lit(target.lower())) <= max_dist


def ngram_search(col: Column, query: str, n: int = 3) -> Column:
    """ngram(p, q): n-gram containment — all query n-grams appear in the
    stored value's n-gram set (tok/tok.go:447-551)."""
    q = query.lower()
    grams = {q[i : i + n] for i in range(max(len(q) - n + 1, 0))} or {q}
    toks = ngrams(col, n)
    cond = F.lit(True)
    for g in grams:
        cond = cond & F.array_contains(toks, g)
    return cond
