"""Training-data pipeline operators: chunking, PII scrubbing,
stratified sampling, benchmark decontamination.

Like textstats.py, every operator is a deterministic pure column
program so each has an exact DuckDB oracle twin — the formulas below
ARE the spec. Regexes avoid lookaround so the same pattern text is
valid in both engines (Java regex and RE2).

100 TB notes: chunking and scrubbing are narrow per-row transforms
(no shuffle); stratified sampling is one window over the stratum key
(one shuffle, skew-bounded by the per-stratum cap); decontamination
is a semi-join against the exploded benchmark shingle set — broadcast
the benchmark side (it is the small side by construction) and the doc
side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dgraph_spark.operators.dedup import normalized

# fixed, engine-portable redaction patterns (no lookaround)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\+?\d[\d()\- ]{7,}\d", "<PHONE>"),
]


def _ws_tokens(col: Column) -> Column:
    """Whitespace tokens of the original (case-preserved) text."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token windows with overlap: one output row per chunk
    ``(doc_id, chunk_id, n_tokens, chunk)``. Chunk i covers tokens
    [i*stride, i*stride + window); the last chunk may be short; a
    document shorter than one window yields exactly one chunk. Pure
    per-row transform — no shuffle at any scale."""
    if not (0 <= overlap < window):
        raise ValueError("need 0 <= overlap < window")
    stride = window - overlap
    toks = _ws_tokens(F.col(text_col))
    n = F.size(toks)
    # chunk start offsets 0, stride, 2*stride, ... covering every token
    nchunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(window)) / F.lit(stride)) + 1)
    starts = F.sequence(F.lit(0), (nchunks - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_id"),
            F.least(n - s, F.lit(window)).alias("n_tokens"),
            F.array_join(F.slice(toks, s + 1, window), " ").alias("chunk"),
        ),
    )
    return (
        docs.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_id", "c.n_tokens", "c.chunk")
    )


def scrub_pii(col: Column) -> Column:
    """Redact emails, URLs and phone-like digit runs with fixed
    placeholders (PII_PATTERNS is the spec, applied in order)."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def sample_stratified(
    docs: DataFrame,
    stratum_col: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum cap: keep the ``cap`` rows whose
    md5(id) sorts first within each stratum — a reproducible balanced
    sample (language/source balancing for training mixes). One window
    shuffle on the stratum key; the cap bounds any stratum's output so
    downstream skew is impossible."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every document sharing ANY word n-gram with the benchmark
    set (test-set decontamination). Shingles are n-grams of the
    normalized text; the benchmark shingle set is the broadcast side
    of a left-anti join, so the corpus side never shuffles."""
    def shingled(df):
        toks = F.split(normalized(F.col(text_col)), " ")
        # guard: Spark's sequence(1, 0) is DECREASING ([1, 0]), so a
        # doc shorter than one shingle must yield an empty gram list
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(F.col(id_col), F.explode(grams).alias("g"))

    bad = shingled(bench).select("g").distinct()
    hit = (shingled(docs).join(F.broadcast(bad), "g", "left_semi")
           .select(id_col).distinct())
    return docs.join(hit, id_col, "left_anti")


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Sequence packing for training batches: documents are concatenated
    in id order within each stratum and the token stream is cut into
    fixed-``budget`` sequences. Emits per document its token offset in
    the stratum stream and the first/last sequence index it lands in
    (``first_seq == last_seq`` means the document fits in one training
    sequence; empty documents are pinned to the sequence at their
    offset).

    One shuffle: the running-sum window on the stratum key. Strata are
    bounded categories (source/language), so at 100 TB each stratum is
    a single sort — for a monster stratum, pre-split it with a salt
    column and treat each salt shard as its own stream (packing does
    not require global order, only a deterministic one).

    ``tokens_col`` packs by a precomputed token-count column instead
    of whitespace counts — e.g. join in ``bpe_encode``'s
    ``n_bpe_tokens`` to pack by real subword lengths."""
    # LongType throughout: offsets overflow int32 at crawl scale, and
    # the DuckDB twin's len()/sums are BIGINT — same pandas dtype both
    # sides (the driver's value hash is dtype-sensitive)
    n = (F.col(tokens_col) if tokens_col is not None
         else F.size(_ws_tokens(F.col(text_col)))).cast("long")
    w = Window.partitionBy(stratum_col).orderBy(id_col)
    return (
        docs.select(F.col(stratum_col), F.col(id_col), n.alias("n_tokens"))
        .withColumn("tok_offset",
                    F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("first_seq", F.floor(F.col("tok_offset") / budget))
        .withColumn(
            "last_seq",
            F.floor((F.col("tok_offset")
                     + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / budget))
    )


def c4_line_clean(
    docs: DataFrame,
    min_words: int = 3,
    min_lines: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, the
    public C4 heuristics): a LINE is retained iff it ends in terminal
    punctuation (. ! ? ") and has at least ``min_words`` whitespace
    words; a DOCUMENT is dropped entirely if it contains a curly
    brace (code), the phrase "lorem ipsum", or fewer than
    ``min_lines`` retained lines. Output one row per input document:
    ``(doc_id, keep, n_lines, n_kept, clean_text)`` with clean_text
    the retained lines re-joined (NULL when keep is false).

    Pure per-row column program — no shuffle at any scale; the split/
    filter/join runs inside whole-stage codegen. The line predicate
    avoids regex lookaround so the DuckDB twin uses the same pattern
    text.

    The whole program is ONE let-bound expression (textstats._let):
    lowered text, line array, kept array, and the keep flag are each
    bound once, so a downstream ``.where("keep")`` — THE consumption
    pattern for a cleaning filter — pushes to the scan as a
    single-pass predicate instead of inlining a copy of the line
    machinery per reference (projection aliases survive
    CollapseProject but NOT filter pushdown; see PLANS.md round 9).
    """
    from dgraph_spark.operators.textstats import _let

    c = F.col(text_col)

    def line_pred(l):
        return _let(
            F.trim(l),
            lambda s: s.rlike(r'[.!?"]$')
            & (F.size(F.filter(F.split(s, r"\s+"),
                               lambda t: t != "")) >= min_words))

    fused = _let(F.lower(c), lambda low: _let(
        F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != ""),
        lambda lines: _let(
            F.filter(lines, line_pred),
            lambda kept: _let(
                (~(low.contains("{") | low.contains("}")
                   | low.contains("lorem ipsum")))
                & (F.size(kept) >= min_lines),
                lambda keep: F.struct(
                    keep.alias("keep"),
                    F.size(lines).alias("n_lines"),
                    F.size(kept).alias("n_kept"),
                    F.when(keep, F.array_join(kept, "\n"))
                     .alias("clean_text"))))))
    return docs.select(F.col(id_col), fused.alias("_s")).select(
        id_col,
        F.col("_s.keep").alias("keep"),
        F.col("_s.n_lines").alias("n_lines"),
        F.col("_s.n_kept").alias("n_kept"),
        F.col("_s.clean_text").alias("clean_text"),
    )


def _hex_frac_literal(frac: float) -> str:
    """The 8-hex-digit string h such that a uniform md5-prefix compare
    ``substr(md5(x), 1, 8) < h`` keeps ~``frac`` of rows. Hex digits
    sort lexicographically in numeric order, so the string compare IS
    the numeric compare — portable to any engine with md5()."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError("frac must be in [0, 1]")
    return format(min(int(frac * 2**32), 2**32 - 1), "08x")


def domain_mix(
    docs: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain re-weighting for a training mix (the
    DoReMi / data-mixture step): each domain's rows are up- or
    down-sampled by its weight. Weight w emits floor(w) full copies
    of every row plus one more for the ~frac(w) of rows whose
    md5(id || domain) prefix falls under the fractional threshold —
    reproducible (pure hash, no RNG state), and exactly w in
    expectation. Domains absent from ``weights`` default to 1.0.
    Output is ``(doc_id, domain, copy)`` with copy = 0..k-1.

    Scale shape: a narrow per-row transform + explode — no shuffle,
    no window, no driver state; the weight table is a literal CASE
    expression (bounded domain cardinality). Downsampling (w < 1)
    never materializes dropped rows.
    """
    copies = F.lit(None).cast("int")
    thresh = F.lit(None).cast("string")
    for dom, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {dom!r}")
        copies = F.when(F.col(domain_col) == dom,
                        F.lit(int(w))).otherwise(copies)
        thresh = F.when(F.col(domain_col) == dom,
                        F.lit(_hex_frac_literal(w - int(w)))
                        ).otherwise(thresh)
    copies = F.coalesce(copies, F.lit(1))
    thresh = F.coalesce(thresh, F.lit("00000000"))
    u = F.substring(
        F.md5(F.concat_ws("|", F.col(id_col).cast("string"),
                          F.col(domain_col))), 1, 8)
    total = copies + F.when(u < thresh, 1).otherwise(0)
    return (
        docs.select(F.col(id_col), F.col(domain_col).alias("domain"),
                    total.alias("_k"))
        .where(F.col("_k") > 0)
        .select(id_col, "domain",
                F.explode(F.sequence(F.lit(0), F.col("_k") - 1))
                 .alias("copy"))
    )


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in the
    split whose cumulative md5-prefix interval contains its hash —
    reproducible across runs/engines (no RNG state, no sampleBy
    seed), stable under corpus growth (a document's split never
    changes when other documents are added), and disjoint+exhaustive
    by construction. ``fractions`` must sum to 1 (±1e-9); iteration
    order of the dict sets interval order. Output adds a ``split``
    column. Narrow per-row transform — no shuffle at any scale.
    """
    tot = sum(fractions.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {tot}, expected 1.0")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("negative fraction")
    u = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt),
                          F.col(id_col).cast("string"))), 1, 8)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(_hex_frac_literal(min(acc, 1.0)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def contamination_scores(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Graded benchmark-overlap report (the GPT-3-appendix variant of
    decontamination): for every document, the fraction of its word
    n-grams that appear anywhere in the benchmark set —
    (id, n_grams, matched, overlap_frac). `decontaminate` is the
    overlap_frac > 0 special case; pipelines threshold this instead
    when exact-match dropping is too aggressive.

    Same shape as decontaminate: benchmark shingles broadcast, corpus
    side never shuffles (per-doc counts come from the map-side of the
    broadcast semi-join aggregated on the already-partitioned id)."""
    def shingles(df):
        toks = F.split(normalized(F.col(text_col)), " ")
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(F.col(id_col), grams.alias("grams"))

    bad = (shingles(bench).select(F.explode("grams").alias("g"))
           .distinct())
    per_doc = shingles(docs).select(
        F.col(id_col), F.explode_outer("grams").alias("g"))
    hit = per_doc.join(F.broadcast(bad), "g", "left_semi") \
                 .groupBy(id_col).agg(F.count("*").alias("matched"))
    total = per_doc.where(F.col("g").isNotNull()) \
                   .groupBy(id_col).agg(F.count("*").alias("n_grams"))
    return (
        docs.select(id_col)
        .join(total, id_col, "left")
        .join(hit, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("matched", F.lit(0)).alias("matched"),
            F.when(F.coalesce("n_grams", F.lit(0)) > 0,
                   F.round(F.coalesce("matched", F.lit(0))
                           / F.col("n_grams"), 4))
             .otherwise(F.lit(0.0)).alias("overlap_frac"),
        )
    )


def corpus_report(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-stratum dataset card: document count, token sum/mean, char
    sum, distinct-language count — the mixing-weight input for a
    training run. One hash aggregation on the stratum key (map-side
    partials; stratum cardinality is bounded, so the reduce side is
    trivially small at any corpus size)."""
    ntok = F.size(_ws_tokens(F.col(text_col)))
    return (
        docs.select(F.col(stratum_col), F.col(id_col),
                    ntok.alias("_nt"), F.length(text_col).alias("_nc"),
                    F.col(lang_col).alias("_lang"))
        .groupBy(stratum_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.round(F.avg("_nt"), 4).alias("mean_tokens"),
            F.sum("_nc").alias("n_chars"),
            F.count_distinct(F.col("_lang")).alias("n_langs"),
        )
    )
