"""Text-analysis operators for LLM-data pipelines: token counting, quality
scoring, language ID, fingerprinting.

All of these are pure JVM-side column expressions (whole-stage codegen) —
no Python in the hot path — so they scan at parquet speed at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from era_parser_spark.operators.dedup import tokens_col

# Tiny high-frequency marker sets per language (heuristic n-gram/stopword ID).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "for", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "他"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")


def token_count_col(text_col: str | Column) -> Column:
    return F.size(tokens_col(text_col))


def load_lang_markers(path: str) -> dict[str, tuple[str, ...]]:
    """Load a marker-word table: one line per language, `lang w1 w2 ...`.

    The pluggable upgrade path for `lang_id_col` (same pattern as t5's
    optional merges.txt BPE vocab): ship a real frequency-derived wordlist
    per language and the operator's plan is unchanged — only the literal
    sets in the codegen'd filter grow.  Lines starting with '#' and blank
    lines are ignored; a language may repeat (lists concatenate).
    """
    table: dict[str, list[str]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            table.setdefault(parts[0], []).extend(parts[1:])
    # A language with zero marker words would later make stopword_hits call
    # Column.isin() with no arguments and fail far from the cause — reject
    # it here, at load time, with the file named.
    empty = sorted(lang for lang, ws in table.items() if not ws)
    if empty:
        raise ValueError(
            f"{path}: marker table has no words for language(s) {empty}"
        )
    return {lang: tuple(ws) for lang, ws in table.items()}


def stopword_hits(
    tok: Column, lang: str, markers: dict[str, tuple[str, ...]] | None = None
) -> Column:
    """Number of tokens that are marker stopwords for `lang`."""
    words = (markers or STOPWORDS)[lang]
    return F.size(F.filter(tok, lambda x: x.isin(*words)))


def lang_id_col(
    text_col: str | Column,
    markers: dict[str, tuple[str, ...]] | None = None,
    order: tuple[str, ...] | None = None,
) -> Column:
    """Argmax of per-language marker-word hits; 'und' when none match.

    Ties break in `order` (first listed wins), matching sql_lang_scores.
    Defaults to the built-in 10-word sets (the deterministic oracle path);
    pass `markers` from `load_lang_markers` for a real wordlist.
    """
    markers = markers or STOPWORDS
    order = order or (LANG_ORDER if markers is STOPWORDS else tuple(markers))
    tok = tokens_col(text_col)
    scores = {lang: stopword_hits(tok, lang, markers) for lang in order}
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in order:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def sql_lang_scores(tok_expr: str) -> dict[str, str]:
    """DuckDB per-language score expressions matching stopword_hits."""
    return {
        lang: (
            f"len(list_filter({tok_expr}, x -> x IN "
            f"({', '.join(repr(w) for w in STOPWORDS[lang])})))"
        )
        for lang in LANG_ORDER
    }


def quality_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document-quality metrics.

    n_tokens, n_chars, avg_token_len, punct_ratio, stopword_ratio, and a
    composite quality_ok flag — the usual cheap pre-filters before expensive
    dedup/training steps.
    """
    tok = tokens_col(text_col)
    n_tokens = F.size(tok)
    n_chars = F.length(F.col(text_col))
    nonspace = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.!?,;:]", ""))
    stop = stopword_hits(tok, "en")
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (nonspace.cast("double") / n_tokens).alias("avg_token_len"),
        (punct.cast("double") / n_chars).alias("punct_ratio"),
        (stop.cast("double") / n_tokens).alias("stopword_ratio"),
        ((n_tokens >= 10) & (n_tokens <= 100000)).alias("quality_ok"),
    )


def fingerprint_col(text_col: str | Column) -> Column:
    """Normalized-content fingerprint: md5 over whitespace-normalized tokens.

    Whitespace/casing-insensitive, so reformatted copies collide — the cheap
    tier of dedup before shingle-based near-dup.
    """
    return F.md5(F.concat_ws(" ", tokens_col(text_col)))


# BPE-ish pre-tokenizer: letter runs | single digits | punctuation runs.
# Deliberately lookahead-free so Java regex (Spark) and RE2 (DuckDB) agree.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_token_count_col(
    text_col: str | Column, merges_path: str | None = None
) -> Column:
    """Subword-style token count.

    Default (merges_path=None): the BPE-ish pre-tokenization regex — a
    cheap, exactly-oracle-able stand-in that stays in whole-stage codegen.
    With `merges_path`: the real byte-pair-encoding merge loop from a
    merges.txt-style file, run task-side as an Arrow-batched pandas UDF
    over the SAME pre-token pieces (see operators/tokenizer.py) — counts
    change, every consumer (packing, quotas) works unchanged.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if merges_path is not None:
        from era_parser_spark.operators.tokenizer import real_bpe_token_count_col

        return real_bpe_token_count_col(c, merges_path)
    return F.regexp_count(c, F.lit(BPE_PATTERN))


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition signal (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): the fraction of word n-grams that are repeats
    of an earlier n-gram in the same document — boilerplate- and
    template-spam documents score high and get filtered before training.

    dup_ngram_ratio = 1 - distinct_ngrams / total_ngrams (0.0 when the
    document is shorter than n words).

    Pure JVM higher-order expressions — transform over an index sequence
    builds the n-gram array, array_distinct counts uniques — so the whole
    signal is per-row codegen with NO shuffle and no Python: it scans at
    parquet speed at any corpus size, like the other quality pre-filters.
    """
    base = df.select(F.col(id_col), tokens_col(text_col).alias("__tok"))
    t = F.col("__tok")
    # sequence() flips to a descending range when end < start, so short
    # docs must short-circuit to an empty gram list, not sequence(1, 0)
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = base.select(
        F.col(id_col), F.size(t).alias("n_tokens"), grams.alias("__g")
    )
    n_grams = F.size("__g")
    n_distinct = F.size(F.array_distinct("__g"))
    return g.select(
        F.col(id_col),
        "n_tokens",
        n_grams.alias("n_ngrams"),
        n_distinct.alias("n_distinct_ngrams"),
        F.when(
            n_grams > 0, F.lit(1.0) - n_distinct.cast("double") / n_grams
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_ratio"),
    )


def term_salience(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-k salient terms per document by tf/df (a div-exact tf-idf stand-in).

    score = term_frequency / document_frequency: division of two exact
    integers, so engines agree bitwise (a log-based idf would be at the
    mercy of each engine's libm rounding).

    Scale shape: the token explode combines map-side into one row per
    (doc, term); document frequency is a count window OVER that tf table
    partitioned by term (never the raw token stream, and — plan-audited —
    never a second scan: an aggregate-and-join formulation makes Catalyst
    recompute the explode for each branch).  A stopword in every doc costs
    |docs| tf rows, linear not quadratic.  The final top-k runs under
    WindowGroupLimit: partial limit before the doc_id shuffle.
    """
    from pyspark.sql import Window as W

    ex = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    tf = ex.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("term"))
    ).withColumn("score", F.col("tf").cast("double") / F.col("df"))
    w = W.partitionBy(id_col).orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tf", "df", "score", "rn")
    )


def rarity_score(
    df: DataFrame, id_col: str, text_col: str, quant: int = 1_000_000
) -> DataFrame:
    """Per-document token-rarity score — a surprisal/perplexity proxy for
    gibberish and OCR-noise detection: documents dominated by tokens that
    appear in few other documents score high; stopword-heavy prose scores
    low.  score = sum over token occurrences of (quant div df(token)),
    normalized by token count.

    Exactness: `quant div df` is integer division (bit-identical in any
    engine — unlike log-based idf, which is at the mercy of each libm),
    and the per-doc sum is an exact BIGINT, order-independent under any
    partitioning; only the final normalization divides as doubles.

    Scale shape: same single-scan discipline as term_salience — df is a
    count window OVER the (doc, term, tf) table, never a second pass of
    the raw token stream; one explode, two map-side-combinable shuffles.
    """
    from pyspark.sql import Window as W

    ex = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    tf = ex.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("term"))
    ).withColumn(
        "q_rarity", F.col("tf") * F.expr(f"{quant} div df")
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum("q_rarity").cast("long").alias("q_rarity_sum"),
        (F.sum("q_rarity") / (F.lit(float(quant)) * F.sum("tf"))).alias(
            "mean_rarity"
        ),
    )


def boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 2,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Cross-document boilerplate removal (the CCNet/RefinedWeb line-dedup
    step, chunk-granular): a token chunk occurring in more than
    `max_doc_freq` DISTINCT documents is template text (headers, cookie
    banners, license blurbs) and is stripped from every document; the
    survivors are reassembled in order.  Output: (id, clean_text,
    n_chunks, n_kept) — documents that were pure boilerplate come back
    with clean_text = '' rather than vanishing.

    This is the upstream pass docs/PLANS.md prescribes when dd2's
    hot-shingle guard reports a climbing dropped-index fraction: strip the
    boilerplate BEFORE near-dup mining and the guard has nothing to drop.

    Scale shape: exactly TWO corpus scans (one tokenizes for the
    distinct-doc-count agg, one for the rewrite — recomputing beats a
    corpus-scale cache, the staging lesson in docs/PLANS.md); the hot set
    is tiny and broadcast.  Hot chunks are MASKED to null rather than
    filtered, so n_chunks/n_kept/clean_text all come out of ONE final
    groupBy(id) — no anti-join and no join-back, and fully-stripped docs
    never vanish.  Position rides in the collected struct so the
    reassembly is order-proof under any partitioning.
    """
    # tokens are materialized in their own projection: referencing the
    # split() expression inside a higher-order lambda re-evaluates the
    # regex per element (measured 1.4x slower); and for the default
    # chunk_tokens=2 the chunks come from one even/odd filter + zip_with
    # pass instead of a per-chunk slice+join (another 1.5x — HOF slices
    # are interpreted, so per-chunk work costs real time).  NULL text
    # coalesces to '' BEFORE tokenizing (the oracle does the same): a
    # null-text doc must come back as one empty chunk, not vanish from
    # the posexplode.
    base = df.select(
        F.col(id_col),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("__tok"),
    )
    tok = F.col("__tok")
    if chunk_tokens == 2:
        chunks = F.zip_with(
            F.filter(tok, lambda x, i: i % 2 == 0),
            F.filter(tok, lambda x, i: i % 2 == 1),
            lambda a, b: F.when(b.isNull(), a).otherwise(
                F.concat_ws(" ", a, b)
            ),
        )
    else:
        n_chunks = F.ceil(F.size(tok) / F.lit(float(chunk_tokens)))
        chunks = F.transform(
            F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
            lambda i: F.array_join(
                F.slice(tok, i * chunk_tokens + 1, chunk_tokens), " "
            ),
        )
    ex = base.select(F.col(id_col), chunks.alias("__chunks")).select(
        F.col(id_col), F.posexplode("__chunks").alias("pos", "chunk")
    )
    hot = (
        ex.groupBy("chunk")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("chunk", F.lit(True).alias("__hot"))
    )
    masked = ex.join(F.broadcast(hot), "chunk", "left").select(
        F.col(id_col),
        "pos",
        F.when(F.col("__hot").isNull(), F.col("chunk")).alias("chunk"),
    )
    return masked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s.getField("chunk").isNotNull(),
                ),
                lambda s: s.getField("chunk"),
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.count("chunk").cast("long").alias("n_kept"),
    )


# PII patterns applied in order: (name, regex, replacement token).  The
# regexes are deliberately RE2-safe (no lookaround, no backrefs) so the
# same pattern string runs identically under Java regex (Spark) and RE2
# (DuckDB) — that is what makes the operator exactly oracle-able.  The
# three classes are disjoint on typical text (emails need '@', IPv4 needs
# three digit-dot groups, phones need a leading '+'), but NOT strictly so:
# a pathological local part like `user+1-555-123-4567@x.com` matches both
# the email and phone regexes, in which case the raw-text n_phone counts a
# span the earlier email redaction already consumed and redacted_text shows
# one `<EMAIL>`, not a `<PHONE>`.  Counts are per-class totals over raw
# text, not a partition of redacted spans.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d-]{7,}\d", "<PHONE>"),
)


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers from a text column.

    The standard pre-release scrub in training-data pipelines (reference
    has no text tier; this extends SURVEY §2.G).  Output: (id, n_email,
    n_ipv4, n_phone, redacted_text).  Counts are per-class matches on the
    raw text; the redacted text applies all classes in PII_PATTERNS order.

    Scale shape: pure JVM regexp expressions (whole-stage codegen), zero
    shuffles — scans at parquet speed on any corpus.  Swap PII_PATTERNS
    for a jurisdiction-specific set without touching the plan.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.size(F.regexp_extract_all(raw, F.lit(pat), F.lit(0))).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    redacted = raw
    for _, pat, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select(F.col(id_col), *counts, redacted.alias("redacted_text"))


def sql_pii_exprs(text_expr: str) -> tuple[list[str], str]:
    """DuckDB twins of pii_redact's count and redaction expressions."""
    counts = [
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    ]
    red = text_expr
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return counts, red


def intra_doc_span_strip(df: DataFrame, id_col: str, text_col: str, l: int = 8) -> DataFrame:
    """Intra-document repeated-span removal — the within-doc half of
    substring dedup (Lee et al.): every token covered by a SECOND-or-later
    occurrence of any l-gram that repeats inside the same document is
    removed; first occurrences stay; survivors reassemble in order.
    Documents that were pure repetition come back with clean_text = ''.

    Output: (id, clean_text, n_tokens, n_removed).

    Scale shape: grams via one lead-window over the token stream (no
    interpreted HOF slices), repeat detection is a per-(doc, gram)
    row_number on the SAME partitioning, covered positions explode from
    the (rare) repeated occurrences only, and the rewrite is one
    aggregate — everything partitions by doc id, so each document's work
    stays on one task regardless of corpus size.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "pos", "__tk"
        ),
    )
    w = W.partitionBy(id_col).orderBy("pos")
    parts = [F.col("__tk")] + [F.lead("__tk", k).over(w) for k in range(1, l)]
    grams = base.select(
        F.col(id_col),
        "pos",
        F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts)).alias("__gram"),
    ).filter(F.col("__gram").isNotNull())
    wg = W.partitionBy(id_col, "__gram").orderBy("pos")
    covered = (
        grams.withColumn("__occ", F.row_number().over(wg))
        .filter(F.col("__occ") >= 2)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (l - 1))).alias("pos"),
        )
        .distinct()
    )
    kept = base.join(covered, [id_col, "pos"], "left_anti")
    rewritten = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "__tk"))),
                lambda s: s.getField("__tk"),
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = base.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        totals.join(rewritten, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def normalize_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonicalize text ahead of exact dedup / fingerprinting: lowercase,
    strip non-alphanumeric characters to spaces, collapse whitespace runs,
    trim.  Two visually-different copies of the same content ("Hello,
    World!" vs "hello world") normalize to one digest — run dd1 on
    `norm_text` instead of raw text to catch them.

    Pure codegen regexp expressions, zero shuffle.  ASCII-scoped on
    purpose: Unicode NFC folding needs ICU (absent here) and would slot
    in as one more expression in this chain.

    Output: (id, norm_text, changed).
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(raw), r"[^a-z0-9\s]+", " "), r"\s+", " "
        )
    )
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        (norm != raw).alias("changed"),
    )


def html_strip(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Strip HTML/XML markup from a text column — step one of web-corpus
    cleaning (the CCNet/RefinedWeb extraction stage, tag-level): tags go
    to spaces, entities to their characters, whitespace collapses.
    RE2-safe patterns (no lookaround) so the rewrite is exactly
    oracle-able; a real pipeline swaps in a DOM extractor behind the same
    signature when structure (not just tags) must go.

    Output: (id, clean_text, n_tags).  Zero-shuffle codegen.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    n_tags = F.size(F.regexp_extract_all(raw, F.lit(r"<[^>]*>"), F.lit(0))).cast("long")
    clean = F.regexp_replace(raw, r"<[^>]*>", " ")
    # `&amp;` must decode LAST: pre-escaped text like `&amp;lt;` means the
    # literal string "&lt;" and must come out as exactly that, not double-
    # decode to "<".  (Decoding `&amp;` first would re-expose an `&lt;` that
    # the later passes then wrongly consume.)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&nbsp;", " "), ("&amp;", "&")):
        clean = F.regexp_replace(clean, ent, ch)
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    return df.select(F.col(id_col), clean.alias("clean_text"), n_tags.alias("n_tags"))


def line_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-wide line-level deduplication with keep-first semantics —
    the CCNet line-dedup stage (Wenzek et al., CCNet): a line whose
    normalized form (trimmed, lowercased) already appeared at an earlier
    corpus position keeps only that FIRST occurrence; later copies are
    dropped from their documents.  Distinct from `boilerplate_strip`
    (frequency threshold, drops ALL copies) and `intra_doc_span_strip`
    (within-document only).

    "Earlier" is the total order (id, line_index), so the survivor set is
    deterministic under any partitioning.  Blank lines are kept verbatim
    (they carry document structure, and deduping them would glue
    paragraphs).  Output: (id, clean_text, n_lines, n_kept), clean_text
    re-joined with newlines in original line order.

    Scale shape: lines shuffle once keyed by md5(normalized line) — a
    fixed 32-byte key, so the exchange never carries full line text twice
    — for a min(struct(id, idx)) aggregate; the winner set joins back on
    the same key (exchange reused), then one per-doc reassembly
    aggregate.  md5 keys make the plan exactly SQL-rederivable (DuckDB
    has md5; an engine-only hash would force a rows-only gate); key
    collisions would merge unrelated lines — at 128 bits, negligible and
    accepted.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("__idx", "__line"),
    )
    norm = F.trim(F.lower(F.col("__line")))
    keyed = lines.select(
        F.col(id_col), "__idx", "__line",
        F.when(norm != "", F.md5(norm)).alias("__k"),
    )
    firsts = (
        keyed.filter(F.col("__k").isNotNull())
        .groupBy("__k")
        .agg(F.min(F.struct(F.col(id_col), F.col("__idx"))).alias("__first"))
        .select(
            "__k",
            F.col("__first").getField(id_col).alias("__fid"),
            F.col("__first.__idx").alias("__fidx"),
        )
    )
    kept = keyed.join(firsts, "__k", "left").filter(
        F.col("__k").isNull()
        | ((F.col(id_col) == F.col("__fid")) & (F.col("__idx") == F.col("__fidx")))
    )
    rewritten = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__line"))),
                lambda s: s.getField("__line"),
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .cast("long")
        .alias("n_lines"),
    )
    return totals.join(rewritten, id_col, "left").select(
        F.col(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce("__n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


#: RE2-safe URL pattern (no lookaround): scheme://host[/path] where host
#: stops at whitespace and path stops at whitespace or closing quote/paren.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(:\d+)?(/[^\s\"')>]*)?"


def url_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Extract URLs from a text column and summarize per document — the
    web-corpus provenance/outlink pass (count links, normalize hosts for
    domain-level curation like p6).  Output: (id, n_urls,
    n_unique_domains, domains) where domains is the comma-joined sorted
    distinct lowercased hostnames (a scalar string, so results hash
    deterministically).

    Zero-shuffle whole-stage codegen: regexp_extract_all + array ops on
    the scan; the RE2-safe pattern makes the extraction exactly
    re-derivable in the DuckDB oracle.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    urls = F.regexp_extract_all(raw, F.lit(URL_PATTERN), F.lit(0))
    hosts = F.array_distinct(
        F.transform(
            urls,
            lambda u: F.lower(
                F.regexp_replace(
                    F.regexp_replace(u, r"^https?://", ""), r"[:/].*$", ""
                )
            ),
        )
    )
    return df.select(
        F.col(id_col),
        F.size(urls).cast("long").alias("n_urls"),
        F.size(hosts).cast("long").alias("n_unique_domains"),
        F.array_join(F.array_sort(hosts), ",").alias("domains"),
    )


def bigram_lm_score(
    df: DataFrame, id_col: str, text_col: str, quant: int = 1_000_000
) -> DataFrame:
    """Corpus-bigram language-model fluency score — the deterministic
    stand-in for CCNet's KenLM perplexity filter: for every bigram
    occurrence (w1, w2) in a document, its scaled conditional probability
    is q(w1,w2) = quant * c(w1,w2) div c(w1·) (integer division over
    corpus counts, where c(w1·) counts w1's occurrences AS A BIGRAM
    PREFIX); the document's fluency is the mean over its bigram
    occurrences.  Text whose transitions are typical of the corpus scores
    high; shuffled/gibberish text scores low — the same ordering a real
    LM perplexity gives, with exact integer math instead of libm logs
    (the t8/rarity trick applied to transitions).  A real KenLM slots in
    behind the same signature as an Arrow-batched UDF.

    Output: (id, n_bigrams, q_prob_sum, mean_prob) — docs with < 2 tokens
    emit n_bigrams=0 and mean_prob 0.0.

    Scale shape: one token explode feeding a (doc, bigram, count) agg;
    prefix totals are a count window over that SAME aggregated table
    (never a second pass of the raw stream); the shuffle carries bigram
    strings + counts, not documents.
    """
    from pyspark.sql import Window as W

    tok = tokens_col(text_col)
    grams = F.when(
        F.size(tok) >= 2,
        F.zip_with(
            F.slice(tok, 1, F.size(tok) - 1),
            F.slice(tok, 2, F.size(tok) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = df.select(F.col(id_col), F.explode(grams).alias("bg"))
    tf = ex.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("tf"))
    w1 = F.split(F.col("bg"), " ", 2).getItem(0)
    scored = (
        tf.withColumn("c_bg", F.sum("tf").over(W.partitionBy("bg")))
        .withColumn("__w1", w1)
        .withColumn("c_w1", F.sum("tf").over(W.partitionBy("__w1")))
        .withColumn("q", F.col("tf") * F.expr(f"({quant} * c_bg) div c_w1"))
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.sum("q").cast("long").alias("q_prob_sum"),
    )
    base = df.select(F.col(id_col))
    return base.join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("q_prob_sum", F.lit(0)).cast("long").alias("q_prob_sum"),
        F.when(
            F.coalesce("n_bigrams", F.lit(0)) > 0,
            F.col("q_prob_sum") / (F.lit(float(quant)) * F.col("n_bigrams")),
        ).otherwise(F.lit(0.0)).alias("mean_prob"),
    )


def char_ngrams_col(text_col: str | Column, n: int = 3) -> Column:
    """Character n-grams of a text column ASSUMED ALREADY NORMALIZED
    (lowercased, null-coalesced) — transform over an index sequence with
    Column.substr on a column position.

    The lambda must reference a PLAIN column, never a computed expression:
    HOF lambdas are interpreted, so an embedded lower(coalesce(...))
    would re-run the full lowercase pass once per n-gram position —
    O(len^2) character work per document (the CLAUDE.md HOF rule).
    Callers materialize the normalized text first (see
    train_lang_profiles / trained_lang_id).
    """
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_lang_profiles(
    train_df: DataFrame,
    text_col: str,
    label_col: str,
    n: int = 3,
    quant: int = 1_000_000,
) -> DataFrame:
    """TRAIN a language-ID model from labeled text: per-language character
    n-gram frequency profiles, q(gram, L) = quant * c(gram, L) div c(L)
    — the scaled class-conditional likelihood with exact integer math
    (no libm logs, so the trained model is bit-identical across engines
    and re-runs).  Output: (lang, gram, q) — the model table.

    This is the model-grade upgrade path over the fixed marker-word
    heuristic (`lang_id_col`): the same signature family as a
    fastText-style classifier, trained from the corpus's own labels.
    Scale shape: one explode + two aggregates; the model is bounded by
    charset^n * n_languages rows regardless of corpus size.
    """
    # materialize the normalized text BEFORE the n-gram HOF (see
    # char_ngrams_col's O(len^2) note)
    normed = train_df.select(
        F.col(label_col).alias("lang"),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("__t"),
    )
    ex = normed.select(
        "lang", F.explode(char_ngrams_col("__t", n)).alias("gram")
    )
    counts = ex.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.groupBy("lang").agg(F.sum("__c").alias("__tot"))
    return counts.join(totals, "lang").select(
        "lang",
        "gram",
        (F.expr(f"({quant} * __c) div __tot")).alias("q"),
    )


def trained_lang_id(
    profiles: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """PREDICT with a `train_lang_profiles` model: each document scores
    sum over its n-gram occurrences of q(gram, L) per language; the
    argmax wins (ties break alphabetically, zero total score -> 'und').
    Output: (id, predicted_lang, score).

    Scale shape: the model table is tiny (broadcastable) — the corpus
    joins it on the gram key and aggregates per (doc, language); the
    argmax is a per-doc window over <= n_languages rows.
    """
    from pyspark.sql import Window as W

    normed = score_df.select(
        F.col(id_col),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("__t"),
    )
    ex = normed.select(
        F.col(id_col), F.explode(char_ngrams_col("__t", n)).alias("gram")
    )
    tf = ex.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("__tf"))
    sc = (
        tf.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("__tf") * F.col("q")).alias("score"))
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("lang"))
    best = (
        sc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            F.when(F.col("score") > 0, F.col("lang"))
            .otherwise(F.lit("und"))
            .alias("predicted_lang"),
            F.col("score").cast("long").alias("score"),
        )
    )
    return (
        score_df.select(F.col(id_col))
        .join(best, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("predicted_lang", F.lit("und")).alias("predicted_lang"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
        )
    )


def train_quality_model(
    train_df: DataFrame,
    text_col: str,
    label_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """TRAIN a document-quality classifier from labeled good/bad text —
    the fastText-quality-filter stage every production CommonCrawl
    pipeline runs (the GPT-3/LLaMA recipe), as a fixed-point LINEAR model
    so training and scoring are exact integer math (bit-identical across
    engines and re-runs, the t18 rule; no libm logs).

    Per token: w = q_good - q_bad, where q_class = quant * c(token,
    class) div c(class tokens) is the scaled class-conditional frequency
    — the same contrast a Naive-Bayes log-odds weight encodes, in
    fixed-point.  Rows with a NULL label are ignored.  Output: (tok, w)
    — the model table, bounded by vocabulary size regardless of corpus
    size.

    A real fastText / logistic model slots in behind the same
    (token -> weight) signature; `quality_score` is the shared scorer.
    """
    ex = (
        train_df.filter(F.col(label_col).isNotNull())
        .select(
            F.col(label_col).cast("boolean").alias("__good"),
            F.explode(tokens_col(text_col)).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    counts = ex.groupBy("__good", "tok").agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.groupBy("__good").agg(F.sum("__c").alias("__tot"))
    q = counts.join(totals, "__good").select(
        "__good", "tok", F.expr(f"({quant} * __c) div __tot").alias("__q")
    )
    return q.groupBy("tok").agg(
        (
            F.sum(F.when(F.col("__good"), F.col("__q")).otherwise(F.lit(0)))
            - F.sum(F.when(~F.col("__good"), F.col("__q")).otherwise(F.lit(0)))
        )
        .cast("long")
        .alias("w")
    )


def quality_score(
    model: DataFrame, df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """SCORE documents with a `train_quality_model` table: quality_score
    = sum over token occurrences of w(token); is_good = score > 0.
    Output: (id, quality_score, is_good) — one row per input document
    (docs with no in-vocabulary token score 0 / not good).

    Scale shape: the model is vocabulary-bounded (broadcastable); the
    corpus joins it on the token key map-side and aggregates per doc —
    the shuffle carries (doc, token, tf) rows, never documents.
    """
    ex = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tf = ex.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("__tf"))
    sc = (
        tf.join(F.broadcast(model), "tok")
        .groupBy(id_col)
        .agg(F.sum(F.col("__tf") * F.col("w")).alias("quality_score"))
    )
    return (
        df.select(F.col(id_col))
        .join(sc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("quality_score", F.lit(0)).cast("long").alias("quality_score"),
            (F.coalesce("quality_score", F.lit(0)) > 0).alias("is_good"),
        )
    )


def bigram_lm_score_split(
    fit_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """`bigram_lm_score` with the CCNet train/score split: bigram counts
    are FIT on a reference slice and a (different) target slice is scored
    against them — removing the self-reference of the one-frame form,
    where a document's own transitions inflate its fluency.  Same output
    contract as bigram_lm_score: (id, n_bigrams, q_prob_sum, mean_prob),
    with n_bigrams counting only the target doc's bigrams that appear in
    the REFERENCE model (unseen transitions contribute nothing — the
    fixed-point analogue of them scoring -inf and being excluded).

    Scale shape: the reference aggregates once to a (bigram, prefix)
    count model; the target's (doc, bigram, tf) aggregate joins it on the
    bigram key — shuffle carries grams + counts on both sides, never
    documents.
    """
    tok = tokens_col(text_col)
    grams = F.when(
        F.size(tok) >= 2,
        F.zip_with(
            F.slice(tok, 1, F.size(tok) - 1),
            F.slice(tok, 2, F.size(tok) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ref = fit_df.select(F.explode(grams).alias("bg"))
    c_bg = ref.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    w1 = F.split(F.col("bg"), " ", 2).getItem(0)
    c_w1 = (
        c_bg.select(w1.alias("__w1"), "c_bg")
        .groupBy("__w1")
        .agg(F.sum("c_bg").alias("c_w1"))
    )
    model = c_bg.withColumn("__w1", w1).join(c_w1, "__w1").select(
        "bg", F.expr(f"({quant} * c_bg) div c_w1").alias("q")
    )
    ex = score_df.select(F.col(id_col), F.explode(grams).alias("bg"))
    tf = ex.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("tf"))
    agg = (
        tf.join(model, "bg")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("q")).cast("long").alias("q_prob_sum"),
        )
    )
    return (
        score_df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("q_prob_sum", F.lit(0)).cast("long").alias("q_prob_sum"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.col("q_prob_sum") / (F.lit(float(quant)) * F.col("n_bigrams")),
            ).otherwise(F.lit(0.0)).alias("mean_prob"),
        )
    )


# Gopher / MassiveText document-quality rules (Rae et al. 2021, Appendix
# A1.1) — the rule set most production CommonCrawl pipelines start from.
GOPHER_REQUIRED_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
GOPHER_BULLET_CHARS: tuple[str, ...] = ("-", "*", "•")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021 A1.1): per-doc
    repetition-independent quality signals and the conjunction verdict —
    word-count bounds, mean word length bounds, symbol-to-word ratio
    (# and ellipsis), bullet-started and ellipsis-ended line fractions,
    fraction of words with an alphabetic character, and the
    required-stopword count (>= 2 of the canonical 8).  Upgrades t2's
    generic heuristics to the published filter set; t7/t13 carry the
    repetition rules Gopher lists separately.

    Everything is JVM-side codegen over materialized token/line arrays
    (one split each — the HOF-reevaluation trap).  Every surfaced double
    is an exact-integer division (correctly rounded, bit-identical in
    DuckDB), so the rule comparisons can never straddle an engine
    rounding — the whole verdict is oracle-exact.

    Output: (id, n_words, mean_word_len, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    n_required_stopwords, gopher_keep).

    Scale shape: zero-shuffle narrow projection — scans at parquet speed
    and column-prunes to (id, text) at any corpus size.
    """
    txt = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")
    )
    # keep_cols ride through the metric projection so a pipeline stage
    # (p12) can filter on the verdict and keep going without an id-keyed
    # re-join against the corpus
    base = df.select(
        F.col(id_col),
        txt.alias("__t"),
        tokens_col(txt).alias("__tok"),
        F.split(txt, "\n", -1).alias("__ln"),
        *[F.col(c) for c in keep_cols],
    )
    n_words = F.size("__tok")
    n_lines = F.size("__ln")
    sum_word_len = F.aggregate(
        "__tok", F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    n_hash = F.length("__t") - F.length(F.replace("__t", F.lit("#")))
    n_ell = (
        (F.length("__t") - F.length(F.replace("__t", F.lit("...")))) / F.lit(3)
    ).cast("long") + (
        F.length("__t") - F.length(F.replace("__t", F.lit("…")))
    )
    bullet = F.size(
        F.filter(
            "__ln",
            lambda x: F.substring(F.ltrim(x), 1, 1).isin(*GOPHER_BULLET_CHARS),
        )
    )
    ell_lines = F.size(
        F.filter(
            "__ln",
            lambda x: F.endswith(F.rtrim(x), F.lit("..."))
            | F.endswith(F.rtrim(x), F.lit("…")),
        )
    )
    alpha = F.size(F.filter("__tok", lambda x: x.rlike("[a-z]")))
    required = None
    for w in GOPHER_REQUIRED_STOPWORDS:
        hit = F.array_contains("__tok", w).cast("int")
        required = hit if required is None else required + hit
    m = base.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        (sum_word_len / n_words).alias("mean_word_len"),
        ((n_hash + n_ell) / n_words).alias("symbol_word_ratio"),
        (bullet / n_lines).alias("bullet_line_frac"),
        (ell_lines / n_lines).alias("ellipsis_line_frac"),
        (alpha / n_words).alias("alpha_word_frac"),
        required.cast("long").alias("n_required_stopwords"),
        *[F.col(c) for c in keep_cols],
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_required_stopwords") >= min_required_stopwords)
    )
    return m.select("*", keep.alias("gopher_keep"))


def perplexity_buckets(
    fit_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    sample_mod: int = 5,
    sample_rem: int = 1,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score the
    target corpus with a reference-fit LM (`bigram_lm_score_split` — the
    fixed-point stand-in for the Kneser-Ney perplexity model), derive
    per-language TERCILE THRESHOLDS from a deterministic 1/`sample_mod`
    sample of the scored targets, and bucket every target doc by
    comparing its score to the thresholds.

    Thresholds are VALUES, not ranks: t_head = the lowest score among
    the sample's top ceil(n/3) (descending), t_mid = among the top
    ceil(2n/3) — so the bucket rule (score >= t) is a pure codegen
    comparison and docs tying a threshold all land in the better bucket,
    deterministically in any engine.  A language absent from the sample
    yields NULL thresholds and its docs fall to 'tail' (NULL comparisons
    are never true in either engine).

    Scale shape (the CCNet production shape): only the bounded sample
    goes through the per-language rank window; the full corpus gets its
    bucket from a |langs|-row broadcast join + CASE — it never shuffles
    for the bucketing, and the LM scoring itself shuffles grams+counts,
    never documents.  The threshold branch re-derives scores for the
    sample slice only; the corpus-wide scoring subtree runs once.

    Output: (id, lang, mean_prob, bucket in {head, middle, tail}).
    """
    from pyspark.sql import Window as W

    scored = bigram_lm_score_split(fit_df, score_df, id_col, text_col)
    langs = score_df.select(F.col(id_col), F.col(lang_col))
    scored = scored.join(langs, id_col).select(
        F.col(id_col), F.col(lang_col), F.col("mean_prob")
    )
    sample = scored.filter(F.col(id_col) % sample_mod == sample_rem)
    w = W.partitionBy(lang_col).orderBy(F.desc("mean_prob"), id_col)
    ranked = sample.select(
        F.col(lang_col),
        F.col("mean_prob"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(W.partitionBy(lang_col)).alias("__n"),
    )
    third = F.floor((F.col("__n") + 2) / F.lit(3))
    two_thirds = F.floor((2 * F.col("__n") + 2) / F.lit(3))
    th = ranked.groupBy(lang_col).agg(
        F.min(F.when(F.col("__rn") <= third, F.col("mean_prob"))).alias("__t_head"),
        F.min(F.when(F.col("__rn") <= two_thirds, F.col("mean_prob"))).alias("__t_mid"),
    )
    bucket = (
        F.when(F.col("mean_prob") >= F.col("__t_head"), F.lit("head"))
        .when(F.col("mean_prob") >= F.col("__t_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(th), lang_col, "left").select(
        F.col(id_col), F.col(lang_col), F.col("mean_prob"), bucket.alias("bucket")
    )


TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def canonical_url_col(u: Column) -> Column:
    """URL canonicalization (the CommonCrawl URL-dedup normal form):
    lowercase scheme+host, strip default :80/:443 ports, drop the
    fragment, strip trailing path slashes, remove tracking query params
    (utm_*/fbclid/gclid/msclkid/ref) and SORT the survivors so param
    order can't split a group.  Pure codegen regex/array ops — the same
    RE2-safe patterns evaluate identically under Java regex and DuckDB,
    so the canonical form (and any dedup keyed on it) is oracle-exact.

    Scale shape: zero-shuffle per-row expression; dedup on top is the
    dd1 digest-groupBy.
    """
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "(?i)^(https?)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(nofrag, "(?i)^https?://([^/?#]+)", 1)),
        "(:80|:443)$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract(nofrag, "(?i)^https?://[^/?#]+([^?#]*)", 1), "/+$", ""
    )
    query = F.regexp_extract(nofrag, "\\?([^#]*)", 1)
    kept = F.array_join(
        F.sort_array(
            F.filter(
                F.split(query, "&", -1),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """BM25 top-k retrieval (Robertson-Spärck Jones) with exact integer
    math: the ranking surface production search stacks (Lucene,
    Elasticsearch) compute per query.

    Parameters are the textbook defaults pinned as exact rationals —
    k1 = 6/5, b = 3/4 — so the saturation term has a closed integer
    form.  With N docs, D total corpus tokens (avgdl = D/N), per-term
    frequency ``tf`` and doc length ``dl``::

        tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                = 44*tf*D / (20*tf*D + 6*D + 18*dl*N)     -- exact integers

    scaled by 1e6 under truncating BIGINT division.  The idf is the
    rational surrogate ``1e6*(2*(N-df)+1) div (2*df+1)`` — the argument
    of Robertson's log, scaled — monotone in df like the log form, but
    engine-exact (a libm log would differ in the last ulp across
    engines; the t17 move).  A log idf slots in behind the same plan if
    cross-engine bit-equality isn't needed.

    Scale shape: two corpus passes — a stats pass (N, D: aggregate-only,
    one row out, no shuffle; at 100 TB these are precomputed corpus
    constants reused across every query) and the retrieval pass, where
    the explode is filtered to the query's terms BEFORE any shuffle, so
    the only shuffled rows are (id, dl, term) hits bounded by
    |query| x N — document text never leaves the scan.  df and the
    corpus stats broadcast.  Overflow bound: 44e6*tf*D needs
    tf*D < 2.1e11 (fine to ~billions of corpus tokens; shrink the 1e6
    premultiplier or move to DECIMAL(38,0) beyond that).

    Returns (id, n_terms_hit, bm25_score), score-desc/id-asc top-k;
    docs matching no query term are absent (standard retrieval).
    """
    toks = tokens_col(text_col)
    docs = df.select(F.col(id_col), F.size(toks).alias("__dl"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dl").cast("bigint").alias("__d")
    )
    terms = sorted({t.lower() for t in query_terms})
    ex = (
        df.select(F.col(id_col), F.size(toks).alias("__dl"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = ex.groupBy(id_col, "__dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    per_term = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__ts",
            F.expr(
                "((1000000 * (2*(__n - df) + 1)) div (2*df + 1))"
                " * ((1000000 * 44 * tf * __d)"
                "    div (20*tf*__d + 6*__d + 18*__dl*__n))"
                " div 1000000"
            ),
        )
    )
    out = per_term.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum("__ts").alias("bm25_score"),
    )
    return (
        out.orderBy(F.desc("bm25_score"), id_col)
        .limit(k)
        .select(id_col, "n_terms_hit", "bm25_score")
    )


# cp1252-mojibake repair table (UTF-8 bytes mis-decoded as cp1252 — the
# ftfy top hits).  LONGEST FIRST and applied in this exact order on both
# engines: the 3-char punctuation forms share the 'â' head, so a shorter
# rule running first would corrupt them (the t14 entity-order lesson).
MOJIBAKE_FIXES: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),  # â€™ -> right single quote
    ("â€œ", "“"),  # â€œ -> left double quote
    ("â€“", "–"),  # â€“ -> en dash
    ("â€¦", "…"),  # â€¦ -> ellipsis
    ("â‚¬", "€"),  # â‚¬ -> euro sign
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã¯", "ï"),  # Ã¯ -> ï
    ("Â ", " "),  # Â +nbsp -> nbsp
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
)


def fix_mojibake(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Encoding repair (ftfy-lite): undo the commonest real-world corpus
    corruption — UTF-8 bytes decoded as cp1252 ("cafÃ©", "â€œquotesâ€™")
    — via an ordered literal replacement chain.  Web-crawl pipelines run
    exactly this before tokenization; a full ftfy (confidence-scored
    round-trip decoding) slots in behind the same signature as a Pandas
    UDF, but the table covers the high-frequency cases losslessly and
    keeps the operator pure zero-shuffle JVM codegen, exactly
    SQL-rederivable (plain substring replace, no regex).

    Returns (id, text_fixed, changed).
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    fixed = c
    for bad, good in MOJIBAKE_FIXES:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    return df.select(
        F.col(id_col),
        fixed.alias("text_fixed"),
        (fixed != c).alias("changed"),
    )


def sql_mojibake_expr(text_expr: str) -> str:
    """The DuckDB twin of fix_mojibake's replacement chain — generated
    from the SAME table so the two can never drift."""
    out = f"coalesce({text_expr}, '')"
    for bad, good in MOJIBAKE_FIXES:
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        out = f"replace({out}, '{b}', '{g}')"
    return out


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking for retrieval corpora (the RAG indexing
    prep every embedding pipeline runs): each document becomes
    overlapping windows of ``chunk_tokens`` whitespace tokens starting
    every ``stride`` tokens — chunk i covers tokens
    [i*stride, i*stride + chunk_tokens), and windows start while
    i*stride < n_tokens, so the tail is covered and a non-empty doc
    yields >= 1 chunk (empty/null docs yield none).  ``stride <
    chunk_tokens`` gives the standard overlap that keeps sentences
    straddling a boundary retrievable.

    Zero-shuffle codegen: tokens are materialized ONCE per row (the
    boilerplate_strip HOF lesson — a split() referenced inside a lambda
    re-evaluates per element), windows come from one transform-over-range
    of slice()s, and the explode inherits the scan partitioning.  Output:
    (id, chunk_idx, chunk_text, n_chunk_tokens).
    """
    tokd = df.select(
        F.col(id_col), tokens_col(text_col).alias("__tok")
    ).select(
        id_col,
        "__tok",
        F.when(
            (F.size("__tok") == 1) & (F.element_at("__tok", 1) == ""),
            F.lit(0),
        )
        .otherwise(F.size("__tok"))
        .alias("__n"),
    )
    n_chunks = F.ceil(F.col("__n") / F.lit(stride)).cast("int")
    # while i*stride < n: i in [0, ceil(n/stride)); but a window that
    # starts past (n - chunk) when a previous window already covers the
    # tail is still emitted only if its start < n (slice clamps the end)
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("ci"),
            F.array_join(
                F.slice(F.col("__tok"), i * stride + 1, chunk_tokens), " "
            ).alias("ct"),
            F.least(
                F.lit(chunk_tokens), F.col("__n") - i * stride
            ).alias("nt"),
        ),
    )
    return (
        tokd.filter(F.col("__n") > 0)
        .select(F.col(id_col), F.explode(windows).alias("__w"))
        .select(
            id_col,
            F.col("__w.ci").cast("long").alias("chunk_idx"),
            F.col("__w.ct").alias("chunk_text"),
            F.col("__w.nt").cast("long").alias("n_chunk_tokens"),
        )
    )


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    n-token shingles that occur in NO other document — the
    memorization-risk / content-originality audit signal (Lee et al.
    2022's dedup work measures exactly this overlap mass; dataset cards
    report it).  Low novelty = the document is mostly assembled from
    corpus-shared n-grams (template/boilerplate/copy heavy); 1.0 = all
    original.

    Plan shape: the dd-family inverted index (one Arrow-batched shingle
    explode, distinct within doc), ONE shuffle keyed on shingle for the
    document-frequency window (a groupBy+join-back would rescan the
    explode per branch — the t6 lesson), then a map-side-combined
    groupBy(id).  The shuffle carries (id, shingle) pairs, never texts.
    novelty = n_unique / n_shingles: two exact BIGINTs, one IEEE
    division.  Docs with fewer than n tokens have no shingles and are
    absent (they have no n-gram identity to audit).
    """
    from pyspark.sql import Window as W

    from era_parser_spark.operators.dedup import doc_shingles

    ex = doc_shingles(df, id_col, text_col, n)
    cnt = ex.withColumn(
        "__c", F.count(F.lit(1)).over(W.partitionBy("shingle"))
    )
    return (
        cnt.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("__c") == 1).cast("long")).alias("n_unique"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_unique",
            (F.col("n_unique").cast("double") / F.col("n_shingles")).alias(
                "novelty"
            ),
        )
    )


def hash_embed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
) -> DataFrame:
    """Feature-hashing text embeddings (Weinberger et al. 2009, the
    fastText/Vowpal hashing trick): each token lands in bucket
    ``h % dim`` with sign ``±1`` from the next hash bit, summed with
    multiplicity — a fixed-width vector with the inner-product-
    preservation guarantees of the hashing trick, and the in-engine
    bridge from the text tier to the vector tier (the output composes
    directly with s1/s8/s14: integer dots are exact).

    Hash: the shared 60-bit md5 integer (md5_60bit) — bucket
    ``h % dim``, sign from high bit ``(h >> 30) & 1`` (a bit disjoint
    from the bucket for any dim <= 2^30, and extracted with exact
    integer shifts — never a double division, which would lose bits
    above 2^53) — so the whole embedding is a pure function of the
    token multiset, bit-identical in SQL (oracle-EXACT, unlike any
    trained embedding).

    Plan: TWO long-only map-side-combined exchanges — (id, bucket)
    partial sums, then the per-doc densify — and NO join operator:
    a per-doc null-bucket sentinel row (id-only pruned second scan)
    rides the same aggregation, so empty docs surface as the zero
    vector without joining the dense vectors back (at scale that join
    shuffles a map+array per doc — the first formulation's third
    exchange; an explode_outer variant avoided the second scan but
    paid ~30% scan-stage CPU in per-token null branches — both
    measured, docs/PLANS.md).  norm_sq folds JVM-side over the sparse
    (bucket, v) rows BEFORE densifying, so the per-row HOF work is
    only the dim-element densify transform.  Returns (id, feat
    array<bigint>, norm_sq bigint).
    """
    from era_parser_spark.operators.dedup import md5_60bit

    assert dim <= (1 << 30), "sign bit 30 must sit above the bucket bits"
    ex = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("__t")
    ).filter(F.col("__t") != "")
    h = md5_60bit(F.col("__t"))
    signed = ex.select(
        id_col,
        F.pmod(h, F.lit(dim)).cast("int").alias("__b"),
        F.when(F.pmod(F.shiftright(h, 30), F.lit(2)) == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("__s"),
    )
    # one null-bucket sentinel row per doc rides the SAME aggregation,
    # so empty docs surface as the zero vector with NO dense-vector
    # join-back (at scale that join shuffles a map+array per doc; the
    # sentinel union costs one id-only pruned scan and |docs| tiny
    # rows) and NO per-token null branches (the explode_outer variant
    # measured ~30% slower at the scan stage)
    sentinel = df.select(
        F.col(id_col),
        F.lit(None).cast("int").alias("__b"),
        F.lit(None).cast("long").alias("__s"),
    )
    cnt = (
        signed.unionByName(sentinel)
        .groupBy(id_col, "__b")
        .agg(F.sum("__s").alias("__v"))
    )
    dense = cnt.groupBy(id_col).agg(
        # collect_list skips the null-bucket row, so empty docs yield an
        # empty map (every doc still has its dense row)
        F.map_from_entries(
            F.collect_list(
                F.when(
                    F.col("__b").isNotNull(), F.struct(F.col("__b"), F.col("__v"))
                )
            )
        ).alias("__m"),
        F.coalesce(
            F.sum(F.col("__v") * F.col("__v")), F.lit(0).cast("long")
        ).alias("norm_sq"),
    )
    feat = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0).cast("long")),
    )
    return dense.select(F.col(id_col), feat.alias("feat"), "norm_sq")


def readability_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch-Kincaid readability (the classic curation-report metric):
    grade = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59,
    with the standard heuristics — syllables = maximal [aeiouy]+ runs,
    sentences = maximal [.!?]+ runs clamped to >= 1 (fragments count as
    one sentence), words = whitespace tokens.

    All three counts are exact integers from regexp_extract_all (pure
    codegen, zero shuffle); the grade is two IEEE divisions and a fixed
    multiply-add chain, bit-identical in SQL when the literals are
    DOUBLE on both sides (the DuckDB bare-decimal DECIMAL trap).
    """
    words = F.size(tokens_col(text_col)).cast("long")
    syl = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[aeiouy]+"), 0)
    ).cast("long")
    sent = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)).cast("long"),
        F.lit(1).cast("long"),
    )
    grade = (
        F.lit(0.39) * (words.cast("double") / sent)
        + F.lit(11.8) * (syl.cast("double") / words)
        - F.lit(15.59)
    )
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        sent.alias("n_sentences"),
        syl.alias("n_syllables"),
        grade.alias("fk_grade"),
    )


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    thresholds: tuple[float, float, float, float] = (0.20, 0.18, 0.16, 0.15),
) -> DataFrame:
    """Gopher's A1.2 repetition filters (Rae et al. 2021, Table A1) —
    the companion to t20's A1.1 rule gate: fraction of characters in
    the most frequent 2-/3-/4-gram and in duplicated (count >= 2)
    5-grams.  char mass of a gram = count * length(gram string); the
    fraction divides by length(text) — exact BIGINTs, one IEEE division
    each (a doc whose repeats overlap can exceed 1.0, as in the paper's
    loose counting).

    Plan: ONE explode pass emits (id, n, gram) for all four widths
    (gram arrays built per width from a single materialized token array
    — the HOF lesson; no joins between widths), then ONE gram-row
    exchange total: the count window partitions by (id, n, g) and the
    argmax window by (id, n) — HashPartitioning(id, n) satisfies both
    clusterings (subset rule), so the two windows and the final
    per-(id, n) aggregate share a single hash exchange (two sorts, the
    trade).  Over occurrence rows, sum(len(g)) where c >= 2 IS
    sum-over-grams of c*len — dupmass without a distinct-gram
    pre-aggregate.  Top-gram is argmax with the (count DESC, gram ASC)
    total order, re-derived identically in SQL.  Shuffle carries
    grams, never documents (the t17 shape).  Docs with no n-width
    grams score 0 for that n.

    Returns (id, n_chars, top2_frac, top3_frac, top4_frac, dup5_frac,
    rep_keep).
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias(
            "__nc"
        ),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("__tok"),
    )

    def grams_of(n):
        # guard: sequence(1, 0) DESCENDS in Spark, so short docs must
        # produce an empty index array, not [1, 0]
        idx = F.when(
            F.size("__tok") >= n, F.sequence(F.lit(1), F.size("__tok") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.array_join(F.slice("__tok", i, n), " ").alias("g"),
            ),
        )

    ex = base.select(
        F.col(id_col),
        "__nc",
        F.explode(
            F.concat(grams_of(2), grams_of(3), grams_of(4), grams_of(5))
        ).alias("__e"),
    ).select(F.col(id_col), "__nc", F.col("__e.n").alias("__n"), F.col("__e.g").alias("__g"))
    wc = W.partitionBy(id_col, "__n", "__g")
    wr = W.partitionBy(id_col, "__n").orderBy(F.col("__c").desc(), F.col("__g"))
    per_n = (
        # explicit (id, n) partitioning BEFORE the windows: hash(id, n)
        # satisfies BOTH window clusterings ((id,n,g) by the subset rule
        # and (id,n) exactly) — left implicit, Spark plans the count
        # window's own (id,n,g) exchange first and then needs a second
        # for the argmax window (measured: 3 exchanges -> 2)
        ex.repartition(F.col(id_col), F.col("__n"))
        .withColumn("__c", F.count(F.lit(1)).over(wc))
        .withColumn("__rn", F.row_number().over(wr))
        .groupBy(id_col, "__nc", "__n")
        .agg(
            F.max(
                F.when(F.col("__rn") == 1, F.col("__c") * F.length("__g"))
            ).alias("__topmass"),
            # occurrence rows: len(g) summed over the c occurrences of a
            # duplicated gram contributes exactly c*len(g)
            F.sum(
                F.when(F.col("__c") >= 2, F.length("__g").cast("long")).otherwise(
                    F.lit(0)
                )
            ).alias("__dupmass"),
        )
    )
    t2, t3, t4, d5 = thresholds
    agg = per_n.groupBy(id_col, "__nc").agg(
        *[
            F.max(
                F.when(F.col("__n") == n, F.col("__topmass"))
            ).alias(f"__top{n}")
            for n in (2, 3, 4)
        ],
        F.max(F.when(F.col("__n") == 5, F.col("__dupmass"))).alias("__dup5"),
    )
    frac = lambda c: F.coalesce(c.cast("double") / F.col("__nc"), F.lit(0.0))  # noqa: E731
    out = base.select(F.col(id_col), "__nc").join(agg.drop("__nc"), id_col, "left")
    return out.select(
        F.col(id_col),
        F.col("__nc").alias("n_chars"),
        frac(F.col("__top2")).alias("top2_frac"),
        frac(F.col("__top3")).alias("top3_frac"),
        frac(F.col("__top4")).alias("top4_frac"),
        frac(F.col("__dup5")).alias("dup5_frac"),
        (
            (frac(F.col("__top2")) <= t2)
            & (frac(F.col("__top3")) <= t3)
            & (frac(F.col("__top4")) <= t4)
            & (frac(F.col("__dup5")) <= d5)
        ).alias("rep_keep"),
    )


def c4_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2) — the third
    named recipe beside Gopher (t20/t29) and CCNet (t21): keep only
    lines ending in terminal punctuation with >= 5 words; drop pages
    with < 3 sentences, any page containing "lorem ipsum" or "{", and
    pages with blocklisted words.

    Pure zero-shuffle codegen: line retention is a HOF filter over the
    newline split (per-line cost, the t9 shape), sentence count reuses
    t27's [.!?]+ run counting, word membership is a token-array filter.

    Returns (id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, has_badword, c4_keep, clean_text).
    """
    _BAD = ("casino", "viagra", "xxx")
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda l: (
            F.endswith(F.rtrim(l), F.lit("."))
            | F.endswith(F.rtrim(l), F.lit("!"))
            | F.endswith(F.rtrim(l), F.lit("?"))
            | F.endswith(F.rtrim(l), F.lit('"'))
        )
        & (F.size(F.split(F.trim(l), r"\s+")) >= 5),
    )
    n_sent = F.size(F.regexp_extract_all(text, F.lit("[.!?]+"), 0)).cast("long")
    tok = tokens_col(text)
    # arrays_overlap: ONE codegen'd split — an HOF filter referencing
    # tok would re-evaluate the whole-page split per blocklist word
    # (the interpreted-HOF rule)
    has_bad = F.arrays_overlap(tok, F.array(*[F.lit(w) for w in _BAD]))
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    has_brace = F.contains(text, F.lit("{"))
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_bad.alias("has_badword"),
        (
            (n_sent >= 3)
            & ~has_lorem
            & ~has_brace
            & ~has_bad
            & (F.size(kept) >= 1)
        ).alias("c4_keep"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


#: RAKE's stopword/delimiter list — deliberately small and FROZEN (it is
#: part of the oracle contract; the SQL twin embeds the same literal).
RAKE_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "had", "has", "have", "in", "is", "it", "its", "of", "on",
    "or", "that", "the", "this", "to", "was", "were", "will", "with",
)


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents") with exact integer scores.

    Candidate phrases are maximal runs of content tokens — lowercase
    whitespace tokens that are purely [a-z0-9]+ and not in
    RAKE_STOPWORDS (non-alphanumeric tokens act as phrase delimiters,
    like the paper's punctuation breaks).  Per document: freq(w) =
    content occurrences of w, deg(w) = sum over w's occurrences of the
    containing phrase's length (co-occurrence degree, self included);
    word score = (scale * deg) // freq (the t17 scaled-rational
    convention — RAKE's deg/freq stays exact instead of a float);
    phrase score = sum of member word scores WITH multiplicity.  Output
    is the top ``top_n`` distinct phrases per document under
    (score DESC, phrase ASC).

    Plan: one posexplode pass; phrase islands via the pos - row_number()
    trick, then plen/freq/deg as WINDOWS over finer partitions of ONE
    explicit doc_id repartition (the t29 subset-rule lesson) — a
    groupBy + self-join formulation of the word stats recomputed the
    explode subtree per branch (4 doc_id exchanges measured; the
    all-window chain plans one for the token rows, plus the tiny
    ranked-phrase exchange).  Shuffle rows are tokens + small ints —
    documents never move after the explode.
    """
    from pyspark.sql import Window as W

    stop = F.array(*[F.lit(s) for s in RAKE_STOPWORDS])
    ex = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")).alias(
            "__pos", "__tk"
        ),
    )
    con = ex.filter(
        F.col("__tk").rlike("^[a-z0-9]+$") & ~F.array_contains(stop, F.col("__tk"))
    ).repartition(id_col)
    w_doc = W.partitionBy(id_col).orderBy("__pos")
    con = con.withColumn("__grp", F.col("__pos") - F.row_number().over(w_doc))
    # phrase length, word freq and word degree are ALL windows over finer
    # partitions of the one doc_id exchange (subset rule) — the groupBy +
    # self-join formulation recomputed the explode subtree per branch
    # (4 exchanges measured; this chain plans ONE for the token rows)
    con = con.withColumn(
        "__plen", F.count(F.lit(1)).over(W.partitionBy(id_col, "__grp"))
    )
    w_word = W.partitionBy(id_col, "__tk")
    con = con.withColumn("__freq", F.count(F.lit(1)).over(w_word)).withColumn(
        "__deg", F.sum("__plen").over(w_word)
    )
    con = con.withColumn("__wscore", F.expr(f"({scale} * __deg) div __freq"))
    scored = (
        con.groupBy(id_col, "__grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__tk"))),
                    lambda x: x.getField("__tk"),
                ),
                " ",
            ).alias("phrase"),
            F.sum("__wscore").alias("score_q"),
        )
        .groupBy(id_col, "phrase")
        .agg(F.max("score_q").alias("score_q"))
    )
    w_rank = W.partitionBy(id_col).orderBy(F.desc("score_q"), F.asc("phrase"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "phrase", F.col("score_q").cast("long"), F.col("rank").cast("int"))
    )
