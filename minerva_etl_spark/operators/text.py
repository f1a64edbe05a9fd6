"""Text-analysis operators for large-scale document pipelines.

These extend the reference's surface (BASELINE.json north star): language
identification, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` table.

Everything is built from JVM-side built-ins (split / filter / transform /
regexp) — whole-stage-codegen'd, no Python in the hot path — and every
operator has an exactly-matching ANSI/DuckDB oracle emitter, because the
arithmetic is integer counts plus single IEEE divisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
#: language classifier; detection quality is secondary to scale shape —
#: swap in real profiles without changing the plan.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "for", "on", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "es", "una", "por", "con", "para", "del"],
}

STOPWORDS_EN = LANG_PROFILES["en"]


def _sql_str_array(words: list[str]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"array({inner})"


def _duck_str_array(words: list[str]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"[{inner}]"


def tokens_expr(text_col: str) -> Column:
    """Whitespace tokens of lowercased text, empties removed (Spark)."""
    return F.expr(tokens_spark_sql(text_col))


def tokens_spark_sql(text_col: str) -> str:
    return rf"filter(split(lower(trim({text_col})), '\\s+'), x -> x != '')"


def tokens_duck_sql(text_col: str) -> str:
    return (
        rf"list_filter(regexp_split_to_array(lower(trim({text_col})), '\s+'),"
        r" x -> x <> '')"
    )


# ------------------------------------------------------------------ token count
def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword-unit count
    (letter-runs / digit-runs / single punctuation as units)."""
    return df.withColumn(
        "n_tokens", F.size(tokens_expr(text_col)).cast("bigint")
    ).withColumn(
        "n_subword_units",
        F.size(
            F.expr(
                rf"filter(split(lower(trim({text_col})),"
                rf" '([^a-z0-9]+)'), x -> x != '')"
            )
        ).cast("bigint"),
    )


# --------------------------------------------------------------- quality score
def quality_exprs(text_col: str = "text") -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio quality signals.

    All ratios are (exact int count) / (exact int count) single IEEE
    divisions — reproducible across engines.
    """
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(text_col).cast("bigint")
    n_alpha = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", "")
    ).cast("bigint")
    n_punct = F.length(
        F.regexp_replace(F.col(text_col), "[^.,;:!?]", "")
    ).cast("bigint")
    stop_arr = _sql_str_array(STOPWORDS_EN)
    n_stop = F.size(
        F.expr(
            rf"filter({tokens_spark_sql(text_col)},"
            rf" x -> array_contains({stop_arr}, x))"
        )
    ).cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha.cast("double") / n_chars.cast("double"),
        "punct_ratio": n_punct.cast("double") / n_chars.cast("double"),
        "stopword_ratio": n_stop.cast("double")
        / F.greatest(n_tokens, F.lit(1)).cast("double"),
    }


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality signals and a [0,1]-ish composite score."""
    out = df
    exprs = quality_exprs(text_col)
    for name, col in exprs.items():
        out = out.withColumn(name, col)
    # composite: stopword presence + alphabetic density, penalize
    # punctuation soup; min/max clamp keeps it in [0, 1]
    score = (
        F.least(F.col("stopword_ratio") * F.lit(2.0), F.lit(1.0)) * F.lit(0.5)
        + F.col("alpha_ratio") * F.lit(0.5)
        - F.col("punct_ratio")
    )
    return out.withColumn(
        "quality_score", F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0))
    )


def quality_oracle_sql(table: str, text_col: str = "text") -> str:
    toks = tokens_duck_sql(text_col)
    stop = _duck_str_array(STOPWORDS_EN)
    return f"""
SELECT doc_id,
  CAST(length({text_col}) AS BIGINT) AS n_chars,
  CAST(len({toks}) AS BIGINT) AS n_tokens,
  CAST(length(regexp_replace(lower({text_col}), '[^a-z]', '', 'g')) AS DOUBLE)
    / CAST(length({text_col}) AS DOUBLE) AS alpha_ratio,
  CAST(length(regexp_replace({text_col}, '[^.,;:!?]', '', 'g')) AS DOUBLE)
    / CAST(length({text_col}) AS DOUBLE) AS punct_ratio,
  CAST(len(list_filter({toks}, x -> list_contains({stop}, x))) AS DOUBLE)
    / CAST(greatest(len({toks}), 1) AS DOUBLE) AS stopword_ratio,
  greatest(least(
      least(CAST(len(list_filter({toks}, x -> list_contains({stop}, x))) AS DOUBLE)
            / CAST(greatest(len({toks}), 1) AS DOUBLE) * 2.0, 1.0) * 0.5
      + CAST(length(regexp_replace(lower({text_col}), '[^a-z]', '', 'g')) AS DOUBLE)
        / CAST(length({text_col}) AS DOUBLE) * 0.5
      - CAST(length(regexp_replace({text_col}, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        / CAST(length({text_col}) AS DOUBLE), 1.0), 0.0) AS quality_score
FROM {table}
"""


# --------------------------------------------------------------- language id
def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language guess: argmax of per-language stopword
    hit counts (ties broken by profile order; 'und' = undetermined when
    no profile matches)."""
    out = df
    for lang, words in LANG_PROFILES.items():
        arr = _sql_str_array(words)
        out = out.withColumn(
            f"__hits_{lang}",
            F.size(
                F.expr(
                    rf"filter({tokens_spark_sql(text_col)},"
                    rf" x -> array_contains({arr}, x))"
                )
            ),
        )
    langs = list(LANG_PROFILES)
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in reversed(langs):  # earlier profiles win ties
        hits = F.col(f"__hits_{lang}")
        best = F.when(hits >= F.greatest(best_hits, F.lit(1)), F.lit(lang)).otherwise(best)
        best_hits = F.greatest(best_hits, hits)
    out = out.withColumn("lang_pred", best)
    return out.drop(*[f"__hits_{lang}" for lang in langs])


def language_id_oracle_sql(table: str, text_col: str = "text") -> str:
    toks = tokens_duck_sql(text_col)
    hits = {
        lang: f"len(list_filter({toks}, x -> list_contains({_duck_str_array(w)}, x)))"
        for lang, w in LANG_PROFILES.items()
    }
    langs = list(LANG_PROFILES)
    # same fold as the Spark side: iterate reversed, earlier profiles win ties
    best = "'und'"
    best_hits = "0"
    for lang in reversed(langs):
        best = (
            f"CASE WHEN {hits[lang]} >= greatest({best_hits}, 1)"
            f" THEN '{lang}' ELSE {best} END"
        )
        best_hits = f"greatest({best_hits}, {hits[lang]})"
    return f"SELECT doc_id, {best} AS lang_pred FROM {table}"


# ----------------------------------------------------------------- repetition
def with_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals: the fraction of
    duplicate tokens and duplicate word-2-grams (high values mark the
    boilerplate / keyword-stuffed pages a curation pass drops).

    Tokens are staged in a real column first — inlining the tokenizer
    into a lambda re-evaluates it per array element (see
    ``dedup.shingles_from_tokens_spark_sql``)."""
    staged = df.withColumn("__rep_toks", tokens_expr(text_col))
    n_tok = F.size("__rep_toks").cast("double")
    dup_tok = F.when(
        F.size("__rep_toks") > 0,
        F.lit(1.0)
        - F.size(F.array_distinct("__rep_toks")).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    bigrams = F.expr(
        "CASE WHEN size(__rep_toks) >= 2 THEN "
        "transform(sequence(1, size(__rep_toks) - 1), "
        "i -> concat(element_at(__rep_toks, i), ' ', "
        "element_at(__rep_toks, i + 1))) "
        "ELSE array() END"
    )
    staged = staged.withColumn("__rep_bi", bigrams)
    dup_bi = F.when(
        F.size("__rep_bi") > 0,
        F.lit(1.0)
        - F.size(F.array_distinct("__rep_bi")).cast("double")
        / F.size("__rep_bi").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        staged.withColumn("dup_token_frac", dup_tok)
        .withColumn("dup_2gram_frac", dup_bi)
        .drop("__rep_toks", "__rep_bi")
    )


def repetition_duck_exprs(text_col: str = "text") -> dict[str, str]:
    """DuckDB twins of :func:`with_repetition` (same names)."""
    toks = tokens_duck_sql(text_col)
    bi = (
        f"CASE WHEN len({toks}) >= 2 THEN "
        f"list_transform(generate_series(1, len({toks}) - 1), "
        f"i -> ({toks})[i] || ' ' || ({toks})[i + 1]) "
        f"ELSE [] END"
    )
    return {
        "dup_token_frac": (
            f"CASE WHEN len({toks}) > 0 THEN "
            f"1.0 - CAST(len(list_distinct({toks})) AS DOUBLE)"
            f" / CAST(len({toks}) AS DOUBLE) ELSE 0.0 END"
        ),
        "dup_2gram_frac": (
            f"CASE WHEN len({bi}) > 0 THEN "
            f"1.0 - CAST(len(list_distinct({bi})) AS DOUBLE)"
            f" / CAST(len({bi}) AS DOUBLE) ELSE 0.0 END"
        ),
    }


# ------------------------------------------------------------------------ PII
#: engine-portable PII patterns: character classes + counted repeats
#: only (no lookaround, no \d shorthand) so Java regex (Spark) and RE2
#: (DuckDB) match identically.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    "phone": (r"\+[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
}


def with_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction: per-class match counts
    (``n_email``/``n_ipv4``/``n_phone``) and a ``redacted`` text column
    with each match replaced by its placeholder token.

    Redaction applies email → ipv4 → phone in sequence over the same
    text, so an earlier class's placeholder wins overlapping spans in
    ``redacted``.  Counts, however, are computed independently per class
    on the ORIGINAL text: a span matching two patterns (e.g.
    ``+123456789@ab.co`` hits both email and phone) is counted by both
    ``n_email`` and ``n_phone``.  All regex work is JVM-side /
    codegen'd."""
    out = df
    redacted = F.col(text_col)
    for name, (pat, token) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn("redacted", redacted)


def pii_duck_exprs(text_col: str = "text") -> dict[str, str]:
    """DuckDB twins of :func:`with_pii` (same column names)."""
    exprs: dict[str, str] = {}
    redacted = text_col
    for name, (pat, token) in PII_PATTERNS.items():
        exprs[f"n_{name}"] = (
            f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS INTEGER)"
        )
        redacted = f"regexp_replace({redacted}, '{pat}', '{token}', 'g')"
    exprs["redacted"] = redacted
    return exprs


# -------------------------------------------------------------- fingerprinting
def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit-ish content fingerprint: md5 of the normalized token stream
    (whitespace-insensitive exact-dup key), 15 hex digits → bigint."""
    normalized = F.array_join(tokens_expr(text_col), " ")
    return df.withColumn(
        "fingerprint",
        F.conv(F.substring(F.md5(normalized), 1, 15), 16, 10).cast("bigint"),
    )


def fingerprint_duck_expr(text_col: str = "text") -> str:
    toks = tokens_duck_sql(text_col)
    return (
        f"CAST(('0x' || substr(md5(array_to_string({toks}, ' ')), 1, 15))"
        f" AS BIGINT)"
    )


# ----------------------------------------------- model-based quality filter
#: Fixed linear-classifier weights over the engineered text signals — the
#: fasttext/"wiki-reference classifier" stage of a curation pipeline
#: (score > 0 keeps the page).  The weights are deliberately constants:
#: scoring a trained linear model IS a dot product, so the Spark plan for
#: a real model is identical — swap the numbers, keep the plan.
QUALITY_MODEL: list[tuple[str, float]] = [
    ("alpha_ratio", 3.0),
    ("stopword_ratio", 2.5),
    ("punct_ratio", -4.0),
    ("dup_token_frac", -1.0),
    ("mean_word_len", -0.15),
    ("sqrt_tokens", 0.05),
]
QUALITY_MODEL_BIAS = -1.6
# calibration note: weights/bias are set so the synthetic fixture
# corpus splits ~64/36 keep/drop (dup_token_frac runs hot there, ~0.5
# mean) — a discriminative, non-degenerate operating point for the
# composed pipeline demo.  A real deployment swaps in trained weights.

#: feature name → engine-portable SQL over the signal columns
_QUALITY_FEATURE_SQL = {
    "alpha_ratio": "alpha_ratio",
    "stopword_ratio": "stopword_ratio",
    "punct_ratio": "punct_ratio",
    "dup_token_frac": "dup_token_frac",
    "mean_word_len": (
        "(CAST(n_chars AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE))"
    ),
    "sqrt_tokens": "sqrt(CAST(n_tokens AS DOUBLE))",
}


def quality_logit_sql() -> str:
    """Engine-portable SQL for the classifier logit.

    The same text parses in Spark SQL and DuckDB, and uses only
    ``+ * / sqrt`` — all exactly-rounded IEEE-754 ops — in a fixed
    left-associated order, so both engines produce bit-identical
    doubles (no transcendentals: the raw logit is the score, not a
    sigmoid, preserving cross-engine hash parity; the keep decision is
    monotone in either).
    """
    expr = f"CAST({QUALITY_MODEL_BIAS!r} AS DOUBLE)"
    for name, w in QUALITY_MODEL:
        expr = f"({expr} + CAST({w!r} AS DOUBLE) * {_QUALITY_FEATURE_SQL[name]})"
    return expr


def classify_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model-based quality filter: linear classifier over the engineered
    signals (length, alphabetic density, stopword/punctuation ratios,
    Gopher repetition) → ``model_logit`` + boolean ``keep``
    (``logit >= 0``).

    This is the scoring half of a fasttext-style quality classifier
    (reference surface has no analog — LLM-pipeline extension).  All
    features and the dot product run inside whole-stage codegen; at
    100 TB the stage is a single scan-project-filter with no shuffle.
    """
    out = with_quality_score(df, text_col)
    out = with_repetition(out, text_col)
    out = out.withColumn("model_logit", F.expr(quality_logit_sql()))
    return out.withColumn("keep", F.col("model_logit") >= F.lit(0.0))


def quality_classifier_oracle_sql(table: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`classify_quality` (doc_id, model_logit, keep)."""
    rep = repetition_duck_exprs(text_col)["dup_token_frac"]
    logit = quality_logit_sql()
    return f"""
WITH q AS ({quality_oracle_sql(table, text_col)}),
r AS (SELECT doc_id, {rep} AS dup_token_frac FROM {table})
SELECT q.doc_id, {logit} AS model_logit,
       ({logit} >= 0.0) AS keep
FROM q JOIN r USING (doc_id)
"""


def _segments_sql(text_col: str, k: int) -> str:
    """In-row fixed-size (k-word) segment array of a document."""
    return (
        f"transform(sequence(1, cast(ceil(size(split({text_col}, ' '))"
        f" / {k}.0) as int)),"
        f" i -> array_join(slice(split({text_col}, ' '),"
        f" (i-1)*{k}+1, {k}), ' '))"
    )


# ------------------------------------------- segment boilerplate removal
def remove_boilerplate_segments(
    df: DataFrame,
    seg_words: int = 4,
    max_docs: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """CCNet/RefinedWeb-style intra-corpus boilerplate removal at the
    SEGMENT level: split each document into fixed-size word segments,
    count in how many distinct documents each exact segment occurs, and
    strip segments occurring in ``>= max_docs`` docs (headers, footers,
    navigation chrome — the lines that repeat verbatim across a crawl).

    Returns ``(doc_id, n_segs, n_kept, n_dropped, new_text)``; documents
    whose every segment is boilerplate survive with ``new_text = ''``
    (the caller decides whether to drop empties).

    Scale shape, SIZE-GUARDED: the (md5(segment), doc) pairs shuffle
    once for the frequency count (never the text); the resulting
    boilerplate digest table is then counted BEFORE choosing the apply
    strategy.  At or below ``broadcast_threshold`` digests it collects
    into one broadcast array and the strip + reconstruct runs entirely
    inside whole-stage codegen (higher-order ``filter`` over the segment
    array — no second shuffle).  Above the threshold — a real crawl,
    where the set of 4-word segments repeated across >=4 documents is
    NOT small and a collected single-row array would hit the 2 GiB
    row limit long before 100 TB — it falls back to the distributed
    (digest, doc) shape :func:`dedup_segments_keep_first` uses: a
    left join of exploded positions against the digest table and an
    order-restoring per-doc re-aggregation.  Both paths are
    hash-identical (pinned by ``tests/test_text_curation.py``).
    """
    k = int(seg_words)
    # NULL text must behave as '' BEFORE the path split: the broadcast
    # path's higher-order filter() drops NULL-condition elements while
    # the join path's md5(NULL) never matches a digest — without this
    # normalization the two strategies would disagree on NULL-text
    # documents (caught in review; pinned by the NULL-text differential
    # test)
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    segs_arr = _segments_sql(text_col, k)
    exploded = df.select(
        F.col(id_col), F.explode(F.expr(segs_arr)).alias("__seg")
    )
    boiler_digests = (
        exploded.groupBy(F.md5("__seg").alias("__digest"))
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= int(max_docs))
        .select("__digest")
        # materialized once: the size probe below AND the chosen apply
        # strategy (broadcast collect_set or the distributed join) both
        # consume this table — without the checkpoint each action
        # re-ran the full segment explode + digest exchange (r16)
        .localCheckpoint(eager=True)
    )
    # count is cheap relative to the corpus scan (digest table only) and
    # decides whether the collected array is safe to build at all
    n_boiler = boiler_digests.count()
    if n_boiler <= int(broadcast_threshold):
        boiler = boiler_digests.agg(
            F.collect_set("__digest").alias("__bl")
        )
        with_bl = df.crossJoin(F.broadcast(boiler)).withColumn(
            "__bl",
            F.coalesce(F.col("__bl"), F.array().cast("array<string>")),
        )
        kept = f"filter({segs_arr}, s -> NOT array_contains(__bl, md5(s)))"
        return (
            with_bl.withColumn("__segs", F.expr(segs_arr))
            .withColumn("__kept", F.expr(kept))
            .select(
                id_col,
                F.size("__segs").cast("bigint").alias("n_segs"),
                F.size("__kept").cast("bigint").alias("n_kept"),
                (F.size("__segs") - F.size("__kept"))
                .cast("bigint")
                .alias("n_dropped"),
                F.array_join("__kept", " ").alias("new_text"),
            )
        )
    # join path: segment text flows through one more shuffle (honest
    # corpus-sized cost), but nothing is ever collected to one row
    pos = df.select(
        F.col(id_col),
        F.posexplode(F.expr(segs_arr)).alias("__pos", "__seg"),
    ).withColumn("__digest", F.md5("__seg"))
    marked = pos.join(
        boiler_digests.withColumn("__is_bl", F.lit(True)),
        "__digest",
        "left",
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segs"),
            F.sum(
                F.when(F.col("__is_bl").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__is_bl").isNull(),
                                F.struct("__pos", "__seg"),
                            )
                        )
                    ),
                    lambda s: s.getField("__seg"),
                ),
                " ",
            ).alias("new_text"),
        )
        .select(
            id_col,
            "n_segs",
            "n_kept",
            (F.col("n_segs") - F.col("n_kept"))
            .cast("bigint")
            .alias("n_dropped"),
            "new_text",
        )
    )


#: Gopher-style document-filter rule bounds (Rae et al. 2021, §A1.1
#: adapted): the named rule set curation teams reach for first.  The
#: stopword-presence rule uses this fixed mini-list.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def _gopher_flags(text_col: str) -> dict[str, Column]:
    """The five Gopher rule flags (+ n_words) as Columns over a frame
    that staged ``__g_toks = tokens_expr(text_col)`` — shared by the
    reporting shape (:func:`gopher_rules`) and the streaming filter
    shape (:func:`with_gopher_keep`) so both apply the identical
    expressions."""
    n_words = F.size("__g_toks").cast("bigint")
    safe_n = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = (
        F.expr(
            "aggregate(__g_toks, CAST(0 AS BIGINT),"
            " (acc, w) -> acc + length(w))"
        ).cast("double")
        / safe_n
    )
    n_symbols = (
        F.length(F.regexp_replace(F.col(text_col), "[^#@]", "")).cast(
            "double"
        )
        + F.lit(3.0)
        * F.regexp_count(F.col(text_col), F.lit(r"\.\.\.")).cast("double")
    )
    alpha_words = F.size(
        F.expr("filter(__g_toks, w -> w rlike '[a-z]')")
    ).cast("double")
    stop_arr = _sql_str_array(GOPHER_STOPWORDS)
    stop_hits = F.size(
        F.expr(
            f"array_intersect(array_distinct(__g_toks), {stop_arr})"
        )
    )
    return {
        "n_words": n_words,
        "ok_word_count": (
            (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
        ),
        "ok_mean_word_len": (
            (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
            & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN)
        ),
        "ok_symbol_ratio": (n_symbols / safe_n) < GOPHER_MAX_SYMBOL_RATIO,
        "ok_alpha_words": (alpha_words / safe_n)
        > GOPHER_MIN_ALPHA_WORD_FRAC,
        "ok_stopwords": stop_hits >= GOPHER_MIN_STOPWORD_HITS,
    }


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style rule filter: the classic named heuristic gauntlet —
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    alphabetic-word fraction, and distinct-stopword presence.  Returns
    one boolean per rule plus ``keep`` (all rules pass) so a curation
    run can report per-rule attrition, not just the survivor count.

    Everything is engine-portable integer/ratio arithmetic over one
    staged token array — a single scan-project, zero shuffles."""
    staged = df.withColumn("__g_toks", tokens_expr(text_col))
    flags = _gopher_flags(text_col)
    out = staged.select(
        "doc_id", *[c.alias(name) for name, c in flags.items()]
    )
    return out.withColumn(
        "keep",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords"),
    )


def with_gopher_keep(
    df: DataFrame, text_col: str = "text", out_col: str = "gopher_keep"
) -> DataFrame:
    """All input columns + one boolean ``out_col`` (every Gopher rule
    passes) — the stream-composable shape: stateless scan-project, so
    it applies unchanged to a streaming DataFrame."""
    staged = df.withColumn("__g_toks", tokens_expr(text_col))
    flags = _gopher_flags(text_col)
    keep = (
        flags["ok_word_count"]
        & flags["ok_mean_word_len"]
        & flags["ok_symbol_ratio"]
        & flags["ok_alpha_words"]
        & flags["ok_stopwords"]
    )
    return staged.withColumn(out_col, keep).drop("__g_toks")


def gopher_rules_oracle_sql(table: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`gopher_rules`."""
    toks = tokens_duck_sql(text_col)
    stop = _duck_str_array(GOPHER_STOPWORDS)
    return f"""
WITH t AS (SELECT doc_id, {text_col} AS txt, {toks} AS w FROM {table}),
sig AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(greatest(len(w), 1) AS DOUBLE) AS safe_n,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(w, x -> CAST(length(x) AS BIGINT))),
              (a, b) -> a + b) AS DOUBLE)
           / CAST(greatest(len(w), 1) AS DOUBLE) AS mean_wl,
         CAST(length(regexp_replace(txt, '[^#@]', '', 'g')) AS DOUBLE)
           + 3.0 * CAST(len(regexp_extract_all(txt, '\\.\\.\\.'))
                        AS DOUBLE) AS n_symbols,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
              AS DOUBLE) AS alpha_words,
         len(list_intersect(list_distinct(w), {stop})) AS stop_hits
  FROM t
)
SELECT doc_id, n_words, ok_word_count, ok_mean_word_len,
       ok_symbol_ratio, ok_alpha_words, ok_stopwords,
       (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
        AND ok_alpha_words AND ok_stopwords) AS keep
FROM (
  SELECT doc_id, n_words,
         (n_words >= {GOPHER_MIN_WORDS}
          AND n_words <= {GOPHER_MAX_WORDS}) AS ok_word_count,
         (mean_wl >= {GOPHER_MIN_MEAN_WORD_LEN!r}
          AND mean_wl <= {GOPHER_MAX_MEAN_WORD_LEN!r})
           AS ok_mean_word_len,
         ((n_symbols / safe_n) < {GOPHER_MAX_SYMBOL_RATIO!r})
           AS ok_symbol_ratio,
         ((alpha_words / safe_n) > {GOPHER_MIN_ALPHA_WORD_FRAC!r})
           AS ok_alpha_words,
         (stop_hits >= {GOPHER_MIN_STOPWORD_HITS}) AS ok_stopwords
  FROM sig
) flags
"""


#: C4 (Raffel et al. 2020, §2.2) line/page heuristics
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3
#: terminal punctuation a retained line must end with (period,
#: exclamation, question mark, end quotation)
_C4_TERMINAL_RE = '[.!?"]$'


def c4_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020 — the "Colossal Clean
    Crawled Corpus" heuristics, the OTHER canonical named ruleset next
    to :func:`gopher_rules`): LINE-level filtering — keep only lines
    that end in terminal punctuation, carry ≥ 5 words, and don't
    mention "javascript" — then PAGE-level gates — ≥ 3 sentences in
    the cleaned text, no "lorem ipsum", no curly brace.  Returns one
    row per doc: per-rule counts/booleans (per-rule attrition is
    reportable, the `gopher_rules` shape), ``keep``, and the CLEANED
    ``text`` (kept lines rejoined) — C4 rewrites pages, it doesn't
    just drop them.

    One scan-project over the line array, zero shuffles, zero UDFs —
    every predicate is engine-portable (the oracle runs the identical
    expressions).
    """
    lines = f"split({text_col}, chr(10))"
    kept = (
        f"filter({lines}, l -> l RLIKE '{_C4_TERMINAL_RE}' "
        f"AND size(filter(split(l, ' '), w -> w <> '')) "
        f">= {C4_MIN_WORDS_PER_LINE} "
        f"AND NOT contains(lower(l), 'javascript'))"
    )
    staged = df.select(
        id_col,
        F.col(text_col).alias("__raw"),
        F.expr(f"size({lines})").cast("bigint").alias("n_lines"),
        F.expr(f"array_join({kept}, chr(10))").alias("__clean"),
        F.expr(f"size({kept})").cast("bigint").alias("n_lines_kept"),
    )
    n_sent = F.length(
        F.regexp_replace(F.col("__clean"), "[^.!?]", "")
    ).cast("bigint")
    out = staged.select(
        id_col,
        "n_lines",
        "n_lines_kept",
        n_sent.alias("n_sentences"),
        (n_sent >= C4_MIN_SENTENCES).alias("ok_sentences"),
        (~F.expr("contains(lower(__raw), 'lorem ipsum')")).alias(
            "ok_lorem"
        ),
        (~F.expr("contains(__raw, '{')")).alias("ok_brace"),
        F.col("__clean").alias("text"),
    )
    return out.withColumn(
        "keep",
        F.col("ok_sentences") & F.col("ok_lorem") & F.col("ok_brace"),
    )


def c4_rules_oracle_sql(table: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`c4_rules` (identical predicates; the
    ``table`` operand may be an inline ``(SELECT ...)`` corpus)."""
    kept = (
        f"list_filter(string_split({text_col}, chr(10)), l -> "
        f"regexp_matches(l, '{_C4_TERMINAL_RE}') "
        f"AND len(list_filter(string_split(l, ' '), w -> w <> '')) "
        f">= {C4_MIN_WORDS_PER_LINE} "
        f"AND NOT contains(lower(l), 'javascript'))"
    )
    return f"""
WITH staged AS (
  SELECT doc_id, {text_col} AS raw,
         CAST(len(string_split({text_col}, chr(10))) AS BIGINT)
           AS n_lines,
         coalesce(array_to_string({kept}, chr(10)), '') AS clean,
         CAST(len({kept}) AS BIGINT) AS n_lines_kept
  FROM {table}
)
SELECT doc_id, n_lines, n_lines_kept, n_sentences, ok_sentences,
       ok_lorem, ok_brace, text,
       (ok_sentences AND ok_lorem AND ok_brace) AS keep
FROM (
  SELECT doc_id, n_lines, n_lines_kept,
         CAST(length(regexp_replace(clean, '[^.!?]', '', 'g'))
              AS BIGINT) AS n_sentences,
         (length(regexp_replace(clean, '[^.!?]', '', 'g'))
          >= {C4_MIN_SENTENCES}) AS ok_sentences,
         (NOT contains(lower(raw), 'lorem ipsum')) AS ok_lorem,
         (NOT contains(raw, '{{')) AS ok_brace,
         clean AS text
  FROM staged
)
"""


def corpus_report(
    df: DataFrame,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus composition report — the LLM twin of the reference's A6
    store report (`commands/report.py`): per group (default language ×
    source) document counts, token and character totals, and length
    extremes.  ONE scan + one map-side-combinable groupBy; the output
    is dimension-sized.  These totals are what mixing/sampling weights
    (`operators/mixing.py`, `operators/dsir.py`) are tuned against.
    """
    n_tok = F.size(tokens_expr(text_col)).cast("bigint")
    n_chars = F.length(text_col).cast("bigint")
    return (
        df.withColumn("__nt", n_tok)
        .withColumn("__nc", n_chars)
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__nt").cast("bigint").alias("total_tokens"),
            F.sum("__nc").cast("bigint").alias("total_chars"),
            F.min("__nt").cast("bigint").alias("min_tokens"),
            F.max("__nt").cast("bigint").alias("max_tokens"),
        )
    )


def corpus_report_oracle_sql(
    table: str,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
) -> str:
    toks = tokens_duck_sql(text_col)
    groups = ", ".join(group_cols)
    return f"""
SELECT {groups},
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({toks})) AS BIGINT) AS total_tokens,
       CAST(sum(length({text_col})) AS BIGINT) AS total_chars,
       CAST(min(len({toks})) AS BIGINT) AS min_tokens,
       CAST(max(len({toks})) AS BIGINT) AS max_tokens
FROM {table} GROUP BY {groups}
"""


def chunk_sequences(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-length training sequences: chunks of
    ``chunk_tokens`` whitespace tokens starting every ``stride`` tokens
    (default ``stride = chunk_tokens`` → disjoint; smaller stride →
    overlapping context windows, the standard LM pretraining shape).

    Returns ``(id, chunk_id, n_tokens, chunk_text)``; the final chunk
    of a document may be short, token-less documents produce no
    chunks.  Everything is in-row (stage tokens → slice → posexplode)
    — no shuffle at all; at 100 TB this stage streams.
    """
    k = int(chunk_tokens)
    s = int(stride) if stride is not None else k
    if s <= 0 or k <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    staged = df.withColumn("__toks", F.expr(tokens_spark_sql(text_col)))
    chunks = (
        "CASE WHEN size(__toks) >= 1 THEN "
        f"transform(sequence(1, size(__toks), {s}), "
        f"st -> array_join(slice(__toks, st, {k}), ' ')) "
        "ELSE array() END"
    )
    out = staged.select(
        F.col(id_col),
        F.col("__toks"),
        F.posexplode(F.expr(chunks)).alias("chunk_id", "chunk_text"),
    )
    n_tok = F.least(
        F.lit(k),
        F.size("__toks") - F.col("chunk_id") * F.lit(s),
    ).cast("bigint")
    return out.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        n_tok.alias("n_tokens"),
        "chunk_text",
    )


def chunk_sequences_oracle_sql(
    table: str,
    chunk_tokens: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`chunk_sequences`."""
    k = int(chunk_tokens)
    s = int(stride) if stride is not None else k
    toks = tokens_duck_sql(text_col)
    return f"""
WITH words AS (
  SELECT {id_col}, {toks} AS w FROM {table}
),
starts AS (
  SELECT {id_col}, w, st,
         CAST((st - 1) / {s} AS BIGINT) AS chunk_id
  FROM words
  CROSS JOIN UNNEST(generate_series(1, len(w), {s})) AS g(st)
  WHERE len(w) >= 1
)
SELECT {id_col}, chunk_id,
       CAST(least({k}, len(w) - (st - 1)) AS BIGINT) AS n_tokens,
       array_to_string(w[st:st + {k} - 1], ' ') AS chunk_text
FROM starts
"""


def dedup_segments_keep_first(
    df: DataFrame,
    seg_words: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-level dedup at fixed-size word-segment
    granularity (the scalable analog of suffix-array sequence dedup,
    Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    Better"): every exact k-word segment keeps only its FIRST occurrence
    in corpus order (doc id, then position — intra-document repeats
    dedup too); later occurrences are stripped and each document is
    rebuilt from its surviving segments.

    Returns ``(doc_id, n_segs, n_kept, n_dropped, new_text)``.

    Scale shape: unlike boilerplate removal (whose strip set is small
    and broadcasts back), the keep-first winner set is corpus-sized, so
    segment TEXT must flow through one shuffle — a window over
    ``md5(segment)`` picks first occurrences, and a per-document
    re-aggregation rebuilds the text.  Two shuffles total, both on
    (digest / doc id) keys; this is the honest cost of global
    keep-first semantics (distributed suffix-array pipelines pay the
    same sort).
    """
    k = int(seg_words)
    from pyspark.sql import Window

    segs = df.select(
        F.col(id_col),
        F.posexplode(F.expr(_segments_sql(text_col, k))).alias(
            "__idx", "__seg"
        ),
    )
    w = Window.partitionBy(F.md5("__seg")).orderBy(
        F.col(id_col).asc(), F.col("__idx").asc()
    )
    kept = (
        segs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.array_join(
            F.expr("transform(array_sort(collect_list("
                   "struct(__idx, __seg))), p -> p.__seg)"),
            " ",
        ).alias("new_text"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.expr(_segments_sql(text_col, k)))
        .cast("bigint")
        .alias("n_segs"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_segs",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        (F.col("n_segs") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_dropped"
        ),
        F.coalesce(F.col("new_text"), F.lit("")).alias("new_text"),
    )


def dedup_segments_oracle_sql(
    table: str,
    seg_words: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`dedup_segments_keep_first`."""
    k = int(seg_words)
    return f"""
WITH words AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}
),
segs AS (
  SELECT {id_col}, i AS idx,
         array_to_string(w[(i-1)*{k}+1:i*{k}], ' ') AS seg
  FROM words
  CROSS JOIN UNNEST(generate_series(
      1, CAST(ceil(len(w) / {k}.0) AS BIGINT))) AS s(i)
),
kept AS (
  SELECT {id_col}, idx, seg FROM (
    SELECT {id_col}, idx, seg,
           row_number() OVER (
             PARTITION BY md5(seg)
             ORDER BY {id_col} ASC, idx ASC) AS rn
    FROM segs
  ) WHERE rn = 1
),
rebuilt AS (
  SELECT {id_col}, count(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY idx) AS new_text
  FROM kept GROUP BY {id_col}
),
totals AS (
  SELECT {id_col}, count(*) AS n_segs FROM segs GROUP BY {id_col}
)
SELECT t.{id_col},
       CAST(t.n_segs AS BIGINT) AS n_segs,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_segs - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
       coalesce(r.new_text, '') AS new_text
FROM totals t LEFT JOIN rebuilt r ON t.{id_col} = r.{id_col}
"""


def boilerplate_segments_ctes(
    table: str,
    seg_words: int = 4,
    max_docs: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: str = "bp_",
) -> tuple[str, str]:
    """The boilerplate-removal computation as a FLAT, prefixed CTE
    chain ``(ctes_sql, final_select_sql)`` — composable into a larger
    ``WITH`` chain (the curation-pipeline oracle) where a nested
    ``WITH`` would clash with the outer recursive chain's name scope."""
    k = int(seg_words)
    p = prefix
    ctes = f"""{p}words AS (
  SELECT {id_col}, string_split(coalesce({text_col}, ''), ' ') AS w
  FROM {table}
),
{p}segs AS (
  SELECT {id_col}, i AS idx,
         array_to_string(w[(i-1)*{k}+1:i*{k}], ' ') AS seg
  FROM {p}words
  CROSS JOIN UNNEST(generate_series(
      1, CAST(ceil(len(w) / {k}.0) AS BIGINT))) AS s(i)
),
{p}freq AS (
  SELECT md5(seg) AS digest, count(DISTINCT {id_col}) AS nd
  FROM {p}segs GROUP BY md5(seg)
),
{p}kept AS (
  SELECT s.{id_col}, s.idx, s.seg
  FROM {p}segs s JOIN {p}freq f ON md5(s.seg) = f.digest
  WHERE f.nd < {int(max_docs)}
),
{p}rebuilt AS (
  SELECT {id_col},
         count(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY idx) AS new_text
  FROM {p}kept GROUP BY {id_col}
),
{p}totals AS (
  SELECT {id_col}, count(*) AS n_segs FROM {p}segs GROUP BY {id_col}
)"""
    final = f"""SELECT t.{id_col},
       CAST(t.n_segs AS BIGINT) AS n_segs,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_segs - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
       coalesce(r.new_text, '') AS new_text
FROM {p}totals t LEFT JOIN {p}rebuilt r ON t.{id_col} = r.{id_col}"""
    return ctes, final


def boilerplate_segments_oracle_sql(
    table: str,
    seg_words: int = 4,
    max_docs: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`remove_boilerplate_segments` (naive
    explode–join–reaggregate formulation)."""
    ctes, final = boilerplate_segments_ctes(
        table, seg_words, max_docs, id_col, text_col, prefix=""
    )
    return f"""
WITH {ctes}
{final}
"""


# ---------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------

def tfidf_top_terms(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``n`` TF-IDF terms per document — the classic corpus-level
    keyword/topic signal (search relevance, cluster labeling, DSIR-style
    domain features).

    Shape: tokenize in-row (codegen'd ``split``+``explode``), one
    map-side-combinable groupBy for per-doc term frequencies, one more
    for document frequencies (|vocab| rows), an equi-join of the two on
    the term (AQE handles hot stopword terms), a one-row document-count
    broadcast, then a per-document ``row_number`` — bounded by each
    document's vocabulary, so the window partitions stay small by
    construction.  No Python anywhere.

    Parity: score = ``round(tf * ln(N / df), 6)`` with every cast and
    the operand order pinned; ranked on the *rounded* score with a term
    tie-break so rank boundaries agree across engines.
    """
    tok = (
        df.select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    # checkpointed (r17): `tf` feeds BOTH the score join's left side
    # and the document-frequency roll-up — un-materialized, the whole
    # scan + token explode + (doc, term) exchange executed twice (the
    # r17 plan audit: 3 corpus scans in the final plan, no exchange
    # reuse).  (doc, term, tf) is the corpus vocabulary level — far
    # smaller than the exploded tokens it replaces.  Eager: the call
    # now runs one Spark job up front.
    tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.groupBy().agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("__n_docs").cast("double")
                    / F.col("df").cast("double")
                ),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def tfidf_oracle_sql(
    table: str,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``tfidf_top_terms`` — identical tokenization,
    pinned score expression, rounded-score ranking."""
    return f"""
WITH tok AS (
  SELECT {id_col}, term FROM (
    SELECT {id_col},
           unnest(string_split_regex(lower({text_col}), '[^a-z]+')) AS term
    FROM {table}
  ) WHERE term <> ''
),
tf AS (SELECT {id_col}, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM {table}),
scored AS (
  SELECT tf.{id_col}, tf.term,
         round(CAST(tf.tf AS DOUBLE)
               * ln(CAST(nd.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)),
               6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
)
SELECT {id_col}, term, tfidf, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {id_col}
    ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {int(n)}
"""


# ------------------------------------------------------- hashed embeddings
def embed_text_hashed(
    docs: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic text → vector embedding WITHOUT a model: the
    classic hashing trick (signed feature hashing, Weinberger et al.).
    Each token hashes to a bucket ``md5 % dim`` with sign from the
    next hash bit; the doc vector is the per-bucket signed token count,
    L2-normalized.  Output ``(id, embedding array<double>)`` composes
    with EVERY vector operator in the repo — `semantic_dedup`,
    `kmeans_fit`, `ivf_join`, `semantic_decontamination`,
    `embedding_increment` — so a cluster with no GPU still gets
    semantic-shaped dedup/retrieval end-to-end from raw text.

    Scale shape: one explode + a map-side-combinable (id, bucket)
    groupBy (token stream collapses to ≤ dim rows per doc BEFORE the
    second, tiny per-doc rebuild shuffle — the right trade vs one fat
    collect_list shuffle); the dense vector is assembled in-row from
    the sparse bucket map.  Components round on
    the half-up 6-dp grid AFTER the exact integer bucket sums, the
    same cross-engine pin as the codec features."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.expr(tokens_spark_sql(text_col))).alias("__tok"),
    )
    h = "CAST(conv(substring(md5(__tok), 1, 15), 16, 10) AS BIGINT)"
    buckets = (
        toks.select(
            id_col,
            F.expr(f"pmod({h}, {int(dim)})").alias("__b"),
            F.expr(
                f"CASE WHEN pmod({h} div {int(dim)}, 2) = 0 "
                "THEN 1 ELSE -1 END"
            ).alias("__s"),
        )
        .groupBy(id_col, "__b")
        .agg(F.sum("__s").alias("__v"))
    )
    dense = (
        buckets.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("__b", "__v")))
            ).alias("__m")
        )
        .select(
            id_col,
            F.expr(
                f"transform(sequence(0, {int(dim) - 1}), "
                "i -> CAST(coalesce(__m[i], 0) AS DOUBLE))"
            ).alias("__raw"),
        )
    )
    norm = (
        "sqrt(aggregate(__raw, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x * x))"
    )
    return dense.select(
        id_col,
        F.expr(
            f"CASE WHEN {norm} = 0.0 THEN __raw ELSE "
            f"transform(__raw, x -> floor(x / {norm} * 1000000 + 0.5) "
            "/ 1000000) END"
        ).alias("embedding"),
    )


def embed_text_hashed_oracle_sql(
    table: str = "documents",
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`embed_text_hashed` — identical md5 bucket
    and sign derivation, exact integer sums, one final half-up 6-dp
    rounding of each normalized component."""
    toks = tokens_duck_sql(text_col)
    h = (
        "CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, t.tok AS tok
  FROM {table}, UNNEST({toks}) AS t(tok)
),
b AS (
  SELECT {id_col},
         {h} % {int(dim)} AS bkt,
         CASE WHEN (({h} // {int(dim)}) % 2) = 0 THEN 1 ELSE -1 END AS s
  FROM toks
),
sums AS (
  SELECT {id_col}, bkt, CAST(sum(s) AS DOUBLE) AS v
  FROM b GROUP BY {id_col}, bkt
),
pairs AS (
  SELECT {id_col}, list(struct_pack(bkt := bkt, v := v)) AS ps
  FROM sums GROUP BY {id_col}
),
dense AS (
  SELECT {id_col},
         list_transform(generate_series(0, {int(dim) - 1}),
           i -> coalesce(list_sum(list_transform(
                  list_filter(ps, p -> p.bkt = i), p -> p.v)),
                0.0)) AS raw
  FROM pairs
),
n AS (
  SELECT {id_col}, raw,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(raw, x -> x * x)),
              (acc, x) -> acc + x)) AS nrm
  FROM dense
)
SELECT {id_col},
       CASE WHEN nrm = 0.0 THEN raw
            ELSE list_transform(raw,
                 x -> floor(x / nrm * 1000000 + 0.5) / 1000000)
       END AS embedding
FROM n
"""


# ---------------------------------------------------------------------
# Unicode script profile — multilingual curation (round 11)
# ---------------------------------------------------------------------
#: script -> character-class body (actual code points, identical
#: bytes in the Spark (Java regex) and DuckDB (RE2) patterns).  Kept
#: to the majors a curation pipeline filters on; extend freely.
SCRIPT_CLASSES: "dict[str, str]" = {
    "arabic": "؀-ۿ",
    "cjk": "一-鿿",
    "cyrillic": "Ѐ-ӿ",
    "devanagari": "ऀ-ॿ",
    "greek": "Ͱ-Ͽ",
    "hangul": "가-힯",
    "hebrew": "֐-׿",
    "latin": "A-Za-z",
}


def with_script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Unicode SCRIPT histogram — the wrong-language /
    mixed-script spam signal multilingual curation filters on (a doc
    labeled 'de' that is 40% Cyrillic is mislabeled or spam; CJK
    inside a Latin crawl segment is boilerplate leakage).

    Adds ``n_<script>`` code-point counts for the eight major script
    blocks plus ``n_digit``, and ``dominant_script`` (argmax with
    alphabetical tie-break; 'none' when no script chars at all).  All
    outputs are exact integers + one label — zero float-parity
    surface.  One whole-stage-codegen projection: each count is
    ``length(regexp_replace(text, '[^class]', ''))``, no UDF, no
    shuffle."""
    out = df
    names = sorted(SCRIPT_CLASSES)
    for name in names:
        cls = SCRIPT_CLASSES[name]
        out = out.withColumn(
            f"n_{name}",
            F.length(
                F.regexp_replace(F.col(text_col), f"[^{cls}]", "")
            ).cast("bigint"),
        )
    out = out.withColumn(
        "n_digit",
        F.length(
            F.regexp_replace(F.col(text_col), "[^0-9]", "")
        ).cast("bigint"),
    )
    mx = F.greatest(*[F.col(f"n_{n}") for n in names])
    dom = F.when(mx == 0, F.lit("none"))
    for name in names:  # alphabetical order IS the tie-break
        dom = dom.when(F.col(f"n_{name}") == mx, F.lit(name))
    return out.withColumn("dominant_script", dom)


def script_profile_duck_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`with_script_profile`'s added columns, as
    a SELECT fragment over ``text_expr``."""
    names = sorted(SCRIPT_CLASSES)
    cols = [
        f"CAST(length(regexp_replace({text_expr}, "
        f"'[^{SCRIPT_CLASSES[n]}]', '', 'g')) AS BIGINT) AS n_{n}"
        for n in names
    ]
    cols.append(
        f"CAST(length(regexp_replace({text_expr}, '[^0-9]', '', 'g'))"
        " AS BIGINT) AS n_digit"
    )
    mx = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    case = "CASE WHEN " + mx + " = 0 THEN 'none' "
    for n in names:
        case += f"WHEN n_{n} = {mx} THEN '{n}' "
    case += "END"
    return ",\n       ".join(cols) + f",\n       {case} AS dominant_script"
