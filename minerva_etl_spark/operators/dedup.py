"""Deduplication operators for large-scale document pipelines.

Four tiers (BASELINE.json north star; each with a DuckDB oracle):

- **exact**: hash-groupBy on a normalized content key — one shuffle on
  the 128-bit digest; at 100 TB this is the cheapest possible dedup
  (shuffle of (digest, doc_id) pairs only, never the payload).
- **MinHash + LSH**: shingle → k md5-seeded minhashes → band buckets →
  bucket-join for candidate pairs.  The band join is an equi-join on
  (band_index, band_hash) so Spark shuffles only signature rows;
  candidate verification re-joins the (small) pair list back to the
  signatures.  No O(n²) stage anywhere.
- **n-gram Jaccard**: exact Jaccard over shingle sets for candidate
  pairs produced by LSH (verification tier).
- **SimHash**: 64-bit sign-sum fingerprint; near-dups = equal simhash
  band keys (implemented in `simhash_spark_cols`; round-2: hamming
  radius search).

Determinism: every hash is md5-derived (seeded by concatenation), so
signatures are engine-independent and oracle-checkable — no JVM
murmur3 / library-specific hashing anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from minerva_etl_spark.operators.text import (
    tokens_duck_sql,
    tokens_expr,
    tokens_spark_sql,
)

# ------------------------------------------------------------------- exact
def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep the lowest-id representative per identical (normalized) text.

    Returns (content_key, keep_id, n_dups).  groupBy on the digest —
    min/count are map-side partially aggregated, so the shuffle carries
    one row per distinct digest per task.
    """
    if normalize:
        key = F.md5(F.array_join(F.expr(tokens_spark_sql(text_col)), " "))
    else:
        key = F.md5(F.col(text_col))
    return (
        df.select(key.alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(
            F.min(id_col).cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        )
    )


def exact_dedup_oracle_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    toks = tokens_duck_sql(text_col)
    return f"""
SELECT md5(array_to_string({toks}, ' ')) AS content_key,
       CAST(min({id_col}) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM {table}
GROUP BY 1
"""


# ------------------------------------------------------------------ shingles
def shingles_from_tokens_spark_sql(toks: str, n: int = 3) -> str:
    """n-word shingles from a token-array expression (Spark SQL).

    IMPORTANT: pass a *column name* (or other cheap attribute) as
    ``toks`` in execution paths — a lambda body re-evaluates any inlined
    expression per array element, turning an inlined tokenizer into
    O(tokens²) regex work per row.  Callers stage tokens with
    ``withColumn`` first (see :func:`minhash_signatures`).
    """
    parts = ", ".join(f"element_at({toks}, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE array(array_join({toks}, ' ')) END"
    )


def shingles_spark_sql(text_col: str, n: int = 3) -> str:
    """n-word shingles straight from a text column (compact form for
    documentation/oracles; execution paths stage tokens first)."""
    return shingles_from_tokens_spark_sql(tokens_spark_sql(text_col), n)


def shingles_duck_sql(text_col: str, n: int = 3) -> str:
    toks = tokens_duck_sql(text_col)
    parts = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> {parts})) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )


# ------------------------------------------------------------------- minhash
#: fixed permutation constants (a, b) for h_i(x) = (a*x + b) mod P —
#: the classic 1-strong-hash + k-cheap-permutations minhash scheme.
#: All < 2^30 so products stay inside int64 in every engine.
MINHASH_PRIME = 2147483647  # 2^31 - 1
MINHASH_COEFFS: list[tuple[int, int]] = [
    (387420489, 928772371), (268435399, 517577239), (912342347, 123456791),
    (715827881, 862530893), (536870909, 275604541), (402653189, 617247893),
    (329252781, 943717891), (198491317, 104395301), (295075153, 472882027),
    (533000389, 377777777), (956722027, 188888881), (611953021, 741455309),
    (879190747, 333666999), (477218579, 256203161), (655360001, 999999937),
    (314159257, 271828171),
]


def _base_hash_spark(shingle_expr: str) -> str:
    """28-bit md5-derived base hash of one shingle (engine-identical)."""
    return f"CAST(conv(substring(md5({shingle_expr}), 1, 7), 16, 10) AS BIGINT)"


def _base_hash_duck(shingle_expr: str) -> str:
    return f"CAST(('0x' || substr(md5({shingle_expr}), 1, 7)) AS BIGINT)"


def shingles_column(
    df: DataFrame, text_col: str, shingle_size: int = 3
) -> DataFrame:
    """df + ``__shingles`` array column, with tokenization staged as its
    own column so it runs exactly once per row."""
    return df.withColumn(
        "__toks", F.expr(tokens_spark_sql(text_col))
    ).withColumn(
        "__shingles",
        F.expr(shingles_from_tokens_spark_sql("__toks", shingle_size)),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) minhash signatures.

    Plan: explode shingles (tokenize+shingle once per doc), ONE md5 per
    shingle, then k linear permutations folded by a map-side-combined
    groupBy(id).min().  At scale this beats per-doc nested array
    expressions: codegen stays small, hashing cost is paid once, and
    the shuffle carries k longs per document.
    """
    assert num_hashes <= len(MINHASH_COEFFS)
    staged = shingles_column(df, text_col, shingle_size)
    # explode_outer, NOT explode: plain explode plants a pushed-down
    # `size(shingles) > 0` filter in which the optimizer re-inlines the
    # whole tokenize+shingle expression; interpreted per-element
    # evaluation of that filter is O(tokens²) per row.  Outer explode
    # has no such filter; shingle arrays are never empty by
    # construction, and nulls are dropped after.
    exploded = staged.select(
        F.col(id_col), F.explode_outer(F.col("__shingles")).alias("__shingle")
    ).filter(F.col("__shingle").isNotNull()).select(
        F.col(id_col), F.expr(_base_hash_spark("__shingle")).alias("__h")
    )
    aggs = [
        F.min(
            (F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MINHASH_PRIME)
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """LSH band join: docs sharing any band of minhashes become candidate
    pairs; estimated Jaccard = fraction of matching minhashes.

    Plan shape: signatures (narrow) → explode to (band_key, id, sig
    struct) → self-equi-join on band_key → estimate → distinct.  The
    signature struct RIDES the band explode, so the whole signature
    lineage (tokenize + shingle explode + md5 + groupBy) executes
    exactly once per side of one join — the pre-r16 shape computed it
    three times (melt + two re-joins of the signature table onto the
    deduped pairs) and paid two extra exchanges (guide §2.4/§1.2: the
    estimate is a function of data the band join already carries).
    ``est_jaccard`` is deterministic per pair, so distinct-after
    equals the old distinct-before + re-join.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    band_cols = []
    for b in range(bands):
        parts = [f"mh_{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.md5(F.concat_ws(",", F.lit(b), *parts)).alias(f"band_{b}")
        )
    melted = sigs.select(
        F.col(id_col),
        F.struct(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias(
            "__sig"
        ),
        F.explode(F.array(*band_cols)).alias("band_key"),
    )
    left = melted.select(
        F.col(id_col).alias("id_a"),
        F.col("__sig").alias("__sig_a"),
        "band_key",
    )
    right = melted.select(
        F.col(id_col).alias("id_b"),
        F.col("__sig").alias("__sig_b"),
        "band_key",
    )
    matches = sum(
        F.when(
            F.col("__sig_a")[f"mh_{i}"] == F.col("__sig_b")[f"mh_{i}"], 1
        ).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        left.join(right, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (matches.cast("double") / F.lit(float(num_hashes))).alias(
                "est_jaccard"
            ),
        )
        .distinct()
    )


def minhash_pairs_oracle_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> str:
    sh = shingles_duck_sql(text_col, shingle_size)
    mh_cols = ",\n    ".join(
        f"min(({a} * __h + {b}) % {MINHASH_PRIME}) AS mh_{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    )
    rows_per_band = num_hashes // bands
    band_exprs = []
    for b in range(bands):
        parts = " || ',' || ".join(
            f"CAST(mh_{i} AS VARCHAR)"
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        )
        band_exprs.append(f"md5('{b}' || ',' || {parts}) AS band_{b}")
    bands_sql = ",\n    ".join(band_exprs)
    band_union = "\nUNION ALL\n".join(
        f"SELECT {id_col}, band_{b} AS band_key FROM banded" for b in range(bands)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
WITH exploded AS (
  SELECT {id_col}, unnest({sh}) AS __shingle FROM {table}
), hashed AS (
  SELECT {id_col}, {_base_hash_duck('__shingle')} AS __h FROM exploded
), sigs AS (
  SELECT {id_col},
    {mh_cols}
  FROM hashed
  GROUP BY {id_col}
), banded AS (
  SELECT {id_col},
    {bands_sql}
  FROM sigs
), melted AS (
{band_union}
), pairs AS (
  SELECT DISTINCT l.{id_col} AS id_a, r.{id_col} AS id_b
  FROM melted l JOIN melted r ON l.band_key = r.band_key
  WHERE l.{id_col} < r.{id_col}
)
SELECT p.id_a, p.id_b,
       CAST(({match_sum}) AS DOUBLE) / {float(num_hashes)} AS est_jaccard
FROM pairs p
JOIN sigs a ON a.{id_col} = p.id_a
JOIN sigs b ON b.{id_col} = p.id_b
"""


# ------------------------------------------------------------ n-gram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
) -> DataFrame:
    """Exact Jaccard over shingle sets for (id_a, id_b) candidate pairs —
    the verification tier after LSH.  Joins shingle arrays to the pair
    list (pair list is small → broadcast) and computes
    |A ∩ B| / |A ∪ B| with array built-ins."""
    docs = shingles_column(df, text_col, shingle_size).select(
        F.col(id_col), F.col("__shingles").alias("shingles")
    )
    a = docs.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")
    )
    b = docs.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        candidate_pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )


# ------------------------------------------------------------------- simhash
def simhash_spark_cols(
    text_col: str = "text", bits: int = 64
) -> "F.Column":
    """64-bit SimHash: per token, a 60-bit md5 hash; fingerprint bit b is
    the sign of sum over tokens of (+1 if bit set else -1).

    Pure higher-order-function pipeline (no explode, no shuffle):
    aggregate token hashes into per-bit counters, then assemble bits.
    """
    toks = tokens_spark_sql(text_col)
    hashes = (
        f"transform({toks}, s -> "
        f"CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))"
    )
    # per-bit net sign sum folded into an array<int> accumulator
    acc0 = "array_repeat(0, %d)" % bits
    step = (
        f"(acc, h) -> zip_with(acc, sequence(0, {bits - 1}), "
        f"(a, b) -> a + CASE WHEN (h div shiftleft(1L, b)) % 2 = 1 "
        f"THEN 1 ELSE -1 END)"
    )
    counters = f"aggregate({hashes}, {acc0}, {step})"
    assemble = (
        f"aggregate(zip_with({counters}, sequence(0, {bits - 1}), "
        f"(c, b) -> CASE WHEN c > 0 THEN shiftleft(1L, b) ELSE 0L END), "
        f"0L, (acc, x) -> acc + x)"
    )
    return F.expr(assemble)


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """SimHash via explode + codegen'd aggregation.

    The pure higher-order-function form (`simhash_spark_cols`) evaluates
    its lambdas interpreted — ~tokens×bits closure calls per row.  This
    plan explodes tokens (tokenizer runs once per row), hashes each
    token once, then folds the 60 per-bit sign counters in a hash
    aggregate (whole-stage codegen, map-side combined) and assembles the
    fingerprint in one projection.  Same values, ~5× faster, and the
    aggregate shuffles 60 ints per doc.
    """
    staged = df.withColumn("__toks", F.expr(tokens_spark_sql(text_col)))
    exploded = staged.select(
        F.col(id_col), F.explode_outer("__toks").alias("__tok")
    ).select(
        F.col(id_col),
        F.expr(
            "CASE WHEN __tok IS NULL THEN NULL ELSE "
            "CAST(conv(substring(md5(__tok), 1, 15), 16, 10) AS BIGINT) END"
        ).alias("__h"),
    )
    bit_sums = [
        F.sum(
            F.expr(
                f"CASE WHEN __h IS NULL THEN 0 "
                f"WHEN (__h div {1 << b}) % 2 = 1 THEN 1 ELSE -1 END"
            )
        ).alias(f"__b{b}")
        for b in range(bits)
    ]
    counters = exploded.groupBy(id_col).agg(*bit_sums)
    assemble = sum(
        (F.when(F.col(f"__b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)))
        for b in range(bits)
    )
    return counters.select(
        F.col(id_col), assemble.cast("bigint").alias("simhash")
    )


def simhash_banded_pairs(
    df: DataFrame,
    bands: int = 4,
    radius: int | None = 3,
    bits: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hamming-radius near-dup pairs via pigeonhole banding.

    Split the ``bits``-bit fingerprint into ``bands`` equal chunks and
    equi-join on any matching (band index, chunk value).  Pigeonhole: a
    pair within hamming distance ``bands - 1`` differs in at most
    ``bands - 1`` chunks, so at least one chunk matches — banding with
    ``radius + 1`` bands has PERFECT recall at that radius (no
    hamming-ball probing needed; this is the scalable generalization of
    multi-probe).  The default 4×15-bit bands guarantee every pair with
    hamming ≤ 3; the exact ``bit_count(a^b)`` verifier then drops
    coincidental band collisions.

    Scale shape: signatures are one long per doc; the join is an
    equi-join on (band, chunk) — no O(n²) stage.  15-bit bands give 32k
    buckets per band; for corpora where that skews, raise ``bits``/use
    more, narrower bands the same way.
    """
    assert bits % bands == 0, "bits must divide evenly into bands"
    # pigeonhole recall contract: a pair within hamming `radius` differs
    # in at most `radius` chunks, so it needs radius+1 bands to be
    # guaranteed one matching chunk — fewer bands silently lose pairs
    assert radius is None or bands >= radius + 1, (
        f"perfect recall at hamming radius {radius} requires "
        f">= {radius + 1} bands (got {bands})"
    )
    width = bits // bands
    sh = simhash(df, text_col=text_col, id_col=id_col, bits=bits)
    sh = sh.localCheckpoint(eager=True)  # tiny; don't recompute per side
    melted = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.concat_ws(
                    ":",
                    F.lit(c),
                    F.expr(
                        f"(simhash div {1 << (width * c)}) % {1 << width}"
                    ).cast("string"),
                )
                for c in range(bands)
            ])
        ).alias("band"),
    )
    left = melted.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band"
    )
    right = melted.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band"
    )
    pairs = (
        left.join(right, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    out = pairs.select(
        "id_a",
        "id_b",
        F.bit_count(F.expr("sh_a ^ sh_b")).cast("bigint").alias("hamming"),
    )
    if radius is not None:
        out = out.filter(F.col("hamming") <= radius)
    return out


def simhash_banded_pairs_oracle_sql(
    table: str,
    radius: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
) -> str:
    """Brute-force all-pairs oracle.  Equality against the banded join
    proves PERFECT recall at the radius (pigeonhole), not merely that
    the produced pairs are plausible."""
    sims = simhash_oracle_sql(table, text_col, id_col, bits)
    return f"""
WITH sh AS ({sims})
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.{id_col} < b.{id_col}
WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
"""


def simhash_oracle_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> str:
    toks = tokens_duck_sql(text_col)
    hashes = (
        f"list_transform({toks}, s -> "
        f"CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))"
    )
    bit_terms = []
    for b in range(bits):
        net = (
            f"list_sum(list_transform(hashes, h -> "
            f"CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        bit_terms.append(
            f"CASE WHEN coalesce({net}, 0) > 0 THEN CAST({1 << b} AS BIGINT)"
            f" ELSE 0 END"
        )
    total = " + ".join(bit_terms)
    return (
        f"WITH h AS (SELECT {id_col}, {hashes} AS hashes FROM {table}) "
        f"SELECT {id_col}, CAST({total} AS BIGINT) AS simhash FROM h"
    )


# ------------------------------------------------------- decontamination
def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing word
    ``n``-gram shingles with a benchmark/eval set (the pre-training
    hygiene step that keeps eval questions out of the training corpus).

    Returns ``(doc_id, n_hits, n_shingles, contaminated_frac)`` for
    corpus docs with at least one overlapping shingle — ``n_hits`` is
    the number of DISTINCT corpus-doc shingles found in the benchmark.

    Scale shape: the benchmark's distinct shingle set is tiny relative
    to the corpus (eval sets are MBs, corpora are TBs) and is
    broadcast — the corpus side is one explode + broadcast-hash-join +
    map-side-combined count, no shuffle of corpus text and no O(n²)
    stage."""
    staged = corpus.withColumn("__toks", tokens_expr(text_col)).withColumn(
        "__shingles", F.expr(shingles_from_tokens_spark_sql("__toks", n))
    )
    # explode_outer, not explode: plain explode's pushed-down
    # `size() > 0` filter re-inlines the tokenize+shingle expression
    # (see minhash_signatures above).
    # the != '' filter drops the empty pseudo-shingle an empty/whitespace
    # doc produces (short-doc fallback in shingles_from_tokens_spark_sql)
    # on BOTH sides — otherwise one empty benchmark doc would flag every
    # empty corpus doc as 100% contaminated
    exploded = staged.select(
        F.col(id_col),
        F.size("__shingles").alias("__n_shingles"),
        F.explode_outer("__shingles").alias("__shingle"),
    ).filter(F.col("__shingle").isNotNull() & (F.col("__shingle") != ""))
    bench = (
        benchmark.withColumn("__toks", tokens_expr(text_col))
        .withColumn(
            "__shingles", F.expr(shingles_from_tokens_spark_sql("__toks", n))
        )
        .select(F.explode_outer("__shingles").alias("__shingle"))
        .filter(F.col("__shingle").isNotNull() & (F.col("__shingle") != ""))
        .distinct()
    )
    return (
        exploded.join(F.broadcast(bench), "__shingle")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_hits"),
            F.first("__n_shingles").cast("bigint").alias("n_shingles"),
        )
        .withColumn(
            "contaminated_frac",
            F.col("n_hits").cast("double") / F.col("n_shingles").cast("double"),
        )
    )


def contamination_oracle_sql(
    corpus_pred: str,
    bench_pred: str,
    table: str = "documents",
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`contamination_check` with corpus/benchmark
    split by the given predicates over one table."""
    sh = shingles_duck_sql(text_col, n)
    return f"""
WITH sh AS (
  SELECT {id_col}, {sh} AS shingles FROM {table}
),
corpus AS (
  SELECT {id_col}, len(shingles) AS n_shingles, unnest(shingles) AS s
  FROM sh WHERE {corpus_pred}
),
bench AS (
  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE {bench_pred}
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST(any_value(n_shingles) AS BIGINT) AS n_shingles,
       CAST(count(*) AS DOUBLE) / CAST(any_value(n_shingles) AS DOUBLE)
         AS contaminated_frac
FROM corpus JOIN bench USING (s)
WHERE s <> ''
GROUP BY {id_col}
"""


# ----------------------------------------------------- cluster assignment
def _free_local_checkpoint(df: DataFrame) -> None:
    """Release the block-manager storage backing a ``localCheckpoint``'d
    DataFrame.  Spark exposes no public API for this: the analyzed plan
    of a checkpointed Dataset is a ``LogicalRDD`` whose ``rdd`` is the
    persisted internal RDD — unpersist that.  Best-effort (a plain
    un-checkpointed DataFrame has no ``rdd()`` on its analyzed plan and
    falls through silently).  The DataFrame must not be used after."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "label-propagation",
    check_every: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """Near-dup CLUSTERS from a verified pair list: every document in a
    connected component is labeled with the smallest doc id reachable —
    the canonical representative a dedup pass keeps (pipeline step after
    MinHash/SimHash pair generation; the reference has no equivalent —
    LLM-pipeline extension).

    Two algorithms, same output contract:

    - ``label-propagation`` (default): each round every node takes
      ``min(own label, neighbors' labels)``; one shuffle per round (the
      groupBy on the destination id).  Rounds = graph diameter — near-dup
      graphs are clique-ish (banded LSH emits all intra-cluster pairs),
      so this converges in 2-3 rounds.
    - ``star``: alternating large-star/small-star contraction (Kiveris
      et al., "Connected Components in MapReduce and Beyond") — the edge
      set itself is rewritten toward per-component stars, converging in
      O(log n) alternations even on adversarial long-chain graphs where
      label propagation needs diameter rounds.
    - ``auto``: label propagation with a small round budget (right for
      the common clique-ish case), escalating to ``star`` if it has not
      converged — diameter-robust without paying star's extra shuffles
      on easy graphs.

    Driver-loop hygiene (both variants): per-round ``localCheckpoint``
    truncates the iterative lineage; the superseded round's checkpoint
    blocks are freed as soon as the next round is materialized, so
    executor storage stays flat at ~2 rounds of state regardless of
    iteration count; convergence is counted only every ``check_every``
    rounds (a converged extra round is cheaper than a count job per
    round).  State is one (id, label) / (node, root) row per *paired*
    document, a vanishing fraction of the corpus.

    ``stats`` (optional dict) is filled with ``rounds`` actually run.

    Returns ``(doc_id, component_id)`` for every document that appears
    in at least one pair — including documents whose only pair is a
    self-pair (``id_a == id_b``), which become their own singleton
    component.  Docs appearing in no pair at all are left out — at
    100 TB that's the difference between shuffling the pair graph and
    shuffling the corpus.
    """
    # docs whose ONLY appearance is a self-pair would vanish once
    # self-loops are filtered from the edge set; keep them as singleton
    # seeds (tiny/usually-empty set — only self-pairs shuffle here)
    selfs = (
        pairs.filter(F.col(id_a) == F.col(id_b))
        .select(F.col(id_a).alias("doc_id"))
        .distinct()
    )

    def _with_self_singletons(out: DataFrame) -> DataFrame:
        return out.unionByName(
            selfs.join(out, "doc_id", "left_anti").select(
                "doc_id", F.col("doc_id").alias("component_id")
            )
        )

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round
    )
    if algorithm == "star":
        out = _star_components(edges, max_iter, check_every, stats)
        _free_local_checkpoint(edges)
        return _with_self_singletons(out)
    # auto: give label propagation a small budget before escalating —
    # clique-ish near-dup graphs converge well inside it
    budget = min(max_iter, 3 * check_every) if algorithm == "auto" else max_iter
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    rounds = 0
    converged = False
    for i in range(budget):
        msgs = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(msgs, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        rounds += 1
        converged = False
        if (i + 1) % check_every == 0 or i == budget - 1:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            converged = changed == 0
        _free_local_checkpoint(labels)
        labels = new_labels
        if converged:
            break
    if not converged and algorithm == "auto":
        # long-diameter graph: discard partial labels, finish with star
        _free_local_checkpoint(labels)
        out = _star_components(edges, max_iter, check_every, stats)
        if stats is not None:
            stats["rounds"] += rounds
            stats["algorithm"] = "label-propagation+star"
        _free_local_checkpoint(edges)
        return _with_self_singletons(out)
    if stats is not None:
        stats["rounds"] = rounds
        stats["algorithm"] = "label-propagation"
    _free_local_checkpoint(edges)
    return _with_self_singletons(
        labels.select(
            F.col("id").alias("doc_id"), F.col("label").alias("component_id")
        )
    )


def _star_components(
    edges: DataFrame, max_iter: int, check_every: int, stats: dict | None
) -> DataFrame:
    """Alternating large-star/small-star over a canonical (src>dst) edge
    set until it reaches its fixed point (per-component stars rooted at
    the component minimum).  One alternation = two shuffles; O(log n)
    alternations on any graph shape."""

    def large_star(e: DataFrame) -> DataFrame:
        nbrs = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = (
            nbrs.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .select("src", F.least("src", "mn").alias("m"))
        )
        # connect every larger neighbor to the local minimum
        return (
            nbrs.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        m = e.groupBy("src").agg(F.min("dst").alias("m"))
        rewired = (
            e.join(m, "src")
            .filter(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        direct = m.select("src", F.col("m").alias("dst"))
        return rewired.unionByName(direct).distinct()

    def signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                # decimal: a sum of 64-bit hashes overflows bigint (ANSI)
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    nodes = edges.select(F.col("src").alias("id")).distinct()
    cur = (
        edges.filter(F.col("src") > F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    rounds = 0
    for i in range(max_iter):
        nxt = small_star(large_star(cur)).localCheckpoint(eager=True)
        rounds += 1
        converged = False
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            sig = signature(nxt)
            converged = sig == prev_sig
            prev_sig = sig
        _free_local_checkpoint(cur)
        cur = nxt
        if converged:
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["algorithm"] = "star"
    roots = cur.groupBy("src").agg(F.min("dst").alias("label"))
    out = (
        nodes.join(roots.withColumnRenamed("src", "id"), "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("label", "id").alias("component_id"),
        )
    )
    # the star edge set must outlive this function's checkpoints: the
    # caller consumes `out` lazily, so materialize before freeing
    out = out.localCheckpoint(eager=True)
    _free_local_checkpoint(cur)
    return out


def keep_best_per_component(
    docs: DataFrame,
    components: DataFrame,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """The dedup END-STEP: collapse each near-dup cluster to its best
    member.  ``components`` is :func:`connected_components` output
    (docs absent from it — never in any candidate pair — are their own
    singleton cluster).  Per cluster the member with the highest
    ``score_col`` survives (ties broken by lowest id — deterministic).

    Returns one row per document: ``(doc_id, component_id, n_members,
    keep)`` — the decision table a curation pipeline joins back to the
    corpus to drop losers while keeping full audit lineage.

    Scale: one hash join on the id (component membership is a tiny
    projection of the pair graph, but NOT broadcastable at corpus scale
    — near-dup clusters can cover a large corpus fraction), one
    map-side-combinable per-component aggregation picking the winner
    (``min_by`` over a ``(-score, id)`` struct — a declarative aggregate
    with partial aggregation, so a giant template cluster combines
    map-side instead of sorting in one task the way a
    ``row_number()`` window would; AQE skew mitigation applies to the
    join back, which windows never get), and one equi-join of the
    two-column winner table back onto the membership rows.
    """
    comp = components.select(
        F.col(id_col).alias("__cid_key"), "component_id"
    )
    joined = docs.join(
        comp, docs[id_col] == F.col("__cid_key"), "left"
    ).drop("__cid_key")
    joined = joined.withColumn(
        "component_id", F.coalesce("component_id", F.col(id_col))
    )
    # the membership join feeds BOTH the winner aggregation and the
    # final join-back below — without a barrier the whole corpus-side
    # join subtree (scan + two exchanges + sort-merge) executes twice
    # (r16; guide §5: materialize a reused intermediate).  Checkpoint
    # only the three columns the consumers need; the downstream
    # exchanges are deliberately kept so the aggregation still
    # combines map-side and the join-back keeps AQE skew handling.
    # Trade-off (r16 ADVICE, accepted): localCheckpoint makes this
    # call EAGER (it executes the membership join now, not at the
    # caller's action) and pins the 3-column projection in executor
    # storage with truncated lineage — an executor loss before both
    # consumers finish fails the job instead of recomputing.  On a
    # decommission-prone cluster swap to persist(DISK_ONLY) + a
    # caller-side unpersist; here the 2× subtree execution costs more
    # than the re-run risk of a two-consumer window.
    joined = joined.select(
        id_col, "component_id", score_col
    ).localCheckpoint(eager=True)
    # winner per cluster: highest score, ties to lowest id == the
    # minimum of the (-score, id) struct; NULL scores lose to any real
    # score (desc-NULLS-LAST semantics) via the -inf sentinel
    neg_score = -F.coalesce(
        F.col(score_col).cast("double"), F.lit(float("-inf"))
    )
    winners = joined.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min_by(
            F.col(id_col), F.struct(neg_score.alias("s"), F.col(id_col))
        ).alias("__winner"),
    )
    return (
        joined.select(id_col, "component_id")
        .join(winners, "component_id")
        .select(
            id_col,
            "component_id",
            "n_members",
            (F.col(id_col) == F.col("__winner")).alias("keep"),
        )
    )
