"""Temperature-based source mixing for training-data curation.

The standard multilingual/multi-source rebalancing rule (cf. the
sampling schemes described publicly for XLM-R / mT5 / LLaMA data
mixtures): given per-source document shares ``p_s``, resample to the
tempered distribution ``q_s ∝ p_s^alpha`` (``alpha < 1`` upweights rare
sources, ``alpha = 1`` keeps the natural mix).  With a total budget of
``B`` documents, source ``s`` receives ``B * q_s`` slots, i.e. each of
its ``n_s`` docs is kept/repeated ``rate_s = B * q_s / n_s`` times in
expectation.

Determinism: fractional parts resolve per-document via an
md5-derived bucket (engine-independent, stable under reruns and
repartitioning — same device as the stratified sampler), so the output
is a pure function of (corpus, alpha, budget): no RNG, no plan
dependence.  Rate arithmetic runs in DECIMAL so the cross-source
normalization sum is exact and order-independent — float summation
order would otherwise make Spark and a SQL oracle disagree at keep
boundaries.

Scale: one map-side-combinable groupBy over the source column (the
source dimension is tiny), the per-source rate table broadcast back,
and a per-row hash comparison — no extra shuffle on the corpus.
Upsampling explodes ``n_copies`` (bounded by ``ceil(max rate)``).

This has no reference-engine counterpart (Minerva is a telemetry
engine); it extends the LLM-pipeline operator family
(SURVEY §2 "beyond the reference" charter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: bucket resolution for the fractional-part draw
_BUCKETS = 1_000_000


def _doc_bucket(id_col: str) -> F.Column:
    """md5-derived bucket in [0, 1e6), reproducible in any engine."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(_BUCKETS),
    )


def source_mix_rates(
    docs: DataFrame,
    alpha: float = 0.5,
    budget: int | None = None,
    source_col: str = "source",
) -> DataFrame:
    """Per-source resampling rates for the tempered mix.

    Returns one row per source: ``(source, n_docs, rate)`` where
    ``rate = budget * n_docs^alpha / sum_t(n_t^alpha) / n_docs``,
    computed in DECIMAL(38,12) and rounded half-up to 6 places.
    ``budget`` defaults to the corpus size (pure remix).
    """
    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))).cast(
        "decimal(38,12)"
    )
    counts = counts.withColumn("__w", w)
    total = counts.agg(
        F.sum("__w").alias("__wsum"), F.sum("n_docs").alias("__n")
    )
    b = (
        F.lit(int(budget)).cast("decimal(38,12)")
        if budget is not None
        else F.col("__n").cast("decimal(38,12)")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "rate",
            F.round(
                b * F.col("__w") / F.col("__wsum")
                / F.col("n_docs").cast("decimal(38,12)"),
                6,
            ).cast("decimal(38,6)"),
        )
        .select("source", "n_docs", "rate")
    )


def with_mix_copies(
    docs: DataFrame,
    alpha: float = 0.5,
    budget: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach ``n_copies`` to every document: ``floor(rate)`` plus one
    more iff the doc's md5 bucket falls below the fractional part of its
    source's rate.  Expected output size per source = ``n_s * rate_s``
    exactly; realized size is deterministic."""
    rates = source_mix_rates(docs, alpha, budget, source_col)
    frac_buckets = F.floor(
        (F.col("rate") - F.floor(F.col("rate")).cast("decimal(38,6)"))
        * F.lit(_BUCKETS)
    ).cast("bigint")
    rates = rates.select(
        "source",
        F.floor("rate").cast("bigint").alias("__base"),
        frac_buckets.alias("__frac_buckets"),
        "rate",
    )
    return (
        docs.join(
            F.broadcast(rates),
            docs[source_col] == rates["source"],
        )
        .drop(rates["source"])
        .withColumn(
            "n_copies",
            F.col("__base")
            + (_doc_bucket(id_col) < F.col("__frac_buckets")).cast("bigint"),
        )
        .drop("__base", "__frac_buckets")
    )


def resample_by_source(
    docs: DataFrame,
    alpha: float = 0.5,
    budget: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The materialized remix: one output row per copy, with a
    ``copy`` index (0-based) so downstream shuffling/sharding can
    distinguish repeats.  Docs with ``n_copies = 0`` drop out."""
    with_copies = with_mix_copies(docs, alpha, budget, source_col, id_col)
    return (
        with_copies.filter(F.col("n_copies") > 0)
        .withColumn(
            "copy",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)),
        )
        .drop("n_copies", "rate")
    )


def select_token_budget(
    docs: DataFrame,
    budgets: "dict[str, int] | int",
    token_col: str = "n_tokens",
    priority_col: str | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy per-source token-budget selection: within each source,
    take docs in priority order until the source's token budget is
    exhausted (a doc is kept iff its own tokens still FIT — the
    running total INCLUDING the doc stays within budget).  This is
    the mixture-construction primitive when the training budget is
    fixed in TOKENS, not documents: pair it with
    :func:`source_mix_rates` to derive per-source budgets from a
    tempered distribution.

    ``budgets`` is either one int (same budget per source) or a
    per-source dict (sources absent from the dict are dropped).
    Priority defaults to the engine's md5 doc draw (a uniform
    shuffle, so the selection is an exact-budget random sample);
    pass ``priority_col`` to rank by quality instead.  Ties and
    reruns are deterministic: the order is (priority DESC, id ASC).

    Scale shape: ONE running-sum window per source partition with a
    streaming frame (rows unbounded preceding — rank/sum windows
    with this frame never materialize the partition, the
    `robots.py::schedule_fetches` posture); the budget table is a
    broadcast join.  Returns the kept rows plus ``cum_tokens``.
    """
    from pyspark.sql import Window

    if isinstance(budgets, int):
        budget_col = F.lit(budgets)
        joined = docs
    else:
        spark = docs.sparkSession
        btab = spark.createDataFrame(
            list(budgets.items()), f"{source_col} string, __budget long"
        )
        joined = docs.join(F.broadcast(btab), source_col)
        budget_col = F.col("__budget")
    prio = (
        F.col(priority_col)
        if priority_col is not None
        else _doc_bucket(id_col)
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(prio.desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        joined.withColumn(
            "cum_tokens", F.sum(F.col(token_col).cast("long")).over(w)
        )
        .filter(F.col("cum_tokens") <= budget_col)
    )
    return out.drop("__budget") if not isinstance(budgets, int) else out


def select_token_budget_oracle_sql(
    table: str,
    budgets: "dict[str, int] | int",
    token_col: str = "n_tokens",
    priority_col: str | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    select_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`select_token_budget` (same md5 draw,
    same streaming-frame running sum)."""
    prio = (
        priority_col
        if priority_col is not None
        else (
            f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))"
            f" AS BIGINT) % {_BUCKETS}"
        )
    )
    if isinstance(budgets, int):
        budget = str(budgets)
        src = table
    else:
        vals = ", ".join(
            f"('{s}', {b})" for s, b in sorted(budgets.items())
        )
        src = (
            f"(SELECT t.*, b.__budget FROM {table} t JOIN (VALUES {vals})"
            f" AS b({source_col}, __budget) USING ({source_col}))"
        )
        budget = "__budget"
    # The window sum MUST be cast back to BIGINT: DuckDB's SUM(BIGINT)
    # yields HUGEINT, whose pandas conversion is engine-version
    # dependent (float64 on 1.0, object ints elsewhere) — the r11
    # driver-red on this row was exactly that float64 leaking into the
    # canonicalized CSV as "301.0" vs Spark's "301".
    return f"""
SELECT {select_cols}, cum_tokens FROM (
  SELECT t.*, CAST(sum(CAST({token_col} AS BIGINT)) OVER (
      PARTITION BY {source_col}
      ORDER BY ({prio}) DESC, {id_col} ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM {src} t
) WHERE cum_tokens <= {budget}
"""


def curated_export(
    docs: DataFrame,
    alpha: float = 0.5,
    budget: int | None = None,
    shard_tokens: int = 100_000,
    shuffle_seed: int = 0,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full curated-export pipeline in one call:
    **mix → shuffle → pack**.

    1. :func:`resample_by_source` tempers the source mix (docs with
       ``n_copies = 0`` drop; upsampled docs appear once per copy);
    2. every (doc, copy) unit gets a stable ``unit_id``
       (``"<id>#<copy>"``) so repeats are distinct units;
    3. ``assign_token_shards(shuffle_seed=...)`` packs units into
       fixed-token-budget shards in the md5(seed:unit_id) permutation
       order — copies of one doc scatter across shards.

    Output: ``(doc_id, copy, n_tokens, shard_id)``.  Deterministic end
    to end (pure function of corpus + parameters); composes the same
    three shuffles the stages cost individually — nothing extra.
    """
    from minerva_etl_spark.operators.shard import assign_token_shards

    units = resample_by_source(
        docs, alpha, budget, source_col, id_col
    ).withColumn(
        "unit_id",
        F.concat(
            F.col(id_col).cast("string"), F.lit("#"),
            F.col("copy").cast("string"),
        ),
    )
    # (doc_id, copy) ride the prefix-sum's range shuffle as carry
    # columns: the pre-r16 shape re-ran the whole resample chain a
    # second time and shuffle-joined it back on the unit_id string —
    # one extra corpus pass plus one extra exchange for two small
    # columns the pack pass already held (guide §2.4)
    assigned = assign_token_shards(
        units, shard_tokens, id_col="unit_id", text_col=text_col,
        shuffle_seed=shuffle_seed, carry_cols=[id_col, "copy"],
    )
    return assigned.select(id_col, "copy", "n_tokens", "shard_id")


def curated_export_oracle_sql(
    table: str,
    alpha: float = 0.5,
    budget: int | None = None,
    shard_tokens: int = 100_000,
    shuffle_seed: int = 0,
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`curated_export`: mixing CTE → copy
    expansion via generate_series → global token window over the same
    md5 permutation."""
    from minerva_etl_spark.operators.text import tokens_duck_sql

    copies = mix_copies_oracle_sql(table, alpha, budget, source_col)
    toks = tokens_duck_sql("text")
    ordkey = (
        "CAST(('0x' || substr(md5("
        f"'{int(shuffle_seed)}:' || unit_id), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH copies AS (
{copies}
),
units AS (
  SELECT c.doc_id, u.copy,
         CAST(c.doc_id AS VARCHAR) || '#' || CAST(u.copy AS VARCHAR)
             AS unit_id,
         CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM copies c
  JOIN {table} d ON d.doc_id = c.doc_id
  CROSS JOIN UNNEST(generate_series(0, c.n_copies - 1)) AS u(copy)
),
w AS (
  SELECT doc_id, copy, n_tokens,
         SUM(n_tokens) OVER (ORDER BY {ordkey}, unit_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM units
)
SELECT doc_id, copy, n_tokens,
       CAST((cum - n_tokens) // {int(shard_tokens)} AS BIGINT) AS shard_id
FROM w
"""


def mix_rates_oracle_sql(
    table: str, alpha: float = 0.5, budget: int | None = None,
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`source_mix_rates` (same DECIMAL pipeline)."""
    b = (
        f"CAST({int(budget)} AS DECIMAL(38,12))"
        if budget is not None
        else "CAST(n_total AS DECIMAL(38,12))"
    )
    return f"""
SELECT source, n_docs,
       CAST(round({b} * w / wsum / CAST(n_docs AS DECIMAL(38,12)), 6)
            AS DECIMAL(38,6)) AS rate
FROM (
  SELECT source, n_docs,
         CAST(pow(CAST(n_docs AS DOUBLE), {float(alpha)!r})
              AS DECIMAL(38,12)) AS w
  FROM (SELECT {source_col} AS source, count(*) AS n_docs
        FROM {table} GROUP BY {source_col})
) counts
CROSS JOIN (
  SELECT CAST(sum(w) AS DECIMAL(38,12)) AS wsum, sum(n_docs) AS n_total
  FROM (
    SELECT CAST(pow(CAST(count(*) AS DOUBLE), {float(alpha)!r})
                AS DECIMAL(38,12)) AS w, count(*) AS n_docs
    FROM {table} GROUP BY {source_col}
  )
) totals
"""


def mix_copies_oracle_sql(
    table: str, alpha: float = 0.5, budget: int | None = None,
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`with_mix_copies` (doc_id, source,
    n_copies)."""
    rates = mix_rates_oracle_sql(table, alpha, budget, source_col)
    bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {_BUCKETS}"
    )
    return f"""
WITH rates AS (
{rates}
)
SELECT d.doc_id, d.{source_col} AS source,
       CAST(floor(r.rate) AS BIGINT)
       + CASE WHEN {bucket} <
              CAST(floor((r.rate - CAST(floor(r.rate) AS DECIMAL(38,6)))
                         * {_BUCKETS}) AS BIGINT)
              THEN 1 ELSE 0 END AS n_copies
FROM {table} d JOIN rates r ON d.{source_col} = r.source
"""


# ---------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis & Spirakis 2006)
# ---------------------------------------------------------------------

def weighted_sample(
    docs: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly-``n`` weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis A-Res scheme (r12): every row draws
    ``u ∈ (0, 1]`` from the engine-wide md5 ticket (seeded, so
    independent samples coexist) and the ``n`` largest
    ``u^(1/w)`` keys win — equivalently the n largest
    ``ln(u) / w``, which is what's computed (no pow): rounded to 6 dp
    BEFORE ranking with the id tie-break, the `cosine_expr`
    discipline, so both engines pick the identical sample.  Inclusion
    probability is proportional to weight in the without-replacement
    sense of the published scheme.  Rows with ``weight <= 0`` or NULL
    are excluded (never sampled).

    Scale shape: one codegen projection for the keys, then
    `skew.cap_per_key`'s two-level salted top-n under a constant
    group — no global sort, no collect.  This is the per-ITEM
    companion to `source_mix_rates`' per-SOURCE tempering: quality
    scores (`text.py`), perplexities (`lm.py`) or classifier margins
    (`logreg.py`) plug in as weights directly."""
    from minerva_etl_spark.operators.skew import cap_per_key

    u = (
        f"(CAST(conv(substring(md5(concat('{int(seed)}', ':', "
        f"CAST({id_col} AS STRING))), 1, 15), 16, 10) AS DOUBLE) "
        f"+ 1.0d) / 1152921504606846976.0d"
    )
    keyed = docs.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn(
        "skey",
        F.expr(
            f"round(ln({u}) / CAST({weight_col} AS DOUBLE), 6)"
        ),
    )
    return cap_per_key(
        keyed.withColumn("__g", F.lit(0)),
        keys=["__g"],
        order_by=[F.col("skey").desc(), F.col(id_col).asc()],
        n=int(n),
        salt_col=id_col,
    ).drop("__g", "rank")


def weighted_sample_oracle_sql(
    table: str,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    select_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`weighted_sample` (identical key
    expression and tie-break)."""
    u = (
        f"(CAST(('0x' || substring(md5('{int(seed)}' || ':' || "
        f"CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) "
        f"+ 1.0) / 1152921504606846976.0"
    )
    return f"""
SELECT {select_cols},
       round(ln({u}) / CAST({weight_col} AS DOUBLE), 6) AS skey
FROM {table}
WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
ORDER BY skey DESC, {id_col} ASC
LIMIT {int(n)}
"""
