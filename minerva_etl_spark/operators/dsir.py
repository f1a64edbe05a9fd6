"""DSIR-style importance resampling for data selection.

Data Selection with Importance Resampling (Xie et al., 2023): score
every raw document by how much more likely its hashed n-gram features
are under a *target* distribution (a high-quality slice) than under the
*raw* distribution, then sample documents with probability proportional
to that importance weight via Gumbel top-k.

Pipeline shape (the 100 TB posture):

1. unigram+bigram features hash into a FIXED number of buckets
   (``n_buckets``, default 1024) — so the two "distributions" are
   bucket-count vectors, and the per-bucket log-ratio table is
   ``n_buckets`` rows: broadcastable BY CONSTRUCTION no matter how
   large the corpus or vocabulary (this is DSIR's trick, and exactly
   what makes it cheaper than the full LM scoring in
   `operators/lm.py`);
2. per-document bucket counts are one explode + map-side-combinable
   groupBy; the weight is a broadcast join against the ratio table plus
   a per-document re-aggregation;
3. selection = Gumbel top-k: ``key = log_weight + Gumbel(0,1)`` with
   deterministic md5-derived uniforms, then a global top-k
   (TakeOrderedAndProject — no full sort) whose k winners broadcast
   back as a membership flag.

Cross-engine parity: ``ln`` is not exactly rounded, so per-document
sums of bucket contributions fold **in bucket order** on both engines
and the weight/key round to 4 dp before ranking (ties break by doc id),
the same discipline as `operators/lm.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from minerva_etl_spark.operators.text import tokens_duck_sql, tokens_spark_sql

#: md5-derived uniform in (0, 1): 13 hex digits = 52 bits, +0.5 keeps it
#: strictly inside the interval so -ln(-ln(u)) is always finite
_UNIF_SPARK = (
    "((CAST(conv(substring(md5(concat('dsir:', CAST({id} AS STRING))), 1, 13),"
    " 16, 10) AS DOUBLE) + 0.5) / 4503599627370496.0)"
)
_UNIF_DUCK = (
    "((CAST(('0x' || substr(md5('dsir:' || CAST({id} AS VARCHAR)), 1, 13))"
    " AS BIGINT) + 0.5) / 4503599627370496.0)"
)

#: in-row unigram+bigram feature array over the staged ``__toks`` column
#: (bigrams contain a space, so the two feature spaces cannot collide)
_GRAMS_SQL = (
    "concat(__toks, CASE WHEN size(__toks) >= 2 THEN "
    "transform(sequence(1, size(__toks) - 1), "
    "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1))) "
    "ELSE array() END)"
)


def _bucket_counts(
    df: DataFrame, n_buckets: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, bucket, cnt) hashed-feature counts, one explode + groupBy."""
    staged = df.withColumn("__toks", F.expr(tokens_spark_sql(text_col)))
    grams = staged.select(
        F.col(id_col), F.explode(F.expr(_GRAMS_SQL)).alias("__gram")
    )
    bucket = (
        F.conv(F.substring(F.md5("__gram"), 1, 13), 16, 10)
        .cast("bigint") % n_buckets
    )
    return (
        grams.withColumn("bucket", bucket)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_select(
    docs: DataFrame,
    target_filter_sql: str,
    k: int,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """Score every document with a DSIR importance weight against the
    rows matching ``target_filter_sql`` and Gumbel-top-``k`` select.

    Weight: ``log w(doc) = Σ_b cnt_doc[b] · (ln p_t[b] − ln p_r[b])``
    with add-one smoothed bucket probabilities
    ``p[b] = (c[b] + 1) / (total + n_buckets)`` estimated from the
    target slice (``p_t``) and the full corpus (``p_r``).

    Returns ``(id, log_weight, selected)`` for EVERY document;
    feature-less docs carry weight 0.0 and still enter the draw.
    """
    # the per-doc bucket counts (the corpus-scale explode + groupBy)
    # feed BOTH distribution estimates AND the per-doc contribution
    # join — checkpoint once so the n-gram pass runs once, not once
    # per consumer (r16; guide §5: cut the re-executed subtree)
    doc_counts = _bucket_counts(
        docs, n_buckets, id_col, text_col
    ).localCheckpoint(eager=True)
    # the target slice is a subset of the corpus, so both distributions
    # derive from ONE aggregation over the flagged counts: cr sums all
    # rows, ct only the target-gated ones (NULL for a bucket with no
    # target rows — exactly the pre-r16 left-join's missing ct, and the
    # same coalesce downstream)
    flags = docs.select(
        F.col(id_col), F.expr(f"({target_filter_sql})").alias("__t")
    )
    counts = (
        doc_counts.join(flags, id_col)
        .groupBy("bucket")
        .agg(
            F.sum("cnt").alias("cr"),
            F.sum(F.when(F.col("__t"), F.col("cnt"))).alias("ct"),
        )
        .localCheckpoint(eager=True)  # <= n_buckets rows
    )
    totals = counts.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )  # one row
    ratio = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast(
                        "double"
                    )
                    / (F.coalesce(F.col("tt"), F.lit(0)) + F.lit(n_buckets))
                    .cast("double")
                )
                - F.log(
                    (F.col("cr") + F.lit(1)).cast("double")
                    / (F.col("tr") + F.lit(n_buckets)).cast("double")
                )
            ).alias("lr"),
        )
    )
    contrib = doc_counts.join(F.broadcast(ratio), "bucket").select(
        id_col,
        "bucket",
        (F.col("cnt").cast("double") * F.col("lr")).alias("__c"),
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("bucket", "__c"))).alias("__cs")
    )
    fold = "aggregate(__cs, CAST(0.0 AS DOUBLE), (acc, p) -> acc + p.__c)"
    weighted = (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("__cs").isNull(), F.lit(0.0))
            .otherwise(F.round(F.expr(fold), round_dp))
            .alias("log_weight"),
        )
        # two narrow columns per doc, consumed by the winner top-k AND
        # the final membership join — materialized once instead of
        # re-running the contribution join + fold per consumer (r16)
        .localCheckpoint(eager=True)
    )
    unif = F.expr(_UNIF_SPARK.format(id=id_col))
    keyed = weighted.withColumn(
        "__key",
        F.col("log_weight")
        + F.round(-F.log(-F.log(unif)), round_dp),
    )
    winners = (
        keyed.orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col), F.lit(True).alias("__sel"))
    )
    return (
        keyed.join(F.broadcast(winners), id_col, "left")
        .select(
            id_col,
            "log_weight",
            F.coalesce(F.col("__sel"), F.lit(False)).alias("selected"),
        )
    )


def dsir_oracle_sql(
    table: str,
    target_where: str,
    k: int,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of :func:`dsir_select` — same hashing, smoothing,
    bucket-ordered fold, rounding, and Gumbel keys."""
    toks = tokens_duck_sql(text_col)
    unif = _UNIF_DUCK.format(id=f"d.{id_col}")
    return f"""
WITH toks AS (
  SELECT {id_col}, ({target_where}) AS is_target, {toks} AS w FROM {table}
),
grams AS (
  SELECT {id_col}, is_target, gram
  FROM (
    SELECT {id_col}, is_target,
           list_concat(w, CASE WHEN len(w) >= 2 THEN
             list_transform(generate_series(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i + 1])
             ELSE [] END) AS gs
    FROM toks
  ) CROSS JOIN UNNEST(gs) AS u(gram)
),
bucketed AS (
  SELECT {id_col}, is_target,
         CAST(('0x' || substr(md5(gram), 1, 13)) AS BIGINT)
           % {n_buckets} AS bucket
  FROM grams
),
doc_counts AS (
  SELECT {id_col}, bucket, count(*) AS cnt
  FROM bucketed GROUP BY {id_col}, bucket
),
target_counts AS (
  SELECT bucket, count(*) AS ct FROM bucketed WHERE is_target GROUP BY bucket
),
raw_counts AS (
  SELECT bucket, count(*) AS cr FROM bucketed GROUP BY bucket
),
totals AS (
  SELECT (SELECT sum(cr) FROM raw_counts) AS tr,
         (SELECT sum(ct) FROM target_counts) AS tt
),
ratio AS (
  SELECT r.bucket,
         ln(CAST(coalesce(t.ct, 0) + 1 AS DOUBLE)
            / CAST(coalesce(tot.tt, 0) + {n_buckets} AS DOUBLE))
         - ln(CAST(r.cr + 1 AS DOUBLE)
              / CAST(tot.tr + {n_buckets} AS DOUBLE)) AS lr
  FROM raw_counts r
  LEFT JOIN target_counts t USING (bucket)
  CROSS JOIN totals tot
),
per_doc AS (
  SELECT dc.{id_col},
         list(CAST(dc.cnt AS DOUBLE) * ra.lr ORDER BY dc.bucket) AS cs
  FROM doc_counts dc JOIN ratio ra USING (bucket)
  GROUP BY dc.{id_col}
),
weighted AS (
  SELECT d.{id_col},
         CASE WHEN p.cs IS NULL THEN 0.0
              ELSE round(list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE), p.cs),
                     (acc, x) -> acc + x), {round_dp})
         END AS log_weight,
         CASE WHEN p.cs IS NULL THEN 0.0
              ELSE round(list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE), p.cs),
                     (acc, x) -> acc + x), {round_dp})
         END + round(-ln(-ln({unif})), {round_dp}) AS key
  FROM {table} d LEFT JOIN per_doc p USING ({id_col})
),
ranked AS (
  SELECT {id_col}, log_weight,
         row_number() OVER (ORDER BY key DESC, {id_col} ASC) AS rn
  FROM weighted
)
SELECT {id_col}, log_weight, (rn <= {k}) AS selected FROM ranked
"""
