"""Skew-handling aggregation: two-phase salted groupBy.

AQE's skew-join splitting covers joins, but a groupBy on a pathological
key distribution (one entity producing 10% of all rows) still funnels
the hot key's rows through one reducer.  The classic fix: salt the key
into N shards, partially aggregate per (key, salt), then re-aggregate
per key — two small shuffles instead of one hot one.

Only algebraic aggregates decompose this way; the helper supports the
sum/count/min/max family (avg = decimal sum + count, composed by the
caller), which covers every aggregation the trend engine emits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from minerva_etl_spark.operators.aggregation import SUM_DECIMAL


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """``aggs``: out_name -> (agg, column) with agg ∈ {sum, count,
    min, max, sum_decimal}.  Semantics identical to
    ``df.groupBy(keys).agg(...)`` for these aggregates.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )

    partial_cols: list[Column] = []
    final_cols: list[Column] = []
    for out, (agg, col) in aggs.items():
        if agg == "sum":
            partial_cols.append(F.sum(col).alias(out))
            final_cols.append(F.sum(out).alias(out))
        elif agg == "sum_decimal":
            partial_cols.append(F.sum(F.col(col).cast(SUM_DECIMAL)).alias(out))
            final_cols.append(F.sum(out).cast("double").alias(out))
        elif agg == "count":
            partial_cols.append(F.count(col).alias(out))
            final_cols.append(F.sum(out).cast("bigint").alias(out))
        elif agg == "min":
            partial_cols.append(F.min(col).alias(out))
            final_cols.append(F.min(out).alias(out))
        elif agg == "max":
            partial_cols.append(F.max(col).alias(out))
            final_cols.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {agg}")

    partial = salted.groupBy(*keys, "__salt").agg(*partial_cols)
    return partial.groupBy(*keys).agg(*final_cols)


def cap_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    n: int,
    salt_col: str | None = None,
    salt_buckets: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-``n`` rows per key, skew-safe — the curation shape for
    "keep at most N documents per domain/source" caps on crawl data,
    where one domain can hold a large fraction of the corpus.

    The naive formulation (``row_number`` over the key) funnels every
    row of a hot key through ONE task's sort — AQE never splits window
    partitions.  Here the window runs twice: first over ``(key, salt)``
    (the hot key's rows sort in ``salt_buckets`` parallel, spillable
    tasks, each emitting at most ``n`` survivors), then over the key on
    the surviving ≤ ``n × salt_buckets`` candidates — a bounded second
    stage no matter how large the key.  The result is *identical* to
    the single-window formulation whenever ``order_by`` is a total
    order (pass a unique tiebreak column last — this is also what makes
    the output deterministic and oracle-matchable).

    ``salt_col`` names the column hashed into the salt — pass the
    unique tiebreak column (any deterministic per-row value works:
    correctness never depends on the salt, only parallelism does).
    """
    if salt_col is None:
        raise ValueError("cap_per_key requires an explicit salt_col")
    # enforce the total-order precondition instead of assuming it:
    # salt_col is documented unique per row, so appending it as the
    # final tiebreak makes any caller-supplied ordering total (a
    # non-total order would silently yield nondeterministic survivors
    # that can never hash-match an oracle).  For callers that already
    # end with the unique column this is a no-op tiebreak.
    order_by = list(order_by) + [F.col(salt_col).asc()]
    salted = df.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.col(salt_col).cast("string")),
            F.lit(salt_buckets),
        ),
    )
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order_by)
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= n)
        .drop("__salt", "__rn1")
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= n)
    )
