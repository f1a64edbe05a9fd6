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

from pyspark.sql import Column, DataFrame, functions as F

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
