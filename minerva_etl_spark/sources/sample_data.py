"""Sample-data generator (S11).

Reference (`/root/reference/src/minerva/commands/
generate_sample_data.py:61-110`): per-dataset pluggable generators that
produce a CSV for a truncated timestamp — used to seed demo instances.

Spark-native: ``spark.range`` cross products + deterministic
expressions (seeded ``rand``), written as CSV or handed back as a
frame.  Entirely distributed — generating a 1e9-row seed dataset is one
job, no driver loops.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.catalog.granularity import Granularity


def generate_trend_sample(
    spark: SparkSession,
    entity_type: str,
    n_entities: int,
    granularity: str | Granularity,
    start: datetime,
    periods: int,
    metrics: dict[str, tuple[float, float]],
    seed: int = 42,
) -> DataFrame:
    """(entity_ref, timestamp, <metrics...>) for n_entities × periods.

    ``metrics``: name -> (lo, hi) uniform range; values are
    deterministic for a given seed.
    """
    gran = Granularity.parse(granularity)
    entities = spark.range(n_entities).select(
        F.concat(F.lit(f"{entity_type}-"), F.format_string("%04d", "id")).alias(
            "entity_ref"
        )
    )
    steps = spark.range(periods).select(F.col("id").alias("step"))
    grid = entities.crossJoin(steps)
    if gran.months:
        ts = F.expr(
            f"cast(add_months(timestamp'{start}', step * {gran.months}) as timestamp_ntz)"
        )
    else:
        ts = F.expr(
            f"cast(timestamp'{start}' + make_interval(0, 0, 0, 0, 0, 0, step * {gran.seconds}) as timestamp_ntz)"
        )
    out = grid.select("entity_ref", ts.alias("timestamp"), "step")
    for name, (lo, hi) in metrics.items():
        # md5-derived uniform, NOT F.rand(seed): rand() is seeded per
        # partition, so its output changes under repartitioning/AQE —
        # useless for idempotent loads.  The hash value is a pure
        # function of (seed, entity, timestamp, metric): identical on
        # every executor layout and reproducible in any engine.
        out = out.withColumn(name, _metric_col(name, lo, hi, seed))
    return out.drop("step")


def _metric_col(name: str, lo: float, hi: float, seed: int) -> F.Column:
    key = F.concat_ws(
        "|",
        F.lit(str(seed)), F.col("entity_ref"),
        F.col("timestamp").cast("string"), F.lit(name),
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    uniform = (h % F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0)
    return F.lit(float(lo)) + uniform * F.lit(float(hi) - float(lo))


def metric_ansi_sql(
    name: str,
    lo: float,
    hi: float,
    seed: int,
    entity_expr: str = "entity_ref",
    ts_expr: str = "timestamp",
) -> str:
    """DuckDB twin of the generated metric expression (the generator is
    oracle-checkable because it is hash-based)."""
    key = (
        f"'{seed}' || '|' || {entity_expr} || '|' || "
        f"CAST({ts_expr} AS VARCHAR) || '|' || '{name}'"
    )
    h = f"CAST(('0x' || substr(md5({key}), 1, 8)) AS BIGINT)"
    return (
        f"({float(lo)} + CAST(({h}) % 1000000 AS DOUBLE) / 1000000.0"
        f" * ({float(hi)} - {float(lo)}))"
    )


def write_sample_csv(df: DataFrame, path: str) -> None:
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
