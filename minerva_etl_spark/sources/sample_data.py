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
    for i, (name, (lo, hi)) in enumerate(metrics.items()):
        out = out.withColumn(
            name, F.round(F.rand(seed + i) * (hi - lo) + lo, 3)
        )
    return out.drop("step")


def write_sample_csv(df: DataFrame, path: str) -> None:
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
