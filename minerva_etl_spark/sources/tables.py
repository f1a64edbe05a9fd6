"""Parquet table loader for the driver fixtures (and any ns-timestamp
parquet).

The fixture parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
Spark's vectorized reader rejects outright.  We read them via the
``nanosAsLong`` legacy conf and floor-convert to microseconds — exactly
what DuckDB does when casting TIMESTAMP_NS to its native microsecond
timestamps, so both engines see identical values.

All timestamps surface as ``timestamp_ntz`` (naive/UTC), which makes
results independent of the session timezone of whoever calls us.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: fixture columns stored as TIMESTAMP(NANOS) in parquet
NS_TIMESTAMP_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; ns-timestamps come back as timestamp_ntz
    floored to microseconds (DuckDB-identical)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in NS_TIMESTAMP_COLS.get(name, []):
        if dtypes.get(col) == "bigint":
            df = df.withColumn(
                col,
                F.expr(f"cast(timestamp_micros({col} div 1000) as timestamp_ntz)"),
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
