"""Bucketed trend-store layout: shuffle-free part joins and entity-keyed
windows.

The path-based `TrendStore` layout shuffles once per part join (U3) and
per entity-window.  When a catalog is available (any Spark warehouse —
in-memory catalog suffices locally, Hive/Glue on a cluster), writing
parts with ``bucketBy(N, entity_id)`` pre-co-locates each entity's rows:
the multi-part wide read becomes an exchange-free sort-merge join, and
SCD/upsert windows read pre-distributed input.

This module is the catalog-backed variant of the write path — the
100 TB co-location strategy realized, not just documented (SCALE.md).
Verified by ``tests/test_bucketed.py`` asserting zero Exchange nodes in
the join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed_part(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    keys: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist one part bucketed+sorted by the store key.  ``path``
    makes it an external table (explicit location instead of the
    session warehouse).

    NOTE: Spark eliminates the join exchange only when the bucket
    columns equal the join keys (`requireAllClusterKeysForCoPartition`),
    so parts bucket on the full (entity_id, timestamp) primary key.
    """
    keys = keys or ["entity_id", "timestamp"]
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_parts_joined(
    spark: SparkSession,
    table_names: list[str],
    keys: list[str] | None = None,
    join_type: str = "full_outer",
) -> DataFrame:
    """U3 multi-part wide read over bucketed tables.

    With matching bucket counts Catalyst plans an exchange-free
    sort-merge join (broadcast is suppressed for the join so bucketing
    is actually exercised; at real scale the sides exceed the broadcast
    threshold anyway).
    """
    keys = keys or ["entity_id", "timestamp"]
    out: DataFrame | None = None
    for name in table_names:
        df = spark.table(name)
        if out is None:
            out = df
        else:
            out = out.hint("merge").join(df, keys, join_type)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Plan-inspection helper: number of Exchange (shuffle/broadcast)
    nodes in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
