"""Key-based upsert / merge primitives.  The merge itself is pure
DataFrame ops; :func:`upsert_table` is the substrate-dispatching sink —
a transactional Delta ``MERGE INTO`` when delta-spark is importable
(removing the single-writer-per-bucket constraint on object stores),
parquet temp-path write-and-swap otherwise.

Reference semantics reproduced:

- **Upsert** (`trendstorepart.py:180-199,240-268,418-437`): ``INSERT ...
  ON CONFLICT (entity_id, timestamp) DO UPDATE SET <non-key cols> =
  excluded.*`` — last write wins per key; on update, ``modified =
  greatest(old.modified, new.modified)`` (`:282-287`).
- **Left-anti insert** (`trendstorepart.py:298-340`,
  `virtual_entity.py:48-53`): insert only rows whose key is absent.
- **Package merge** (`datapackage.py:223-258`): outer union of batches
  keyed ``(entity, timestamp)``, later batches filling nulls of earlier
  ones column-by-column.

Scale notes: upsert is one shuffle on the key columns (window dedup);
when the existing side is a partitioned table, callers should restrict
``existing`` to the affected partitions first (see
``store/trendstore.py``) so the shuffle is bounded by the touched
buckets, not the table size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    greatest_cols: list[str] | None = None,
) -> DataFrame:
    """Last-write-wins merge of ``incoming`` over ``existing`` by ``keys``.

    ``greatest_cols``: columns where the merged row keeps
    ``greatest(old, new)`` instead of the new value (reference W3:
    ``modified = greatest(...)``).
    """
    ex = existing.select(*incoming.columns)
    tagged = ex.withColumn("__prio", F.lit(0)).unionByName(
        incoming.withColumn("__prio", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__prio").desc())
    out = tagged.withColumn("__rn", F.row_number().over(w))
    if greatest_cols:
        wmax = Window.partitionBy(*keys)
        for c in greatest_cols:
            out = out.withColumn(c, F.max(c).over(wmax))
    return out.filter(F.col("__rn") == 1).drop("__prio", "__rn")


def dedup_last_wins(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep, per key, the row with the greatest ``order_col`` (the
    single-batch form of upsert: re-loads within one package).
    ``tiebreak_cols`` make the pick deterministic under equal order."""
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def insert_missing(
    existing: DataFrame, incoming: DataFrame, keys: list[str]
) -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing``
    (left-anti join; reference J3/J9)."""
    return incoming.join(existing.select(*keys).distinct(), keys, "left_anti")


def _delta_available(spark) -> bool:
    """True iff delta-spark is importable AND the session's JVM carries
    the Delta SQL extension (both are needed for MERGE INTO)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    try:
        spark._jvm.io.delta.tables.DeltaTable  # noqa: B018
        return True
    except Exception:
        return False


def upsert_table(
    spark,
    target_path: str,
    incoming: DataFrame,
    keys: list[str],
    order_col: str,
    greatest_cols: list[str] | None = None,
    substrate: str | None = None,
) -> None:
    """Substrate-dispatching upsert SINK: same API and identical
    last-write-wins + ``greatest()`` semantics over two storage
    substrates.

    - ``delta`` (used automatically when delta-spark is importable, or
      forced with ``substrate='delta'``): a transactional ``MERGE
      INTO`` — concurrent writers are serialized by the Delta log, so
      the single-writer-per-bucket constraint of the parquet path
      disappears on object stores.
    - ``parquet`` (the fallback; always available): read-merge via
      :func:`upsert` + temp-path write-and-swap
      (`fsutil.swap_directory_write` — the documented swap point, see
      module docstring and SCALE.md).

    ``incoming`` is first collapsed to one row per key by
    ``order_col`` (Delta MERGE requires unique source keys; the
    parquet path gets the same collapse so both substrates see the
    identical source).  Reference semantics: ``INSERT ... ON CONFLICT
    DO UPDATE`` with ``modified = greatest(...)``
    (`trendstorepart.py:180-199,282-287`).
    """
    import os

    if substrate is None:
        substrate = "delta" if _delta_available(spark) else "parquet"
    src = dedup_last_wins(incoming, keys, order_col)

    if substrate == "delta":
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(spark, target_path):
            src.write.format("delta").mode("overwrite").save(target_path)
            return
        tgt = DeltaTable.forPath(spark, target_path)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        updates = {}
        for c in src.columns:
            if c in keys:
                continue
            if greatest_cols and c in greatest_cols:
                updates[c] = F.expr(f"greatest(t.{c}, s.{c})")
            else:
                updates[c] = F.col(f"s.{c}")
        (
            tgt.alias("t")
            .merge(src.alias("s"), cond)
            .whenMatchedUpdate(set=updates)
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    from minerva_etl_spark.fsutil import swap_directory_write

    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
        # no checkpoint needed: swap_directory_write materializes the
        # merge into the sibling tmp dir BEFORE deleting the files it
        # reads, so the frame streams through at any table size
        merged = upsert(existing, src, keys, greatest_cols=greatest_cols)
    else:
        merged = src
    swap_directory_write(
        spark,
        lambda tmp: merged.write.mode("overwrite").parquet(tmp),
        target_path,
    )


def merge_packages(
    packages: list[DataFrame],
    keys: list[str],
) -> DataFrame:
    """Grouped outer union: union by name with missing columns allowed,
    then collapse per key taking the first non-null value per metric
    (reference `datapackage.py:223-258` — packages for the same
    (entity_type, granularity) merge into one wide row set)."""
    unioned = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), packages
    )
    metric_cols = [c for c in unioned.columns if c not in keys]
    return unioned.groupBy(*keys).agg(
        *[F.first(c, ignorenulls=True).alias(c) for c in metric_cols]
    )
