"""Attribute-store semantics: slowly-changing entity attributes.

Reference (`/root/reference/src/minerva/storage/attribute/`):

- ``attribute_history`` keeps every (entity, timestamp) version of the
  attribute row (`attributestore.py:38-66`).
- **compact** collapses *consecutive* history rows with identical
  attribute values — run-length SCD compression keeping only change
  points (`attributestore.py:261-269`).
- **curr-ptr materialization** maintains "the latest row per entity"
  (`commands/attribute_store.py:523-579`).

Both are single-window-shuffle operations in Spark; at 100 TB the window
partitions by entity_id which is the table's natural key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_entity(
    history: DataFrame,
    entity_col: str = "entity_id",
    timestamp_col: str = "timestamp",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W1 / A9: the current attribute row per entity = row_number() == 1
    over (entity) ordered by timestamp desc."""
    order = [F.col(timestamp_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(entity_col).orderBy(*order)
    return (
        history.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compact_history(
    history: DataFrame,
    value_cols: list[str],
    entity_col: str = "entity_id",
    timestamp_col: str = "timestamp",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W2 / A8: keep only change points — a row survives iff any value
    column differs from the previous row of the same entity (null-safe
    comparison), or it is the entity's first row."""
    order = [F.col(timestamp_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    df = history
    changed = F.lit(False)
    for c in value_cols:
        prev = F.lag(F.col(c)).over(w)
        # null-safe inequality: differs if not (a <=> b)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    is_first = F.row_number().over(w) == 1
    return (
        df.withColumn("__keep", is_first | changed)
        .filter(F.col("__keep"))
        .drop("__keep")
    )
