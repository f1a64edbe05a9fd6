"""As-of join and sessionization — time-series operators Spark lacks
natively (pyspark guide "Common OLAP patterns"); both built as
single-shuffle window compositions, no range explosion, no
``merge_asof`` driver fallback.

As-of join (backward): for each left row, the latest right row of the
same key with ``right_ts <= left_ts``.

Plan: tag both sides, union by key+time, one window sorted by
(ts, tag) per key carrying last-seen right values forward
(``last(..., ignorenulls)`` over unbounded-preceding), keep left rows.
One shuffle on the key — the same cost as a plain equi-join, regardless
of time-range density (the naive range-join alternative explodes).

Sessionization: gap-based session ids per key —
``lag`` + cumulative sum of gap-breaks over one key-ordered window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join; right ``value_cols`` are appended to left
    rows (null when no prior right row, or outside ``tolerance``)."""
    lcols = left.columns
    l = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in value_cols],
    ).withColumn("__tag", F.lit(0))
    # union by name with nulls for the other side's columns
    l_full = l.select(
        *[F.col(c) for c in lcols],
        "__tag",
        "__ts",
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    r_full = r.select(
        *[
            F.col(c) if c == on else F.lit(None).cast(dict(l.dtypes).get(c, "string")).alias(c)
            for c in lcols
        ],
        "__tag",
        "__ts",
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_full.unionByName(r_full)
    # right rows sort before left rows at equal timestamps (tag 0 < 1),
    # so an exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
        for c in value_cols
    ]
    carried_ts = F.last(
        F.when(F.col("__tag") == 0, F.col("__ts")), ignorenulls=True
    ).over(w).alias("__c_ts")
    out = unioned.select("*", *carried, carried_ts).filter(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        within = (
            F.unix_seconds(F.col("__ts").cast("timestamp"))
            - F.unix_seconds(F.col("__c_ts").cast("timestamp"))
        ) <= tolerance_seconds
        sel = [
            F.when(within, F.col(f"__c_{c}")).alias(c) for c in value_cols
        ]
    else:
        sel = [F.col(f"__c_{c}").alias(c) for c in value_cols]
    return out.select(*[F.col(c) for c in lcols], *sel)


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the key's previous event exceeds ``gap_seconds``.  Adds
    ``session_id`` (1-based per key) — one shuffle on the key."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | (
            F.unix_seconds(F.col(ts_col).cast("timestamp"))
            - F.unix_seconds(prev.cast("timestamp"))
            > gap_seconds
        )
    ).cast("int")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("bigint"),
    )
