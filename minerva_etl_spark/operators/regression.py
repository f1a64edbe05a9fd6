"""Per-entity linear-regression materializations (X2).

The reference registers arbitrary plpgsql functions as materializations
(`/root/reference/src/minerva/storage/trend/materialization.py:62-101`);
a per-entity OLS fit is the canonical non-SQL example.  Two Spark
implementations with identical results:

- :func:`trend_slope` — **the production path**: Spark's native
  ``regr_slope``/``regr_against`` aggregates (JVM-side, whole-stage
  codegen, map-side partial aggregation — one shuffle of 6 numbers per
  group, no Python in the loop).  This is what gate/bench run.
- :func:`trend_slope_pandas` — the X2 *mechanism demo*: the same fit as
  an ``applyInPandas`` grouped-map (Arrow batches), standing in for
  materialization functions whose math genuinely cannot be expressed
  with built-in aggregates.  Kept under pytest only; ~10× slower than
  the native aggregate and shuffles full rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TREND_SLOPE_SCHEMA = (
    "user_id bigint, n bigint, slope_per_hour double, intercept double"
)

#: independent variable: epoch hours, as a SQL fragment (µs / 3.6e9)
_X_HOURS = "unix_micros(cast(ts as timestamp)) / 3.6e9"


def trend_slope(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Least-squares value-vs-time slope per entity via the native
    ``regr_*`` aggregates.  Rounded to 6 dp for cross-engine parity
    (DuckDB's ``regr_slope`` uses the same covariance formulation)."""
    x = _X_HOURS.replace("ts", f"`{ts_col}`") if ts_col != "ts" else _X_HOURS
    return events.groupBy(F.col(entity_col).alias("user_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.expr(f"regr_slope(`{value_col}`, {x})"), 6).alias(
            "slope_per_hour"
        ),
        F.round(F.expr(f"regr_intercept(`{value_col}`, {x})"), 6).alias(
            "intercept"
        ),
    )


def trend_slope_pandas(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The same fit as an applyInPandas grouped-map — the X2 escape
    hatch for materialization functions with no built-in equivalent."""
    import pandas as pd

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # pin the epoch unit: Arrow may hand us datetime64[ns] or [us]
        x = pdf[ts_col].astype("datetime64[ns]").astype("int64") / 3.6e12
        y = pdf[value_col]
        n = len(pdf)
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        slope = ((x - mx) * (y - my)).sum() / sxx if sxx else float("nan")
        return pd.DataFrame(
            {
                "user_id": [pdf[entity_col].iloc[0]],
                "n": [n],
                "slope_per_hour": [round(slope, 6)],
                "intercept": [round(my - slope * mx, 6)],
            }
        )

    return (
        events.select(entity_col, ts_col, value_col)
        .groupBy(entity_col)
        .applyInPandas(fit, schema=TREND_SLOPE_SCHEMA)
    )
