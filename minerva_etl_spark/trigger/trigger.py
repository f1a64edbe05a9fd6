"""Triggers: threshold rules over KPI queries producing notifications.

Reference (`/root/reference/src/minerva/trigger/trigger.py:11-131,
157-386`, example `examples/tiny_instance/trigger/
node-15m-highpowerusage.yaml`):

- a trigger has a **KPI query** (SETOF function of a timestamp), a set
  of named **thresholds**, a boolean **condition** over KPI values vs
  thresholds, plus ``weight``, ``notification_message`` and
  ``notification_data`` expressions;
- ``create_notifications(name, ts)`` evaluates the KPI frame for that
  timestamp, filters by the condition, and appends one notification row
  per firing entity.

Spark: the KPI query is a DataFrame builder, thresholds a broadcast
one-row frame (cross join — exactly the reference's
``FROM kpi, thresholds`` shape), condition/message/weight/data are SQL
expressions evaluated by Catalyst.  ``foreachBatch`` wraps the same
evaluation for streaming (T5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Trigger:
    name: str
    #: kpi(spark, timestamps) -> DataFrame(entity_id, timestamp, <kpi cols...>)
    kpi: Callable[[SparkSession, list[datetime]], DataFrame]
    #: threshold name -> value (becomes a broadcast one-row frame)
    thresholds: dict[str, float]
    #: boolean SQL over kpi columns + threshold names
    condition: str
    weight: str = "1"
    notification_message: str = "''"
    notification_data: str | None = None  # SQL producing a JSON string
    fire_value: str | None = None
    #: lifecycle state (reference `trigger.rule.enabled`, tags)
    enabled: bool = True
    tags: list[str] = field(default_factory=list)
    #: cache the all-buckets KPI frame across evaluate() calls — right
    #: for repeated per-timestamp evaluation (live monitor, execute over
    #: a range); leave False when each evaluation should push the
    #: timestamp filter into the source scan instead (huge history)
    cache_kpi: bool = False
    _kpi_df: DataFrame | None = field(
        default=None, init=False, repr=False, compare=False
    )

    def invalidate_kpi_cache(self) -> None:
        if self._kpi_df is not None:
            try:
                self._kpi_df.unpersist()
            except Exception:
                pass
            self._kpi_df = None

    def evaluate(
        self, spark: SparkSession, timestamps: list[datetime]
    ) -> DataFrame:
        """Notification rows for the given bucket timestamps.

        ``timestamps == []`` means *all* buckets; a non-empty list
        restricts the evaluation to exactly those buckets (the
        reference's ``create_notifications(name, ts)`` is
        per-timestamp, `trigger/trigger.py:157-189`) — KPI closures
        need not filter themselves.
        """
        if self.cache_kpi:
            if self._kpi_df is None:
                self._kpi_df = self.kpi(spark, []).cache()
            kpi = self._kpi_df
        else:
            kpi = self.kpi(spark, timestamps)
        if timestamps:
            kpi = kpi.filter(F.col("timestamp").isin(list(timestamps)))
        thresholds = F.broadcast(
            spark.createDataFrame(
                [tuple(self.thresholds.values())],
                ", ".join(f"{k} double" for k in self.thresholds),
            )
        )
        fired = kpi.crossJoin(thresholds).filter(F.expr(self.condition))
        data = (
            F.expr(self.notification_data)
            if self.notification_data
            else F.to_json(F.struct(*[F.col(c) for c in kpi.columns]))
        )
        return fired.select(
            F.col("entity_id"),
            F.col("timestamp"),
            F.lit(self.name).alias("rule"),
            F.expr(self.weight).cast("int").alias("weight"),
            F.expr(self.notification_message).alias("details"),
            data.alias("data"),
        )
