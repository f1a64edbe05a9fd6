"""Notification store: append-only typed event tables.

Reference (`/root/reference/src/minerva/storage/notification/
notificationstore.py:17-97` + `attribute.py`): one append-only table per
data source with DECLARED attribute columns — each attribute has a name
and a data type (incl. ``json`` trigger payloads, see
`examples/tiny_instance/notification/trigger-notification.yaml`).  The
Spark sink is a parquet append partitioned by day — the natural shape
for both batch trigger output and a streaming ``foreachBatch``.

``store()`` enforces the declared schema on every append: attributes
are cast to their declared Spark types (``json`` payloads are
canonicalized with ``to_json`` when handed a map/struct/array column),
missing attribute columns raise, and undeclared extra columns are
dropped — so schema drift across appends is impossible rather than
merely unnoticed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class NotificationAttribute:
    """Declared attribute (reference ``Attribute``:
    `storage/notification/attribute.py`): PG-style type name from
    `catalog.datatypes.REGISTRY`, plus ``json`` for trigger payloads
    (stored as a canonical JSON string column)."""

    name: str
    data_type: str | None = None  # None = legacy untyped (pass-through)
    description: str | None = None

    @classmethod
    def of(cls, a: "NotificationAttribute | dict | str") -> "NotificationAttribute":
        if isinstance(a, NotificationAttribute):
            return a
        if isinstance(a, dict):
            return cls(a["name"], a.get("data_type"), a.get("description"))
        return cls(a)


@dataclass
class NotificationStore:
    data_source: str
    attributes: list  # of NotificationAttribute | dict | str
    base_path: str
    _attrs: list[NotificationAttribute] = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self._attrs = [NotificationAttribute.of(a) for a in self.attributes]

    @property
    def path(self) -> str:
        return os.path.join(self.base_path, "notification", self.data_source)

    def _typed(self, notifications: DataFrame) -> DataFrame:
        """Project to (entity_id, timestamp, declared attrs) with
        declared types enforced."""
        from minerva_etl_spark.catalog.datatypes import REGISTRY

        cols = set(notifications.columns)
        missing = [a.name for a in self._attrs if a.name not in cols]
        if missing:
            raise ValueError(
                f"notification append to {self.data_source!r} is missing "
                f"declared attribute column(s) {missing}; declared schema "
                f"is {[a.name for a in self._attrs]}"
            )
        dtypes = dict(notifications.dtypes)
        out_cols = [F.col("entity_id"), F.col("timestamp")]
        for a in self._attrs:
            c = F.col(a.name)
            t = (a.data_type or "").lower()
            if not t:
                out_cols.append(c)  # legacy untyped: pass through
            elif t == "json":
                # canonical JSON string; structured columns serialized
                src_type = dtypes.get(a.name, "string")
                if src_type.startswith(("map<", "struct<", "array<")):
                    c = F.to_json(c)
                else:
                    c = c.cast("string")
                out_cols.append(c.alias(a.name))
            elif t in REGISTRY:
                out_cols.append(
                    c.cast(REGISTRY[t].spark_type).alias(a.name)
                )
            else:
                raise ValueError(
                    f"unknown declared data_type {a.data_type!r} for "
                    f"notification attribute {a.name!r}"
                )
        return notifications.select(*out_cols)

    def store(self, notifications: DataFrame) -> None:
        out = self._typed(notifications).withColumn(
            "__day", F.to_date("timestamp")
        )
        out.write.mode("append").partitionBy("__day").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame | None:
        from minerva_etl_spark.fsutil import parquet_exists as path_exists

        if not path_exists(spark, self.path):
            return None
        return spark.read.parquet(self.path).drop("__day")

    def streaming_sink(self, notifications_stream, checkpoint: str):
        """Structured Streaming variant: append via foreachBatch."""
        return (
            notifications_stream.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, _epoch: self.store(df))
        )
