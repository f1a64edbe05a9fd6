"""Notification store: append-only typed event tables.

Reference (`/root/reference/src/minerva/storage/notification/
notificationstore.py:17-97`): one append-only table per data source with
declared attribute columns; rows are (entity_id, timestamp, attrs...).
The Spark sink is a parquet append partitioned by day — the natural
shape for both batch trigger output and a streaming ``foreachBatch``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class NotificationStore:
    data_source: str
    attributes: list[str]
    base_path: str

    @property
    def path(self) -> str:
        return os.path.join(self.base_path, "notification", self.data_source)

    def store(self, notifications: DataFrame) -> None:
        out = notifications.withColumn(
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
