"""Attribute store: SCD history + staging + curr materialization.

Reference (`/root/reference/src/minerva/storage/attribute/`):

- one store per (data_source, entity_type) with ``attribute_history``
  (every version), ``attribute_staging`` (batch inbox) and a ``curr``
  pointer table (`attributestore.py:38-66`);
- ``store_batch`` COPYs into staging then ``transfer_staged`` merges to
  history (`attributestore.py:271-316`);
- ``compact`` collapses runs of identical consecutive values
  (`attributestore.py:261-269`); ``materialize_curr_ptr`` refreshes the
  latest-row view (`commands/attribute_store.py:523-579`).

Spark: history is a parquet table partitioned by entity-id bucket;
staging transfer is an upsert on (entity_id, timestamp); compact/curr
are the window operators from ``operators/attribute.py``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.operators.attribute import compact_history, latest_per_entity
from minerva_etl_spark.operators.upsert import upsert

N_BUCKETS_DEFAULT = 64


@dataclass
class AttributeStore:
    data_source: str
    entity_type: str
    attributes: list[str]
    base_path: str
    n_buckets: int = N_BUCKETS_DEFAULT

    @property
    def history_path(self) -> str:
        return os.path.join(
            self.base_path, "attribute",
            f"{self.data_source}_{self.entity_type}", "history",
        )

    @property
    def curr_path(self) -> str:
        return os.path.join(
            self.base_path, "attribute",
            f"{self.data_source}_{self.entity_type}", "curr",
        )

    def _bucketed(self, df: DataFrame) -> DataFrame:
        # entity-hash bucket partitioning: co-locates each entity's
        # history for the window operators without a full-table shuffle
        return df.withColumn(
            "__bucket", F.pmod(F.xxhash64("entity_id"), F.lit(self.n_buckets))
        )

    def read_history(self, spark: SparkSession) -> DataFrame | None:
        from minerva_etl_spark.fsutil import parquet_exists as path_exists

        if not path_exists(spark, self.history_path):
            return None
        return spark.read.parquet(self.history_path).drop("__bucket")

    def store_batch(self, spark: SparkSession, batch: DataFrame) -> None:
        """Staging→history transfer: upsert on (entity_id, timestamp)
        (re-staging the same timestamp replaces the values, as in the
        reference's update test)."""
        cols = ["entity_id", "timestamp", *[
            c for c in self.attributes if c in batch.columns
        ]]
        batch = batch.select(*cols)
        existing = self.read_history(spark)
        if existing is not None:
            merged = upsert(
                existing.select(*cols), batch, keys=["entity_id", "timestamp"]
            )
        else:
            merged = batch
        self._swap_history(spark, merged)

    def compact(self, spark: SparkSession) -> None:
        """Run-length compress history in place (A8)."""
        hist = self.read_history(spark)
        if hist is None:
            return
        value_cols = [c for c in hist.columns if c not in ("entity_id", "timestamp")]
        self._swap_history(spark, compact_history(hist, value_cols))

    def _swap_history(self, spark: SparkSession, df: DataFrame) -> None:
        """History rewrite via write-and-swap: bounded executor memory
        at any history size (no lineage checkpoint)."""
        from minerva_etl_spark.fsutil import swap_directory_write

        swap_directory_write(
            spark,
            lambda tmp: (
                self._bucketed(df)
                .repartition("__bucket")
                .write.mode("overwrite")
                .partitionBy("__bucket")
                .parquet(tmp)
            ),
            self.history_path,
        )

    def delete(self) -> None:
        """Drop the store: history + curr removed (reference
        ``attribute-store delete``, `commands/attribute_store.py:
        560-579` — DROP TABLE cascade on the parquet substrate)."""
        import shutil

        shutil.rmtree(
            os.path.join(
                self.base_path, "attribute",
                f"{self.data_source}_{self.entity_type}",
            ),
            ignore_errors=True,
        )

    def materialize_curr(self, spark: SparkSession) -> DataFrame | None:
        """Refresh the latest-row-per-entity pointer table (A9/W1)."""
        from minerva_etl_spark.fsutil import swap_directory_write

        hist = self.read_history(spark)
        if hist is None:
            return None
        curr = latest_per_entity(hist)
        swap_directory_write(
            spark,
            lambda tmp: curr.write.mode("overwrite").parquet(tmp),
            self.curr_path,
        )
        return spark.read.parquet(self.curr_path)
