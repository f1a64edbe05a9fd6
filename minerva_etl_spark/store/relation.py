"""Relation tables: entity-graph edges defined by a query, refreshed by
full rebuild.

Reference (`/root/reference/src/minerva/commands/relation.py:63-129`,
`instance/__init__.py:421-453`): ``relation.<name>(source_id,
target_id)`` materialized by TRUNCATE + INSERT from its defining SQL;
virtual entities analogously with ``ON CONFLICT DO NOTHING``
(`commands/virtual_entity.py:30-57`).

Spark: overwrite-parquet from the defining DataFrame/SQL; virtual-entity
refresh is the left-anti append from ``catalog.directory``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RelationStore:
    base_path: str

    def path(self, name: str) -> str:
        return os.path.join(self.base_path, "relation", name.replace("->", "__"))

    def materialize(
        self, spark: SparkSession, name: str, defining: DataFrame
    ) -> DataFrame:
        """TRUNCATE+INSERT ≡ overwrite from the defining query.  The
        frame must have (source_id, target_id) columns."""
        from minerva_etl_spark.fsutil import swap_directory_write

        out = defining.select("source_id", "target_id").distinct()
        swap_directory_write(
            spark,
            lambda tmp: out.write.mode("overwrite").parquet(tmp),
            self.path(name),
        )
        return spark.read.parquet(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame | None:
        from minerva_etl_spark.fsutil import parquet_exists as path_exists

        if not path_exists(spark, self.path(name)):
            return None
        return spark.read.parquet(self.path(name))
