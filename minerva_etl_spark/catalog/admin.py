"""Directory-catalog administration: data sources, entity types, aliases.

Reference (`/root/reference/src/minerva/commands/data_source.py:47-99`,
`entity_type.py:48-100`, `alias.py:32-110`): tiny create/delete/list
operations over the ``directory`` schema tables.

Spark mapping: data-source and entity-type registries are driver-side
metadata (a JSON file per data dir — the analog of the two catalog
tables, far too small for distributed state); aliases are a real
dimension table (parquet) because alias→entity resolution joins against
facts (`catalog/directory.aliases_to_entity_ids`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.catalog.directory import entity_id_col


@dataclass
class DirectoryCatalog:
    base_path: str

    def _registry_path(self, kind: str) -> str:
        path = os.path.join(self.base_path, "catalog")
        os.makedirs(path, exist_ok=True)
        return os.path.join(path, f"{kind}.json")

    def _load(self, kind: str) -> list[str]:
        try:
            with open(self._registry_path(kind)) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def _store(self, kind: str, names: list[str]) -> None:
        with open(self._registry_path(kind), "w") as f:
            json.dump(sorted(set(names)), f)

    # ------------------------------------------------- data source / type
    def create(self, kind: str, name: str) -> None:
        """``data-source create`` / ``entity-type create``."""
        self._store(kind, self._load(kind) + [name])

    def delete(self, kind: str, name: str) -> None:
        self._store(kind, [n for n in self._load(kind) if n != name])

    def list(self, kind: str) -> list[str]:
        return self._load(kind)

    # ---------------------------------------------------------- aliases
    def alias_path(self) -> str:
        return os.path.join(self.base_path, "alias")

    def create_aliases(
        self,
        spark: SparkSession,
        entity_type: str,
        pairs: DataFrame,
        alias_type: str = "name",
        id_method: str = "xxhash64",
    ) -> None:
        """``alias create``: load (alias, name) pairs as an alias
        dimension keyed by the deterministic entity id."""
        rows = pairs.select(
            F.col("alias"),
            entity_id_col(entity_type, "name", id_method).alias("entity_id"),
            F.lit(alias_type).alias("type"),
        )
        rows.write.mode("append").parquet(self.alias_path())

    def delete_aliases(self, spark: SparkSession, alias_type: str) -> None:
        from minerva_etl_spark.fsutil import swap_directory_write

        df = self.read_aliases(spark)
        if df is None:
            return
        kept = df.filter(F.col("type") != alias_type)
        swap_directory_write(
            spark,
            lambda tmp: kept.write.mode("overwrite").parquet(tmp),
            self.alias_path(),
        )

    def read_aliases(self, spark: SparkSession) -> DataFrame | None:
        from minerva_etl_spark.fsutil import parquet_exists as path_exists

        if not path_exists(spark, self.alias_path()):
            return None
        return spark.read.parquet(self.alias_path())
