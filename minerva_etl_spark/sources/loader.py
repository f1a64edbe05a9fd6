"""Loader orchestration: file → parse → store, with job logging.

Reference (`/root/reference/src/minerva/loading/loader.py:25-127,245-277`,
job log `logging/__init__.py:4-22`): resolve the harvest plugin for the
file type, parse into packages, wrap each store in a logged job, apply
row/column filters, and honor the missing-target error policy
(warn vs stop).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.errors import NoSuchColumnError
from minerva_etl_spark.sources.plugins import get_plugin
from minerva_etl_spark.store.trendstore import TrendStore


@dataclass
class JobLog:
    """Append-only job table (T7): (job_id, description, started, ended,
    state)."""

    base_path: str

    @property
    def path(self) -> str:
        return os.path.join(self.base_path, "job_log")

    #: schema shared by the single and fused append paths
    DDL = (
        "job_id bigint, description string, started timestamp_ntz, "
        "ended timestamp_ntz, state string"
    )

    def log(
        self,
        spark: SparkSession,
        job_id: int,
        description: str,
        started: datetime,
        ended: datetime,
        state: str,
    ) -> None:
        self.log_many(
            spark, [(job_id, description, started, ended, state)]
        )

    def log_many(self, spark: SparkSession, rows: list[tuple]) -> None:
        """Append job rows driver-side (no Spark job on local FS): the
        job log is driver-held metadata, a few rows per delivery —
        running a distributed write for it was pure job overhead
        (measured ~0.4 s per append at toy scale)."""
        from minerva_etl_spark.fsutil import append_small_parquet

        append_small_parquet(spark, self.path, rows, self.DDL)

    def read(self, spark: SparkSession) -> DataFrame | None:
        from minerva_etl_spark.fsutil import parquet_exists as path_exists

        if not path_exists(spark, self.path):
            return None
        return spark.read.parquet(self.path)


@dataclass
class Loader:
    """Driver-side load function (S4)."""

    store: TrendStore
    job_log: JobLog | None = None
    #: regex filters (P8: --dn-filter / --column-filter)
    entity_filter: str | None = None
    column_filter: str | None = None
    #: 'warn' drops metrics with no declared column; 'stop' raises;
    #: 'add' declares them on the first part (schema evolution)
    on_unknown_column: str = "warn"
    #: maintain the entity dimension table (create-on-miss) under
    #: <store.base_path>/entity/<entity_type> — powers virtual-entity
    #: and relation defining queries (J2 create-on-miss)
    register_entity_dim: bool = True
    #: entity-id hash method for the dimension table ('xxhash64' | 'md5')
    id_method: str = "xxhash64"

    def _parse_one(
        self, spark: SparkSession, file_type: str, path: str, parser_config
    ) -> tuple[DataFrame, list[str]]:
        """Parse + row/column filter one file; returns (frame, metric
        columns).  Shared by the sequential and fused load paths."""
        reader = get_plugin(file_type)
        frame = reader(spark, path, parser_config)
        if self.entity_filter and "entity_ref" in frame.columns:
            frame = frame.filter(F.col("entity_ref").rlike(self.entity_filter))
        metric_cols = [
            c
            for c in frame.columns
            if c not in ("entity_id", "entity_ref", "timestamp")
        ]
        if self.column_filter:
            import re

            keep = [c for c in metric_cols if re.search(self.column_filter, c)]
            # entity_ref survives the filter so the entity dimension is
            # still maintained on filtered loads (it is never a metric)
            passthrough = [c for c in ("entity_ref",) if c in frame.columns]
            frame = frame.select("entity_id", "timestamp", *passthrough, *keep)
            metric_cols = keep
        return frame, metric_cols

    def load_file(
        self,
        spark: SparkSession,
        file_type: str,
        path: str,
        parser_config,
        job_id: int | None = None,
        created: datetime | None = None,
    ) -> int:
        started = datetime.now(timezone.utc).replace(tzinfo=None)
        job_id = job_id if job_id is not None else int(time.time() * 1000) % (2**62)
        frame, metric_cols = self._parse_one(spark, file_type, path, parser_config)
        if self.register_entity_dim and "entity_ref" in frame.columns:
            from minerva_etl_spark.catalog.directory import register_entities

            register_entities(
                spark,
                os.path.join(self.store.base_path, "entity", self.store.entity_type),
                frame.select(F.col("entity_ref").alias("name")),
                self.store.entity_type,
                method=self.id_method,
            )
        state = "finished"
        try:
            declared = {c for p in self.store.parts for c in p.trend_columns}
            unknown = [c for c in metric_cols if c not in declared]
            if unknown and self.on_unknown_column == "stop":
                # inside the logged scope: a rejected load is a FAILED
                # job in the log, like any other load error
                raise NoSuchColumnError(f"undeclared metric columns: {unknown}")
            if unknown and self.on_unknown_column == "add":
                # schema evolution for drifting feeds: declare the new
                # columns on the first part (reference parity is the
                # explicit `alter-trends` command; 'add' automates it)
                self.store.alter_trends(self.store.parts[0].name, unknown)
                declared |= set(unknown)
            self.store.store(
                spark,
                frame.select(
                    "entity_id", "timestamp",
                    *[c for c in metric_cols if c in declared],
                ),
                job_id=job_id,
                created=created,
            )
        except Exception:
            state = "failed"
            raise
        finally:
            if self.job_log is not None:
                ended = datetime.now(timezone.utc).replace(tzinfo=None)
                self.job_log.log(
                    spark, job_id, os.path.basename(path), started, ended, state
                )
        return job_id

    def load_files(
        self,
        spark: SparkSession,
        files: list[tuple],
        created: datetime | None = None,
    ) -> list[int]:
        """Fused multi-file load: ``files`` is a list of
        ``(file_type, path, parser_config, job_id, created)`` tuples
        (job_id/created may be None).  All files are parsed lazily,
        unioned with per-row job columns, the entity dimension is
        registered ONCE over the union, and each store part sees ONE
        upsert cycle — O(parts) jobs for a whole harvest directory
        instead of O(files x parts).  Within-batch key conflicts resolve
        exactly as sequential loads in ``created`` order would
        (last-write-wins, ``created = greatest``).

        Reference parity: the reference CLI processes a directory file
        by file inside one transaction each
        (`/root/reference/src/minerva/commands/load_data.py:57-90`); on
        Spark the batched union is the idiomatic equivalent — same final
        table state, one distributed job per part.
        """
        started = datetime.now(timezone.utc).replace(tzinfo=None)
        default_created = created or started
        frames: list[DataFrame] = []
        jobs: list[int] = []
        names: list[str] = []
        declared = {c for p in self.store.parts for c in p.trend_columns}
        for i, (file_type, path, parser_config, job_id, file_created) in enumerate(
            files
        ):
            job_id = (
                job_id
                if job_id is not None
                else (int(time.time() * 1000) % (2**62)) + i
            )
            frame, metric_cols = self._parse_one(
                spark, file_type, path, parser_config
            )
            unknown = [c for c in metric_cols if c not in declared]
            if unknown and self.on_unknown_column == "stop":
                if self.job_log is not None:
                    ended = datetime.now(timezone.utc).replace(tzinfo=None)
                    self.job_log.log(
                        spark, job_id, os.path.basename(path),
                        started, ended, "failed",
                    )
                raise NoSuchColumnError(f"undeclared metric columns: {unknown}")
            if unknown and self.on_unknown_column == "add":
                self.store.alter_trends(self.store.parts[0].name, unknown)
                declared |= set(unknown)
            keep = [c for c in metric_cols if c in declared]
            passthrough = [c for c in ("entity_ref",) if c in frame.columns]
            carried = (
                F.array(*[F.lit(c) for c in keep])
                if keep
                else F.array().cast("array<string>")
            )
            frames.append(
                frame.select("entity_id", "timestamp", *passthrough, *keep)
                .withColumn("job_id", F.lit(job_id).cast("bigint"))
                .withColumn("created", F.lit(file_created or default_created))
                # which metric columns THIS file actually carried — a
                # union-null must not beat a real value from another file
                # in a part the file never touched
                .withColumn("__cols", carried)
            )
            jobs.append(job_id)
            names.append(os.path.basename(path))
        if not frames:
            return []
        from functools import reduce

        package = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
        )
        # materialize the delivery ONCE: the union feeds the entity
        # registration AND one upsert cycle per part, each of which
        # would otherwise re-run the full parse+filter+union pipeline
        # (measured as the dominant broadcast-job cost in the
        # lifecycle_load_store job census).  A delivery batch is
        # bounded by the harvest directory, not the corpus; blocks are
        # freed after the store.
        package = package.localCheckpoint(eager=True)
        if self.register_entity_dim and "entity_ref" in package.columns:
            from minerva_etl_spark.catalog.directory import register_entities

            register_entities(
                spark,
                os.path.join(self.store.base_path, "entity", self.store.entity_type),
                package.select(F.col("entity_ref").alias("name")),
                self.store.entity_type,
                method=self.id_method,
            )
            package = package.drop("entity_ref")
        state = "finished"
        try:
            self.store.store_batch(spark, package)
        except Exception:
            state = "failed"
            raise
        finally:
            # free the delivery's checkpoint blocks (no public API:
            # unpersist the LogicalRDD behind the analyzed plan)
            try:
                package._jdf.queryExecution().analyzed().rdd().unpersist(
                    False
                )
            except Exception:
                pass
            if self.job_log is not None:
                ended = datetime.now(timezone.utc).replace(tzinfo=None)
                self.job_log.log_many(
                    spark,
                    [
                        (job_id, name, started, ended, state)
                        for job_id, name in zip(jobs, names)
                    ],
                )
        return jobs


@dataclass
class AttributeLoader:
    """Attribute-flavor harvest loading (S2's second plugin API:
    reference `harvest/plugin_api_attribute.py:1-31` — plugins may
    yield ATTRIBUTE packages instead of trend packages; the loader
    routes them into ``attribute_staging`` → ``transfer_staged``,
    `storage/attribute/attributestore.py:271-316`).

    Spark mapping: the same file parsers produce
    ``(entity_id, entity_ref, timestamp, attribute columns...)``;
    declared attributes go through ``AttributeStore.store_batch`` (the
    staging-merge upsert), the entity dimension is maintained
    create-on-miss, and every load is a logged job — symmetric with the
    trend :class:`Loader`.
    """

    store: "object"  # AttributeStore (duck-typed: attributes/store_batch)
    job_log: JobLog | None = None
    entity_filter: str | None = None
    #: 'warn' drops undeclared attribute columns; 'stop' raises
    on_unknown_column: str = "warn"
    register_entity_dim: bool = True
    id_method: str = "xxhash64"
    base_path: str | None = None

    def load_file(
        self,
        spark: SparkSession,
        file_type: str,
        path: str,
        parser_config,
        job_id: int | None = None,
    ) -> int:
        started = datetime.now(timezone.utc).replace(tzinfo=None)
        job_id = job_id if job_id is not None else int(time.time() * 1000) % (2**62)
        reader = get_plugin(file_type)
        frame = reader(spark, path, parser_config)
        if self.entity_filter and "entity_ref" in frame.columns:
            frame = frame.filter(F.col("entity_ref").rlike(self.entity_filter))
        attr_cols = [
            c
            for c in frame.columns
            if c not in ("entity_id", "entity_ref", "timestamp")
        ]
        declared = list(self.store.attributes)
        unknown = [c for c in attr_cols if c not in declared]
        state = "finished"
        base = self.base_path or getattr(self.store, "base_path", None)
        try:
            if unknown and self.on_unknown_column == "stop":
                raise NoSuchColumnError(f"undeclared attribute columns: {unknown}")
            if self.register_entity_dim and "entity_ref" in frame.columns and base:
                from minerva_etl_spark.catalog.directory import register_entities

                register_entities(
                    spark,
                    os.path.join(base, "entity", self.store.entity_type),
                    frame.select(F.col("entity_ref").alias("name")),
                    self.store.entity_type,
                    method=self.id_method,
                )
            keep = [c for c in attr_cols if c in declared]
            self.store.store_batch(
                spark, frame.select("entity_id", "timestamp", *keep)
            )
        except Exception:
            state = "failed"
            raise
        finally:
            if self.job_log is not None:
                ended = datetime.now(timezone.utc).replace(tzinfo=None)
                self.job_log.log(
                    spark, job_id, os.path.basename(path), started, ended, state
                )
        return job_id
