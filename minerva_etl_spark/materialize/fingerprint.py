"""Incremental materialization: the fingerprint engine.

This is the reference's differentiating machinery, reproduced on Spark
state tables (there is no built-in equivalent in Catalyst):

- Every store write appends ``(part, timestamp, modified)`` to a
  **modified log**; folding the log per (part, timestamp) keeping the
  latest ``modified`` gives the **modified state**
  (`commands/trend_store.py:908-963`).
- A **materialization** maps source part(s) to a target part via a
  registered transformation.  Its **fingerprint** for a target bucket is
  the JSON of the source buckets' last-modified values
  (`aggregation_compilation.py:773-785`); a bucket is **stale** iff
  ``source_fingerprint != processed_fingerprint`` or never processed
  (`commands/trend_store.py:1064-1069`).
- Scheduling respects ``processing_delay`` (bucket must be old enough)
  and ``stability_delay`` (sources quiet long enough), newest-first with
  a batch cap (`materialization.py:14-19,102-125`,
  `commands/trend_store.py:1059-1085`).
- Executing a chunk deletes the target bucket and recomputes it from
  the registered query, then stamps ``processed_fingerprint``
  (`materialize` call sites, `commands/trend_store.py:1013-1031`).

The run loop is driver-side control flow (like the reference's CLI), but
every data operation is a distributed DataFrame job; state tables are
tiny (buckets × materializations) and stay broadcastable.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.catalog.granularity import Granularity


@dataclass
class Materialization:
    """A registered incremental transformation.

    ``transform(spark, timestamps) -> DataFrame`` must return the target
    rows for exactly the given bucket end-labels.
    """

    name: str
    target_gran: Granularity
    sources: list[str]  # source part names in the modified log
    transform: Callable[[SparkSession, list[datetime]], DataFrame]
    #: a source bucket feeds the target bucket that covers it
    source_gran: Granularity | None = None
    #: month-unit delays are Granularity (calendar months, applied via
    #: ``_before``); everything else plain timedelta
    processing_delay: "timedelta | Granularity" = timedelta(minutes=30)
    stability_delay: "timedelta | Granularity" = timedelta(minutes=5)
    reprocessing_period: "timedelta | Granularity" = timedelta(days=3)
    enabled: bool = True


def _before(now: datetime, delay: "timedelta | Granularity") -> datetime:
    """Deadline anchor: ``now`` minus a delay.  Month-unit delays are
    calendar months (PostgreSQL interval semantics via
    ``Granularity.before``), not a 30-day approximation."""
    if isinstance(delay, Granularity):
        return delay.before(now)
    return now - delay


def fold_modified_state(modified_log: DataFrame) -> DataFrame:
    """(part, timestamp) -> last modified (T1: process_modified_log)."""
    return modified_log.groupBy("part", "timestamp").agg(
        F.max("modified").alias("last_modified")
    )


def compact_modified_log(spark: SparkSession, log_path: str) -> int:
    """Rewrite the append-only modified log to its folded state
    (reference ``process_modified_log`` keeps a separate state table;
    here the log IS the state, so compaction bounds its growth).
    Returns the compacted row count.  Run under the retention job."""
    from minerva_etl_spark.fsutil import parquet_exists as path_exists

    from minerva_etl_spark.fsutil import swap_directory_write

    if not path_exists(spark, log_path):
        return 0
    log = spark.read.parquet(log_path)
    folded = fold_modified_state(log).select(
        "part", "timestamp", F.col("last_modified").alias("modified")
    )
    swap_directory_write(
        spark,
        lambda tmp: folded.write.mode("overwrite").parquet(tmp),
        log_path,
    )
    return spark.read.parquet(log_path).count()


def source_fingerprints(
    mat: Materialization, modified_state: DataFrame
) -> DataFrame:
    """Per target bucket: fingerprint JSON of the source buckets' last
    modified values + the max source modified (for stability_delay).

    Mirrors the generated fingerprint SQL shape
    (`aggregation_compilation.py:773-785`): map each source bucket to
    its covering target bucket, then aggregate a deterministic
    JSON-ish string.
    """
    gran = mat.target_gran
    rows = modified_state.filter(F.col("part").isin(mat.sources))
    target_bucket = F.expr(gran.bucket_end_spark_sql("timestamp"))
    return (
        rows.withColumn("target_ts", target_bucket)
        .groupBy("target_ts")
        .agg(
            F.to_json(
                F.map_from_entries(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.concat_ws(
                                    "|", F.col("part"), F.col("timestamp").cast("string")
                                ).alias("k"),
                                F.col("last_modified").cast("string").alias("v"),
                            )
                        )
                    )
                )
            ).alias("source_fingerprint"),
            F.max("last_modified").alias("max_source_modified"),
        )
    )


class MaterializationEngine:
    """State-table driven scheduler + executor (T1-T3, §3.2)."""

    def __init__(self, spark: SparkSession, state_path: str) -> None:
        self.spark = spark
        self.state_path = state_path
        self.materializations: dict[str, Materialization] = {}

    def register(self, mat: Materialization) -> None:
        self.materializations[mat.name] = mat

    # ------------------------------------------------------------ state
    def read_state(self) -> DataFrame:
        from minerva_etl_spark.fsutil import parquet_exists as path_exists

        # silent FS probe (not a caught read error: that logs a JVM
        # stack trace on every fresh state table)
        if path_exists(self.spark, self.state_path):
            return self.spark.read.parquet(self.state_path)
        return self.spark.createDataFrame(
            [],
            "materialization string, timestamp timestamp_ntz, "
            "processed_fingerprint string",
        )

    def _write_state(self, df: DataFrame) -> None:
        from minerva_etl_spark.fsutil import swap_directory_write

        swap_directory_write(
            self.spark,
            lambda tmp: df.write.mode("overwrite").parquet(tmp),
            self.state_path,
        )

    # -------------------------------------------------------- schedule
    #: max processed-state rows read/written driver-side per poll; the
    #: state is (materialization x processed buckets) and the engine
    #: already broadcasts it (i.e. it is driver-memory-bound by
    #: design) — past this bound the distributed read/write paths take
    #: over unchanged
    STATE_COLLECT_LIMIT = 500_000

    def _read_state_rows(self) -> "list[tuple] | None":
        """Processed state as driver tuples (no Spark job), or None
        when non-local/oversized — callers fall back to the
        DataFrame path (r16; guide §1.2/§5: the state is poll-loop
        metadata, not corpus data)."""
        from minerva_etl_spark.fsutil import read_small_parquet_rows

        return read_small_parquet_rows(
            self.state_path,
            ["materialization", "timestamp", "processed_fingerprint"],
            self.STATE_COLLECT_LIMIT,
            spark=self.spark,  # scheme-less paths resolve via defaultFS
        )

    def stale_chunks(
        self,
        modified_log: DataFrame,
        now: datetime,
        max_num: int | None = None,
        newest_first: bool = True,
        state: DataFrame | None = None,
        state_rows: "list[tuple] | None" = None,
    ) -> list[tuple[str, datetime, str]]:
        """(materialization, bucket, source_fingerprint) needing work —
        the J7 scheduling join over state/registry tables.

        ONE Spark job per poll, with a plan whose size is independent of
        how many materializations are registered — mirroring the
        reference's single scheduling query
        (`commands/trend_store.py:1045-1094`): the registry becomes a
        broadcast DataFrame of (materialization, source_part,
        granularity, deadlines); the folded modified state joins it
        once, the target bucket is computed per row by one CASE over the
        registry's distinct granularities, and one groupBy builds every
        fingerprint before a single broadcast join against processed
        state and one bounded ``collect()``.

        Two rejected shapes, both measured (see SCALE.md): one job +
        ``collect()`` per registered materialization per poll
        (driver-blocking at a 2 s cadence × hundreds of
        materializations), and a union of per-materialization
        fingerprint branches — one job, but Catalyst analysis cost
        grows with branch count (~27 s/poll at 200 registered
        materializations vs ~1.3 s for this shape, and the union is
        slower even at 3 registrations).
        """
        mats = [m for m in self.materializations.values() if m.enabled]
        if not mats:
            return []
        rows = self._stale_registry_join(
            mats, modified_log, now, state, state_rows
        )
        out = [
            (r.materialization, r.target_ts, r.source_fingerprint)
            for r in rows
        ]
        out.sort(key=lambda t: t[1], reverse=newest_first)
        return out[:max_num] if max_num else out

    def _with_state_filter(
        self, fps: DataFrame, state: DataFrame | None = None
    ) -> DataFrame:
        """Join fingerprints once against broadcast processed state and
        keep never-processed / fingerprint-changed buckets.  ``state``
        lets ``run()`` share one state read per cycle."""
        state = (state if state is not None else self.read_state()).select(
            "materialization",
            F.col("timestamp").alias("target_ts"),
            "processed_fingerprint",
        )
        return (
            fps.join(
                F.broadcast(state),
                ["materialization", "target_ts"],
                "left",
            )
            .filter(
                F.col("processed_fingerprint").isNull()
                | (
                    F.col("processed_fingerprint")
                    != F.col("source_fingerprint")
                )
            )
            .select("materialization", "target_ts", "source_fingerprint")
        )

    def _stale_registry_join(
        self,
        mats: list,
        modified_log: DataFrame,
        now: datetime,
        state: DataFrame | None = None,
        state_rows: "list[tuple] | None" = None,
    ) -> list:
        reg_rows = []
        grans: dict[str, Granularity] = {}
        for mat in mats:
            gkey = mat.target_gran.name
            grans[gkey] = mat.target_gran
            for src in mat.sources:
                reg_rows.append(
                    (
                        mat.name,
                        src,
                        gkey,
                        _before(now, mat.processing_delay),
                        _before(now, mat.stability_delay),
                        _before(now, mat.reprocessing_period),
                    )
                )
        registry = self.spark.createDataFrame(
            reg_rows,
            "materialization string, source_part string, gran string, "
            "processing_deadline timestamp_ntz, "
            "stability_deadline timestamp_ntz, "
            "reprocess_floor timestamp_ntz",
        )
        bucket_case = "CASE " + " ".join(
            f"WHEN gran = '{k}' THEN ({g.bucket_end_spark_sql('timestamp')})"
            for k, g in grans.items()
        ) + " END"
        # ONE exchange for the whole staleness query (r16; guide §2.4
        # "two operations keyed the same way share one exchange"): the
        # raw log broadcast-joins the registry, one explicit
        # repartition on (materialization, target_ts) then satisfies
        # BOTH aggregation levels — the per-source-bucket fold
        # (previously its own (part, timestamp) exchange via
        # fold_modified_state) and the fingerprint roll-up.
        joined = modified_log.join(
            F.broadcast(registry),
            modified_log.part == registry.source_part,
        )
        # fingerprint string must stay byte-identical to
        # source_fingerprints() — processed state compares across runs
        fps = (
            joined.withColumn("target_ts", F.expr(bucket_case))
            .repartition("materialization", "target_ts")
            .groupBy("materialization", "target_ts", "part", "timestamp")
            .agg(
                F.max("modified").alias("last_modified"),
                F.first("processing_deadline").alias("processing_deadline"),
                F.first("stability_deadline").alias("stability_deadline"),
                F.first("reprocess_floor").alias("reprocess_floor"),
            )
            .groupBy("materialization", "target_ts")
            .agg(
                F.to_json(
                    F.map_from_entries(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.concat_ws(
                                        "|",
                                        F.col("part"),
                                        F.col("timestamp").cast("string"),
                                    ).alias("k"),
                                    F.col("last_modified")
                                    .cast("string")
                                    .alias("v"),
                                )
                            )
                        )
                    )
                ).alias("source_fingerprint"),
                F.max("last_modified").alias("max_source_modified"),
                F.first("processing_deadline").alias("processing_deadline"),
                F.first("stability_deadline").alias("stability_deadline"),
                F.first("reprocess_floor").alias("reprocess_floor"),
            )
            .filter(
                (F.col("target_ts") <= F.col("processing_deadline"))
                & (F.col("max_source_modified") <= F.col("stability_deadline"))
                & (F.col("target_ts") >= F.col("reprocess_floor"))
            )
        )
        if state_rows is not None:
            # processed state already in driver memory: filter the
            # (bounded) candidate buckets here instead of building a
            # broadcast relation from a parquet read — one job fewer
            # per poll, identical keep rule (never-processed OR
            # fingerprint changed)
            smap = {(m, ts): fp for m, ts, fp in state_rows}
            return [
                r
                for r in fps.select(
                    "materialization", "target_ts", "source_fingerprint"
                ).collect()
                if smap.get((r.materialization, r.target_ts))
                != r.source_fingerprint
            ]
        return self._with_state_filter(fps, state).collect()

    # ---------------------------------------------------------- execute
    def run(
        self,
        modified_log: DataFrame,
        now: datetime,
        sink: Callable[[str, DataFrame, list[datetime]], None],
        max_num: int | None = None,
    ) -> list[tuple[str, datetime]]:
        """Materialize every stale chunk, batched per materialization
        (one Spark job per materialization covering all its stale
        buckets — not one per bucket like the reference's per-chunk
        loop; at scale this is the difference between N tiny jobs and
        one partition-pruned job)."""
        state_rows = self._read_state_rows()
        state = self.read_state() if state_rows is None else None
        chunks = self.stale_chunks(
            modified_log, now, max_num=max_num,
            state=state, state_rows=state_rows,
        )
        done: list[tuple[str, datetime]] = []
        by_mat: dict[str, list[tuple[datetime, str]]] = {}
        for name, ts, fp in chunks:
            by_mat.setdefault(name, []).append((ts, fp))
        for name, pairs in by_mat.items():
            mat = self.materializations[name]
            timestamps = [ts for ts, _ in pairs]
            result = mat.transform(self.spark, timestamps)
            sink(name, result, timestamps)
            done.extend((name, ts) for ts in timestamps)
        if done and state_rows is not None:
            # state already driver-held (bounded): merge + swap-write
            # it with NO Spark job (r16; guide §1.2 — the pre-r16
            # shape paid an anti-join + a parquet write job per poll
            # for a metadata table the staleness check had already
            # pulled to the driver)
            from minerva_etl_spark.fsutil import write_small_parquet

            merged = {(m, ts): fp for m, ts, fp in state_rows}
            for name, pairs in by_mat.items():
                for ts, fp in pairs:
                    merged[(name, ts)] = fp
            if not write_small_parquet(
                self.spark,
                self.state_path,
                [(m, ts, fp) for (m, ts), fp in sorted(merged.items())],
                "materialization string, timestamp timestamp_ntz, "
                "processed_fingerprint string",
            ):  # non-local FS raced in: distributed fallback
                state_rows, state = None, self.read_state()
        if done and state_rows is None:
            # ONE state update for the whole cycle: a per-materialization
            # anti-join+union would chain an M-deep plan before the
            # single write (pure Catalyst bloat at hundreds of
            # registered materializations)
            new_rows = self.spark.createDataFrame(
                [
                    (name, ts, fp)
                    for name, pairs in by_mat.items()
                    for ts, fp in pairs
                ],
                "materialization string, timestamp timestamp_ntz, "
                "processed_fingerprint string",
            )
            state = state.join(
                new_rows.select("materialization", "timestamp"),
                ["materialization", "timestamp"],
                "left_anti",
            ).unionByName(new_rows)
            self._write_state(state)
        return done
