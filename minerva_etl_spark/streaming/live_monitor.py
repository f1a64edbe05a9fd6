"""Live monitor: the micro-batch orchestration loop (T6).

Reference (`/root/reference/src/minerva/commands/live_monitor.py:13-45`):
poll every 2 s — fold the modified log into state, run up to 50 stale
materializations, repeat.

Two Spark-native variants:

- :func:`run_once` — one `availableNow`-style pass (fold log → run
  stale chunks), usable from a driver loop or cron;
- :func:`watch_stream` — a Structured Streaming pipeline over a
  parquet-append modified log directory: each micro-batch triggers the
  same engine pass via ``foreachBatch`` (the stream carries *change
  notifications*; the heavy lifting stays in batch DataFrame jobs,
  which is the right split at 100 TB — state is tiny, facts are big).
"""

from __future__ import annotations

import time
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from minerva_etl_spark.materialize.fingerprint import MaterializationEngine


def _utcnow() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def run_once(
    engine: MaterializationEngine,
    modified_log: DataFrame,
    sink: Callable[[str, DataFrame, list], None],
    max_num: int = 50,
    now: datetime | None = None,
) -> list:
    """One poll cycle (reference defaults: batch of 50)."""
    return engine.run(modified_log, now or _utcnow(), sink, max_num=max_num)


def run_loop(
    engine: MaterializationEngine,
    read_log: Callable[[], DataFrame | None],
    sink: Callable[[str, DataFrame, list], None],
    poll_seconds: float = 2.0,
    max_cycles: int | None = None,
    max_num: int = 50,
    now: Callable[[], datetime] | None = None,
) -> int:
    """Driver-side poll loop (reference cadence: 2 s).  ``now`` is the
    clock (injectable for deterministic replay/testing)."""
    cycles = 0
    total = 0
    clock = now or _utcnow
    while max_cycles is None or cycles < max_cycles:
        log = read_log()
        if log is not None:
            total += len(run_once(engine, log, sink, max_num=max_num, now=clock()))
        cycles += 1
        if max_cycles is None or cycles < max_cycles:
            time.sleep(poll_seconds)
    return total


def watch_stream(
    spark: SparkSession,
    engine: MaterializationEngine,
    modified_log_path: str,
    log_schema: str,
    sink: Callable[[str, DataFrame, list], None],
    checkpoint: str,
    max_num: int = 50,
):
    """Structured Streaming wrapper: new modified-log files drive engine
    passes.  Returns the (unstarted) DataStreamWriter."""
    stream = (
        spark.readStream.schema(log_schema).parquet(modified_log_path)
    )

    def on_batch(batch_df: DataFrame, _epoch: int) -> None:
        # the stream batch tells us *that* something changed; the engine
        # re-reads the full (tiny) log for a consistent fingerprint fold
        full_log = spark.read.parquet(modified_log_path)
        engine.run(full_log, _utcnow(), sink, max_num=max_num)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(on_batch)
    )
