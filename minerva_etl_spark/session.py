"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the conf below is chosen so the same
code scales to a multi-executor cluster: AQE on (runtime join-strategy +
skew handling), dynamic partition overwrite (bucket-replace writes of the
trend store), UTC session timezone (oracle parity and DST-free storage
arithmetic — the reference stores timestamptz in UTC as well).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "minerva_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    # local-mode driver and executors share one JVM whose heap defaults
    # to spark.driver.memory's 1g — far below what 32 concurrent tasks
    # need (measured: scale_probe x16 OOMs at 1g).  Default 8g balances
    # that against memory-capped containers embedding this library
    # (an -Xmx above a cgroup limit gets the JVM OOM-killed instead of
    # letting Spark spill); memory-hungry tools raise it via
    # SPARK_GRAFT_DRIVER_MEM.  Only effective when this factory creates
    # the JVM; an already-running session keeps its heap.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bucket-replace semantics of the trend store write path
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.showConsoleProgress", "false")
        # keep catalog-table data out of the working directory
        .config("spark.sql.warehouse.dir", "/tmp/minerva_spark_warehouse")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime conf to an externally-created
    session (e.g. the driver's).  Only touches settings that are safe to
    change mid-session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    return spark
