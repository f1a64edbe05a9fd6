"""Filesystem helpers for first-read probes.

The store/materialization layers must answer "does this dataset exist
yet?" on every first read.  Probing with a caught
``spark.read.parquet`` AnalysisException works but makes the JVM log a
full stack trace per probe, burying real errors in driver/bench logs.
The Hadoop FileSystem API answers the same question silently and works
on any supported filesystem (local, HDFS, s3a, ...), so the probe is
cluster-portable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its Hadoop filesystem."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def parquet_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds at least one parquet data file.

    An append of an EMPTY DataFrame creates the directory with only a
    ``_SUCCESS`` marker — existence alone would then send the reader
    into UNABLE_TO_INFER_SCHEMA.  The recursive listing is the same
    driver-side metadata walk the parquet reader performs anyway.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if name.endswith(".parquet"):
            return True
    return False
