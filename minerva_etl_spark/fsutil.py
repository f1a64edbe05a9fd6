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


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def fs_delete(spark: SparkSession, path: str) -> None:
    fs, hpath, _ = _fs(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def fs_rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Metadata-only move (local FS rename / HDFS rename; object stores
    substitute their committer — the swap stays O(partitions), not
    O(bytes), everywhere a real rename exists)."""
    fs, hsrc, jvm = _fs(spark, src)
    return bool(fs.rename(hsrc, jvm.org.apache.hadoop.fs.Path(dst)))


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, hpath, _ = _fs(spark, path)
    fs.mkdirs(hpath)


def fs_listdir(spark: SparkSession, path: str) -> list[str]:
    """Child names (not full paths) of a directory; [] if absent."""
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def swap_directory_write(spark: SparkSession, write, final: str) -> None:
    """Full-table overwrite via temp-path write-and-swap.

    ``write(tmp_path)`` materializes the new table beside the old one,
    then two metadata-only FS ops swap it in.  Unlike an eager
    ``localCheckpoint`` + in-place overwrite (which must hold the whole
    frame in executor storage to break lineage from the files being
    replaced), the frame streams through the shuffle to disk — executor
    memory stays bounded at any table size.  Crash window: between the
    delete and the rename the table is only in the tmp directory —
    single-writer recovery is a rename, the same guarantee class as the
    reference's transactional TRUNCATE+INSERT.
    """
    tmp = final + "__tmp"
    fs_delete(spark, tmp)
    write(tmp)
    fs_delete(spark, final)
    fs_rename(spark, tmp, final)


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
