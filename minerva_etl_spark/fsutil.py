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


def _fs(spark: SparkSession, path: str, raw: bool = False):
    """(filesystem, path, jvm) for ``path``.  ``raw=True`` unwraps the
    local ChecksumFileSystem: its ``.crc`` sidecars are NOT updated
    atomically by a failing exclusive ``create`` — a concurrent
    lease-acquire attempt can truncate the sidecar of the winner's
    lease file and poison every subsequent checksummed read.  Lease
    files carry a uuid token (self-validating), so they use the raw
    stream; real filesystems (HDFS, object stores) have no client-side
    checksum wrapper and pass through unchanged."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if raw:
        try:
            fs = fs.getRawFileSystem()
        except Exception:
            pass
    return fs, hpath, jvm


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


def _is_absent_exc(exc: Exception) -> bool:
    """True iff a py4j-raised Java exception means "file not found".

    The lease helpers probe files other writers delete concurrently —
    ``exists()`` returning True gives no guarantee the follow-up
    ``open``/``getFileStatus`` still finds the file.  That window is
    benign (the file is simply absent now), so callers translate it to
    the same ``None`` an absent file returns instead of crashing the
    waiter (the reference gets the equivalent robustness from its
    deadlock-retry loop,
    `/root/reference/src/minerva/commands/trend_store.py:1191-1196`)."""
    java_exc = getattr(exc, "java_exception", None)
    seen = set()
    while java_exc is not None and id(java_exc) not in seen:
        seen.add(id(java_exc))
        try:
            if "FileNotFound" in java_exc.getClass().getName():
                return True
            java_exc = java_exc.getCause()
        except Exception:
            break
    return "FileNotFound" in str(exc)


def fs_create_atomic(spark: SparkSession, path: str, content: str) -> bool:
    """Atomically create ``path`` with ``content``; False if it already
    exists — the test-and-set the store lease is built on.

    On HDFS (and object stores with conditional PUT committers)
    ``FileSystem.create(path, overwrite=false)`` is atomic server-side.
    On the LOCAL filesystem it is a non-atomic exists-then-create
    (``RawLocalFileSystem.create`` TOCTOU — two threads both pass the
    exists check), so local paths take ``java.io.File.createNewFile``,
    which the JDK guarantees atomic.  Content lands after the create
    wins: the marker's EXISTENCE is the lock, the token only arbitrates
    release/reclaim."""
    fs, hpath, jvm = _fs(spark, path, raw=True)
    if fs.getUri().getScheme() == "file":
        local = hpath.toUri().getPath()
        f = jvm.java.io.File(local)
        parent = f.getParentFile()
        if parent is not None:
            parent.mkdirs()
        if not f.createNewFile():
            return False
        with open(local, "w") as fh:
            fh.write(content)
        return True
    try:
        out = fs.create(hpath, False)
    except Exception as exc:  # contention only; real IO errors surface
        java_exc = getattr(exc, "java_exception", None)
        name = java_exc.getClass().getName() if java_exc else ""
        # some Hadoop FS implementations signal an existing file with a
        # plain IOException whose MESSAGE (not class) says so — treat a
        # case-insensitive "already exists" as contention too, so benign
        # create races never surface as job failures on those backends
        if "AlreadyExists" in name or "already exists" in str(exc).lower():
            return False
        raise
    try:
        out.write(bytearray(content.encode()))
    finally:
        out.close()
    return True


def fs_write_small(spark: SparkSession, path: str, content: str) -> None:
    """Write/overwrite a small text file through the Hadoop FS API
    (portable to HDFS/object stores — never a Python-local DataFrame,
    the r13 state-meta lesson).  For artifacts like tokenizer.json."""
    fs, hpath, _ = _fs(spark, path, raw=True)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode()))
    finally:
        out.close()


def fs_read_small(spark: SparkSession, path: str) -> str | None:
    """Contents of a small file (lease tokens); None if absent — even
    when another writer deletes the file between the exists-probe and
    the open (exists→open is inherently TOCTOU under contention)."""
    fs, hpath, jvm = _fs(spark, path, raw=True)
    if not fs.exists(hpath):
        return None
    try:
        stream = fs.open(hpath)
    except Exception as exc:
        if _is_absent_exc(exc):
            return None
        raise
    try:
        # py4j passes byte[] buffers by value, so a read(buf) loop never
        # fills the Python-side buffer — commons-io (on Spark's
        # classpath) drains the stream JVM-side and returns the bytes
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode()
    finally:
        stream.close()


def fs_mtime_ms(spark: SparkSession, path: str) -> int | None:
    """Modification time of ``path`` in epoch ms; None if absent — even
    when the file vanishes between exists() and getFileStatus()."""
    fs, hpath, _ = _fs(spark, path, raw=True)
    if not fs.exists(hpath):
        return None
    try:
        return int(fs.getFileStatus(hpath).getModificationTime())
    except Exception as exc:
        if _is_absent_exc(exc):
            return None
        raise


def _lease_delete(spark: SparkSession, path: str) -> None:
    """Delete a lease/marker file; concurrent-delete is success (the
    desired postcondition — file absent — already holds)."""
    fs, hpath, _ = _fs(spark, path, raw=True)
    try:
        if fs.exists(hpath):
            fs.delete(hpath, False)
    except Exception as exc:
        if not _is_absent_exc(exc):
            raise


class StoreLease:
    """Single-writer lease over one store scope (a trend-store part, the
    modified log, ...).

    The reference inherits row-level write transactionality from
    PostgreSQL and handles contention with a deadlock-retry loop
    (`/root/reference/src/minerva/commands/trend_store.py:1191-1196`;
    concurrency proven by
    `integration_tests/storage/trend/test_store_concurrent.py:60-123`).
    The parquet substrate's write-and-swap is only safe for one writer
    per scope, so concurrent writers serialize on this lease: an atomic
    marker-file create is the test-and-set, a TTL reclaims leases left
    by crashed writers, and acquisition past ``timeout`` raises the
    typed :class:`~minerva_etl_spark.errors.LockNotAvailable` (on a
    Delta/Iceberg substrate the table format's optimistic commit
    protocol replaces this file — see SCALE.md).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        timeout: float = 300.0,
        ttl: float = 3600.0,
        poll: float = 0.1,
    ) -> None:
        import uuid

        self.spark = spark
        self.path = path
        self.timeout = timeout
        self.ttl = ttl
        self.poll = poll
        self.token = uuid.uuid4().hex

    def __enter__(self) -> "StoreLease":
        import time as _time

        from minerva_etl_spark.errors import LockNotAvailable

        deadline = _time.monotonic() + self.timeout
        while True:
            if fs_create_atomic(self.spark, self.path, self.token):
                return self
            age = fs_mtime_ms(self.spark, self.path)
            if age is not None and (
                _time.time() * 1000 - age > self.ttl * 1000
            ):
                # expired lease from a crashed writer.  A bare
                # check-then-delete races: between observing staleness
                # and deleting, another waiter may have reclaimed and
                # created a FRESH lease, which we would then destroy —
                # two writers inside the critical section.  Reclaim
                # therefore runs under a short secondary mutex and
                # re-verifies the OBSERVED token before deleting: a
                # fresh lease always carries a new uuid, so the
                # token-match guarantees we only ever delete the exact
                # stale lease we saw.  (The reclaim mutex itself gets a
                # crude 60 s mtime reclaim — second-order crash risk,
                # bounded and documented.)
                observed = fs_read_small(self.spark, self.path)
                rl = self.path + ".reclaim"
                rl_age = fs_mtime_ms(self.spark, rl)
                if rl_age is not None and (
                    _time.time() * 1000 - rl_age > 60_000
                ):
                    _lease_delete(self.spark, rl)
                if observed is not None and fs_create_atomic(
                    self.spark, rl, self.token
                ):
                    try:
                        cur = fs_read_small(self.spark, self.path)
                        cur_age = fs_mtime_ms(self.spark, self.path)
                        if cur == observed and cur_age is not None and (
                            _time.time() * 1000 - cur_age
                            > self.ttl * 1000
                        ):
                            # the mutex itself has a crude 60 s mtime
                            # reclaim, so apply the same observed-token
                            # rule one level down: only delete the
                            # primary lease while the reclaim marker
                            # still carries OUR token — if another
                            # waiter reclaimed the mutex from us, it
                            # owns the reclaim section now and we must
                            # not delete a lease it may have just
                            # re-acquired
                            if (
                                fs_read_small(self.spark, rl)
                                == self.token
                            ):
                                _lease_delete(self.spark, self.path)
                    finally:
                        # release only a mutex still carrying our token
                        # (the 60 s mtime reclaim may have handed it to
                        # another waiter — deleting theirs would open
                        # the reclaim section to a third)
                        if fs_read_small(self.spark, rl) == self.token:
                            _lease_delete(self.spark, rl)
                continue
            if _time.monotonic() >= deadline:
                raise LockNotAvailable(
                    f"store lease held by another writer: {self.path}"
                )
            _time.sleep(self.poll)

    def __exit__(self, *exc) -> None:
        # release only a lease we still own (a TTL reclaim may have
        # handed it to someone else while we crashed-and-resumed)
        if fs_read_small(self.spark, self.path) == self.token:
            _lease_delete(self.spark, self.path)


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


# spark-DDL -> pyarrow type table for the metadata tables the engine
# appends driver-side (job log, modified log); extend as needed
_PA_TYPES = {
    "bigint": "int64",
    "int": "int32",
    "string": "string",
    "timestamp_ntz": "timestamp_ntz",
    "double": "float64",
}


def is_driver_local(spark: "SparkSession | None", path: str) -> bool:
    """True iff ``path`` resolves to the driver-local filesystem: an
    explicit ``file:`` scheme, or a scheme-less path whose Hadoop
    defaultFS is itself local — the SAME resolution ``parquet_exists``
    and every distributed reader/writer applies to that path.

    A scheme-less path on a cluster whose defaultFS is HDFS/S3 is NOT
    local (r16 ADVICE, medium): treating it as local would make the
    driver-side state helpers read an empty local dir as authoritative
    state and then fork the table onto the driver's local disk,
    permanently diverging from the distributed readers.  With no
    session to consult, the answer is conservatively False (callers
    fall back to their distributed paths)."""
    if path.startswith("file:"):
        return True
    if "://" in path:
        return False
    if spark is None:
        return False
    try:
        fs = spark._jvm.org.apache.hadoop.fs.FileSystem.get(
            spark._jsc.hadoopConfiguration()
        )
        return str(fs.getScheme()) == "file"
    except Exception:
        return False


def append_small_parquet(
    spark: SparkSession,
    path: str,
    rows: list[tuple],
    ddl: str,
) -> None:
    """Append a SMALL metadata table (job log entries, modified-log
    marks — driver-held rows, never corpus data) as one parquet file.

    On a local filesystem this writes directly with pyarrow — no Spark
    job, no commit protocol — which matters for ingest stories that
    append a handful of log rows per delivery (measured ~0.4 s of pure
    job overhead per Spark-side append at toy scale, ~10 ms here).  On
    any non-local filesystem (hdfs://, s3a://, ...) it falls back to a
    single-partition Spark append, same schema, so cluster deployments
    keep the committer's atomicity.

    ``ddl`` is the Spark DDL string for the rows (subset of types in
    ``_PA_TYPES``); the pyarrow schema is derived from it so Spark
    reads both file flavors back with identical types (timestamps are
    µs, no timezone -> TIMESTAMP_NTZ).
    """
    import uuid

    fields = []
    for spec in ddl.split(","):
        name, typ = spec.strip().split(None, 1)
        fields.append((name, typ.strip().lower()))
    if is_driver_local(spark, path):
        import os as _os

        import pyarrow as pa
        import pyarrow.parquet as pq

        pa_fields = []
        for name, typ in fields:
            pat = _PA_TYPES[typ]
            pa_fields.append(
                pa.field(
                    name,
                    pa.timestamp("us") if pat == "timestamp_ntz"
                    else getattr(pa, pat)(),
                )
            )
        schema = pa.schema(pa_fields)
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, pa_fields)],
            schema=schema,
        )
        target = path[len("file:"):] if path.startswith("file:") else path
        _os.makedirs(target, exist_ok=True)
        pq.write_table(
            table,
            _os.path.join(target, f"part-{uuid.uuid4().hex}.parquet"),
            compression="snappy",
        )
        return
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
        "append"
    ).parquet(path)

def write_small_parquet(
    spark: SparkSession,
    path: str,
    rows: list[tuple],
    ddl: str,
) -> bool:
    """Overwrite a SMALL metadata table driver-side: one pyarrow file
    in a tmp directory, then the same delete+rename swap as
    :func:`swap_directory_write` (identical crash window).  Returns
    False on a non-local filesystem — callers keep their distributed
    write path there (r16; guide §1.2: a per-poll Spark write job on a
    driver-held metadata table is pure job-scheduling overhead).
    Locality is resolved through the Hadoop defaultFS for scheme-less
    paths (r16 ADVICE), so a cluster deployment never forks the state
    table onto the driver's local disk."""
    import os as _os
    import shutil

    if not is_driver_local(spark, path):
        return False
    target = path[len("file:"):] if path.startswith("file:") else path
    tmp = target + "__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # append into the empty tmp dir = write one fresh file there, with
    # the same DDL->pyarrow schema derivation Spark reads back as
    # TIMESTAMP_NTZ etc.
    append_small_parquet(spark, tmp, rows, ddl)
    shutil.rmtree(target, ignore_errors=True)
    _os.rename(tmp, target)
    return True


def read_small_parquet_rows(
    path: str, columns: list[str], max_rows: int,
    spark: "SparkSession | None" = None,
) -> "list[tuple] | None":
    """Driver-side read of a SMALL local metadata table: the listed
    columns of every ``*.parquet`` file under ``path``, as Python
    tuples, with NO Spark job.  Returns ``None`` when the path is
    non-local, unreadable, or holds more than ``max_rows`` rows
    (checked from file footers before reading any data) — callers then
    keep their distributed read path; ``[]`` when the table does not
    exist yet.  Pass ``spark`` so scheme-less paths resolve through
    the Hadoop defaultFS (r16 ADVICE): on a cluster whose defaultFS is
    HDFS/S3 a missing LOCAL dir must mean "not local", never "the
    state is authoritatively empty"."""
    if not is_driver_local(spark, path):
        return None
    import glob
    import os as _os

    local = path[len("file:"):] if path.startswith("file:") else path
    if not _os.path.isdir(local):
        return []
    files = sorted(glob.glob(_os.path.join(local, "*.parquet")))
    if not files:
        return []
    try:
        import pyarrow.parquet as pq

        if sum(pq.ParquetFile(f).metadata.num_rows for f in files) > max_rows:
            return None
        out: list[tuple] = []
        for f in files:
            t = pq.read_table(f, columns=columns)
            out.extend(
                zip(*(t.column(c).to_pylist() for c in columns))
            )
        return out
    except Exception:
        return None


def write_one_row_parquet(spark, path: str, ddl: str, values) -> None:
    """One-row metadata parquet WITHOUT a Python-local DataFrame:
    ``spark.range(1)`` + literal casts plans as a single JVM task.
    The previous ``createDataFrame([...]).coalesce(1).write`` shape
    measured ~6 s PER CALL of Python-worker scheduling overhead
    (r13) — pure waste on per-delivery state-meta bumps."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Parse the DDL properly so parameterized types — decimal(10,2),
    # array<int>, ... — round-trip instead of splitting mid-type on
    # the naive ``ddl.split(',')`` (r14 ADVICE).
    struct = T._parse_datatype_string(ddl)
    if len(struct.fields) != len(values):
        raise ValueError(
            f"write_one_row_parquet: {len(struct.fields)} DDL fields "
            f"vs {len(values)} values"
        )
    cols = [
        F.lit(v).cast(f.dataType).alias(f.name)
        for f, v in zip(struct.fields, values)
    ]
    spark.range(1).select(*cols).write.mode("overwrite").parquet(path)
