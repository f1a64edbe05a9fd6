"""Streaming crawl index (`streaming/cdx.py`): N micro-batches == N
`ingest_captures_increment` calls with the same deliveries, and a
retried epoch is a no-op via the applied-epoch sidecar."""

import uuid

from pyspark.sql import functions as F


def _caps(spark, rows):
    return spark.createDataFrame(
        rows, "urlkey string, url string, ts string, status int, "
              "digest string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _fixture(spark):
    d1 = _caps(spark, [
        ("test,a)/x", "https://a.test/x", "2026-02-01 00:00:00", 200,
         "d1"),
        ("test,b)/y", "https://b.test/y", "2026-02-01 01:00:00", 200,
         "d2"),
        ("test,c)/z", "https://c.test/z", "2026-02-01 02:00:00", 200,
         "d3"),
    ])
    d2 = _caps(spark, [
        ("test,a)/x", "https://a.test/x", "2026-02-02 00:00:00", 200,
         "d1b"),
        ("test,c)/z", "https://c.test/z", "2026-02-03 02:00:00", 200,
         "d3"),
    ])
    return d1, d2


def test_stream_equals_sequential_batch_increments(spark, tmp_path):
    from minerva_etl_spark.sources.cdx import (
        build_capture_state,
        ingest_captures_increment,
    )
    from minerva_etl_spark.streaming.cdx import cdx_index_stream

    d1, d2 = _fixture(spark)
    schema = ("urlkey string, url string, ts timestamp_ntz, "
              "status int, digest string")

    twin_tbl = f"cdxs_twin_{uuid.uuid4().hex[:8]}"
    tbl = f"cdxs_{uuid.uuid4().hex[:8]}"
    try:
        # batch twin: build empty, two increments
        build_capture_state(
            spark, d1.limit(0), twin_tbl, n_buckets=4,
            path=str(tmp_path / "twin_state"),
        )
        twin = []
        for d in (d1, d2):
            twin += [
                (r.urlkey, r.n_captures, r.changed, r.secs_since_prev)
                for r in ingest_captures_increment(
                    spark, d, twin_tbl, n_buckets=4,
                    path=str(tmp_path / "twin_state"),
                ).collect()
            ]

        build_capture_state(
            spark, d1.limit(0), tbl, n_buckets=4,
            path=str(tmp_path / "state"),
        )
        src = str(tmp_path / "src")
        decisions = str(tmp_path / "decisions")
        ckpt = str(tmp_path / "ckpt")
        d1.coalesce(1).write.mode("append").parquet(src)

        def run_available():
            q = (
                cdx_index_stream(
                    spark.readStream.schema(schema).parquet(src),
                    tbl, str(tmp_path / "state"), decisions, ckpt,
                    n_buckets=4,
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_available()
        d2.coalesce(1).write.mode("append").parquet(src)
        run_available()

        got = sorted(
            (r.urlkey, r.n_captures, r.changed, r.secs_since_prev)
            for r in spark.read.parquet(decisions).collect()
        )
        assert got == sorted(twin)
        # delivery 2 saw history: churn flag + capture gap present
        by_batch = {}
        for r in spark.read.parquet(decisions).collect():
            by_batch.setdefault(r.batch_id, set()).add(r.urlkey)
        assert len(by_batch) == 2
        # the appends ran in the micro-batch's cloned session; the
        # outer session's file listing needs a refresh to see them
        spark.sql(f"REFRESH TABLE {tbl}")
        assert spark.table(tbl).count() == 5
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {twin_tbl}")


def test_retried_epoch_is_a_noop(spark, tmp_path):
    """A re-delivered epoch must not double-append captures (which
    would corrupt n_captures); its decisions recompute from the
    state and RE-LAND, so a crash between the sidecar write and the
    decisions write never loses the epoch's partition."""
    import shutil

    from minerva_etl_spark.sources.cdx import build_capture_state
    from minerva_etl_spark.streaming.cdx import cdx_batch_handler

    d1, d2 = _fixture(spark)
    tbl = f"cdxs_retry_{uuid.uuid4().hex[:8]}"
    state = str(tmp_path / "state")
    decisions = str(tmp_path / "decisions")
    try:
        build_capture_state(spark, d1, tbl, n_buckets=4, path=state)
        handler = cdx_batch_handler(tbl, state, decisions, n_buckets=4)
        handler(d2, 1)
        n_state = spark.table(tbl).count()
        caps_a = {
            (r.urlkey, r.n_captures, r.changed, r.secs_since_prev)
            for r in spark.read.parquet(decisions).collect()
        }
        handler(d2, 1)  # the retry
        assert spark.table(tbl).count() == n_state
        assert ("test,a)/x", 2, True, 86400) in caps_a
        # retry re-landed an identical partition (idempotent)
        caps_b = {
            (r.urlkey, r.n_captures, r.changed, r.secs_since_prev)
            for r in spark.read.parquet(decisions).collect()
        }
        assert caps_b == caps_a
        # crash window sim: sidecar written but decisions lost —
        # the retry must recompute them from the state alone
        shutil.rmtree(str(tmp_path / "decisions" / "batch_id=1"))
        handler(d2, 1)
        assert spark.table(tbl).count() == n_state
        caps_c = {
            (r.urlkey, r.n_captures, r.changed, r.secs_since_prev)
            for r in spark.read.parquet(decisions).collect()
        }
        assert caps_c == caps_a
        # a LATER epoch still applies
        d3 = _caps(spark, [
            ("test,a)/x", "https://a.test/x", "2026-02-05 00:00:00",
             200, "d1c"),
        ])
        handler(d3, 2)
        assert spark.table(tbl).count() == n_state + 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_crash_between_append_and_sidecar_is_exactly_once(
    spark, tmp_path
):
    """THE r15 at-least-once window (the r15 verdict's ask 3): a
    crash after the state append but before the sidecar write.  The
    epoch stamp in the state lets the retry detect the landed append
    and skip it — no duplicate captures, no corrupted n_captures —
    while still landing the epoch's decisions and sidecar."""
    from minerva_etl_spark.sources.cdx import (
        build_capture_state,
        ingest_captures_increment,
    )
    from minerva_etl_spark.streaming.cdx import (
        _epoch_path,
        cdx_batch_handler,
    )
    from minerva_etl_spark.fsutil import fs_read_small

    d1, d2 = _fixture(spark)
    tbl = f"cdxs_crash_{uuid.uuid4().hex[:8]}"
    state = str(tmp_path / "state")
    decisions = str(tmp_path / "decisions")
    try:
        build_capture_state(spark, d1, tbl, n_buckets=4, path=state)
        handler = cdx_batch_handler(tbl, state, decisions, n_buckets=4)
        handler(d2, 1)
        n_state = spark.table(tbl).count()

        # ---- simulate the crash: epoch 2's append lands (stamped),
        # but the process dies before sidecar AND decisions write
        d3 = _caps(spark, [
            ("test,a)/x", "https://a.test/x", "2026-02-05 00:00:00",
             200, "d1c"),
            ("test,b)/y", "https://b.test/y", "2026-02-05 01:00:00",
             200, "d2"),
        ])
        ingest_captures_increment(
            spark, d3, tbl, n_buckets=4, path=state, epoch=2
        )
        spark.sql(f"REFRESH TABLE {tbl}")
        assert spark.table(tbl).count() == n_state + 2
        assert fs_read_small(spark, _epoch_path(state)).strip() == "1"

        # ---- the retry: must NOT re-append (exactly-once), must
        # advance the sidecar, must land epoch 2's decisions
        handler(d3, 2)
        spark.sql(f"REFRESH TABLE {tbl}")
        assert spark.table(tbl).count() == n_state + 2  # no dupes
        assert fs_read_small(spark, _epoch_path(state)).strip() == "2"
        got = {
            (r.urlkey, r.n_captures, r.changed)
            for r in spark.read.parquet(decisions)
            .filter("batch_id = 2").collect()
        }
        # a)/x: 3 captures (d1, d1b, d1c) with digest churn on the
        # last step; b)/y: 2 captures, unchanged digest
        assert got == {("test,a)/x", 3, True), ("test,b)/y", 2, False)}
        # n_captures stayed honest THROUGH the crash+retry: a
        # re-append would have read 4 here
        assert (
            spark.table(tbl).filter("urlkey = 'test,a)/x'").count() == 3
        )

        # ---- an OLDER-epoch redelivery is a pure no-op (r15
        # advice): it must not rewrite its partition from newer state
        import shutil

        shutil.rmtree(str(tmp_path / "decisions" / "batch_id=1"))
        handler(d2, 1)
        spark.sql(f"REFRESH TABLE {tbl}")
        assert spark.table(tbl).count() == n_state + 2
        assert fs_read_small(spark, _epoch_path(state)).strip() == "2"
        assert (
            spark.read.parquet(decisions)
            .filter("batch_id = 1").count() == 0
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
