"""Streaming substring dedup (`streaming/substring.py`): N
micro-batches == N `substring_increment` calls with the same
deliveries, and a retried epoch is a no-op via the state watermark."""

from pyspark.sql import functions as F  # noqa: F401


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _corpus(spark):
    span = " ".join(f"q{i}" for i in range(10))
    return _df(spark, [
        # delivery 1 (bootstrap): plants the span + a clean doc
        (1, f"alpha beta {span} gamma delta"),
        (2, " ".join(f"u{i}" for i in range(20))),
        # delivery 2: re-uses history's span, plus a clean doc
        (10, f"zero {span} one two three four five six"),
        (11, " ".join(f"v{i}" for i in range(14))),
    ]), span


def test_stream_equals_sequential_batch_increments(spark, tmp_path):
    from minerva_etl_spark.operators.substring import (
        build_substring_state,
        substring_increment,
    )
    from minerva_etl_spark.streaming.substring import (
        substring_dedup_stream,
    )

    corpus, _ = _corpus(spark)
    d1 = corpus.filter("doc_id < 10")
    d2 = corpus.filter("doc_id >= 10")

    # --- batch twin: build + one increment ---------------------------
    twin_state = str(tmp_path / "twin_state")
    twin = [
        (r.doc_id, r.n_removed, r.kept_text)
        for r in build_substring_state(
            spark, d1, twin_state, w=8
        ).collect()
    ] + [
        (r.doc_id, r.n_removed, r.kept_text)
        for r in substring_increment(
            spark, d2, twin_state, w=8
        ).collect()
    ]

    # --- stream: same deliveries as file-source micro-batches --------
    # the streaming wrapper rides an EXISTING state (the documented
    # contract), so delivery 1 seeds it and the stream starts at d1
    # too — its first epoch must therefore be delivered fresh:
    state = str(tmp_path / "state")
    build_substring_state(
        spark, d1.limit(0), state, w=8
    )  # empty bootstrap: stream owns every delivery
    src = str(tmp_path / "src")
    decisions = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")
    d1.coalesce(1).write.mode("append").parquet(src)

    def run_available():
        q = (
            substring_dedup_stream(
                spark.readStream.schema(
                    "doc_id bigint, text string"
                ).parquet(src),
                state, decisions, ckpt, w=8,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()  # delivery 1
    d2.coalesce(1).write.mode("append").parquet(src)
    run_available()  # delivery 2

    got = sorted(
        (r.doc_id, r.n_removed, r.kept_text)
        for r in spark.read.parquet(decisions).collect()
    )
    assert got == sorted(twin)
    # semantic spot check: doc 10's historic span is removed
    m = {d: n for d, n, _ in got}
    assert m[10] == 10 and m[11] == 0
    # per-delivery batch ids
    bids = {
        r.doc_id: r.batch_id
        for r in spark.read.parquet(decisions).collect()
    }
    assert bids[1] == bids[2] and bids[10] == bids[11]
    assert bids[1] != bids[10]


def test_retried_epoch_is_exactly_once(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a delivery must
    neither re-append digests nor flip decisions.  Since r16 the
    epoch stamp makes the retry re-land IDENTICAL decisions
    (recomputed with the state minus its own rows as history)."""
    from minerva_etl_spark.operators.substring import (
        build_substring_state,
    )
    from minerva_etl_spark.streaming.substring import (
        substring_batch_handler,
    )

    corpus, _ = _corpus(spark)
    d1 = corpus.filter("doc_id < 10")
    d2 = corpus.filter("doc_id >= 10")
    state = str(tmp_path / "state")
    decisions = str(tmp_path / "decisions")
    build_substring_state(spark, d1, state, w=8)
    handler = substring_batch_handler(state, decisions, w=8)
    handler(d2, 1)
    n_state = spark.read.parquet(state).count()
    caps = sorted(
        (r.doc_id, r.n_removed, r.kept_text)
        for r in spark.read.parquet(decisions).collect()
    )
    handler(d2, 1)  # the retry
    assert spark.read.parquet(state).count() == n_state
    assert sorted(
        (r.doc_id, r.n_removed, r.kept_text)
        for r in spark.read.parquet(decisions).collect()
    ) == caps


def test_crash_between_append_and_watermark_is_exactly_once(
    spark, tmp_path
):
    """THE formerly-open window: the digest append lands but the
    process dies before the watermark write.  Before r16 the retry
    saw its own digests as history and stripped the ENTIRE delivery;
    the epoch stamp makes it recompute the original decisions, skip
    the re-append, and advance the watermark."""
    from minerva_etl_spark.operators.substring import (
        _read_watermark,
        _write_watermark,
        build_substring_state,
        substring_increment,
    )
    from minerva_etl_spark.streaming.substring import (
        substring_batch_handler,
    )

    corpus, _ = _corpus(spark)
    d1 = corpus.filter("doc_id < 10")
    d2 = corpus.filter("doc_id >= 10")
    state = str(tmp_path / "state")
    decisions = str(tmp_path / "decisions")
    build_substring_state(spark, d1, state, w=8)
    floor_before = _read_watermark(spark, state)

    # epoch 1 applies fully (the reference decisions)
    want = sorted(
        (r.doc_id, r.n_removed, r.kept_text)
        for r in substring_increment(
            spark, d2, state, w=8, epoch=1
        ).collect()
    )
    n_state = spark.read.parquet(state).count()
    # ---- simulate the crash: roll the watermark back to its
    # pre-delivery value (the append + decisions stay)
    _write_watermark(spark, state, floor_before)

    handler = substring_batch_handler(state, decisions, w=8)
    handler(d2, 1)  # the retry
    got = sorted(
        (r.doc_id, r.n_removed, r.kept_text)
        for r in spark.read.parquet(decisions).collect()
    )
    assert got == want  # NOT the everything-stripped wrong output
    # doc 10 still keeps its fresh text (only the historic span
    # removed), doc 11 untouched
    m = {d: n for d, n, _ in got}
    assert m[10] == 10 and m[11] == 0
    assert spark.read.parquet(state).count() == n_state  # no dupes
    # the retry advanced the watermark past the delivery again
    assert _read_watermark(spark, state) == 11
