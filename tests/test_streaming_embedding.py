"""Streaming embedding near-dup: foreachBatch over the persisted
LSH-bucket state — N micro-batches produce the SAME decisions as N
batch `ingest_embedding_increment` calls with the same deliveries."""

from pyspark.sql import functions as F


def _vectors(spark):
    # bucket structure: 0/1/2 share a sign pattern (0 is the lowest
    # id, so 1 and 2 near-dup onto it); 3 is orthogonal-ish; 10 is a
    # later-delivery duplicate of 0; 11 is novel
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 1.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (2, [1.1, 0.9, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (10, [1.0, 1.0, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (11, [0.0, -1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_stream_equals_sequential_batch_ingest(spark, tmp_path):
    from minerva_etl_spark.operators.incremental import (
        ingest_embedding_increment,
    )
    from minerva_etl_spark.streaming.embedding import (
        embedding_dedup_stream,
    )

    vecs = _vectors(spark)
    d1 = vecs.filter("vec_id < 10")
    d2 = vecs.filter("vec_id >= 10")

    # --- batch twin: two sequential ingest cycles -------------------
    twin_state = str(tmp_path / "twin_state")
    twin = []
    for d in (d1, d2):
        twin += [
            (r.vec_id, r.near_dup_of, r.keep)
            for r in ingest_embedding_increment(
                spark, d, twin_state
            ).collect()
        ]

    # --- stream: the same two deliveries as file-source batches -----
    src = str(tmp_path / "src")
    d1.coalesce(1).write.mode("append").parquet(src)
    state = str(tmp_path / "state")
    decisions = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        q = (
            embedding_dedup_stream(
                spark.readStream.schema(
                    "vec_id bigint, embedding array<double>"
                ).parquet(src),
                state, decisions, ckpt,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()  # delivery 1
    d2.coalesce(1).write.mode("append").parquet(src)
    run_available()  # delivery 2 (checkpoint skips delivery-1 files)

    got = sorted(
        (r.vec_id, r.near_dup_of, r.keep)
        for r in spark.read.parquet(decisions).collect()
    )
    assert got == sorted(twin)
    # semantic spot checks: delivery 1 is the BOOTSTRAP (no history
    # yet -> everything kept, the documented ingest semantics);
    # delivery 2 decides against that history: 10 dups onto the
    # lowest bucket-mate (0), 11 is novel
    m = {v: (n, k) for v, n, k in got}
    assert m[0] == (None, True) and m[3] == (None, True)
    assert m[1] == (None, True) and m[2] == (None, True)
    assert m[10] == (0, False)
    assert m[11] == (None, True)
    # the state holds EVERY ingested vector (kept and dropped)
    assert spark.read.parquet(state).count() == 6
    # batch ids recorded per delivery
    bids = {
        r.vec_id: r.batch_id
        for r in spark.read.parquet(decisions).collect()
    }
    assert bids[0] == bids[3] and bids[10] == bids[11]
    assert bids[0] != bids[10]


def test_retried_epoch_is_exactly_once(spark, tmp_path):
    """foreachBatch is at-least-once: a micro-batch retried AFTER its
    state append must not re-append its vectors or flip decisions.
    Since r16 (the epoch-stamp protocol) the retry RETURNS its
    decisions again — recomputed from state-minus-this-epoch, equal
    to the originals — so the caller's dynamic-overwrite partition
    re-lands instead of going missing when the crash beat the
    decision write."""
    from minerva_etl_spark.operators.incremental import (
        ingest_embedding_increment,
    )

    state = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8)],
        "vec_id bigint, embedding array<double>",
    )
    first = ingest_embedding_increment(
        spark, batch, state, epoch=7
    )
    assert first is not None and first.count() == 2
    assert spark.read.parquet(state).count() == 2
    orig = sorted(
        (r.vec_id, r.near_dup_of, r.keep) for r in first.collect()
    )

    # the retry: same epoch, same payload — no re-append, and the
    # decisions come back IDENTICAL (not None: a crash between the
    # marker and the decision write must be recoverable)
    retry = ingest_embedding_increment(
        spark, batch, state, epoch=7
    )
    assert retry is not None
    assert sorted(
        (r.vec_id, r.near_dup_of, r.keep) for r in retry.collect()
    ) == orig
    assert spark.read.parquet(state).count() == 2  # NOT 4

    # the next epoch proceeds normally
    nxt = ingest_embedding_increment(
        spark,
        spark.createDataFrame(
            [(2, [1.0] * 8)], "vec_id bigint, embedding array<double>"
        ),
        state,
        epoch=8,
    )
    assert nxt is not None
    assert spark.read.parquet(state).count() == 3


def test_crash_between_append_and_marker_is_exactly_once(
    spark, tmp_path
):
    """THE formerly-open window: the state append lands but the
    process dies before the epoch marker.  The epoch stamp in the
    state lets the retry detect the landed append, skip the
    re-append, drop the marker, and return the original decisions —
    including a near-dup decision that a naive re-run would have
    flipped (the vector would match ITSELF in history)."""
    import os

    from minerva_etl_spark.operators.incremental import (
        ingest_embedding_increment,
    )

    state = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id bigint, embedding array<double>"
    )
    assert ingest_embedding_increment(
        spark, base, state, epoch=1
    ).count() == 1

    # epoch 2: one fresh vector + one near-dup of history
    d2 = spark.createDataFrame(
        [(10, [-1.0] * 8), (11, [1.0] * 8)],
        "vec_id bigint, embedding array<double>",
    )
    first = ingest_embedding_increment(spark, d2, state, epoch=2)
    orig = sorted(
        (r.vec_id, r.near_dup_of, r.keep) for r in first.collect()
    )
    assert orig == [(10, None, True), (11, 0, False)]
    # ---- simulate the crash: delete the epoch-2 marker (the append
    # already landed)
    marker = f"{state}.__epochs/2"
    assert os.path.exists(marker)
    os.remove(marker)

    retry = ingest_embedding_increment(spark, d2, state, epoch=2)
    assert retry is not None
    got = sorted(
        (r.vec_id, r.near_dup_of, r.keep) for r in retry.collect()
    )
    # identical decisions: 11 still dups against vec 0, NOT against
    # its own stamped copy (which would read near_dup_of=10 or self)
    assert got == orig
    assert spark.read.parquet(state).count() == 3  # no duplicates
    assert os.path.exists(marker)  # the retry completed the commit
