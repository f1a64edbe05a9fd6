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


def test_retried_epoch_is_a_noop(spark, tmp_path):
    """foreachBatch is at-least-once: a micro-batch retried AFTER its
    state append must not re-append its vectors or flip decisions —
    the per-epoch marker committed inside the lease makes the retry a
    no-op (returns None)."""
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

    # the retry: same epoch, same payload — must be rejected
    retry = ingest_embedding_increment(
        spark, batch, state, epoch=7
    )
    assert retry is None
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
