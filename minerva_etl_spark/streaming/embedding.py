"""Always-on embedding near-dup: a streaming vector source feeding
the persisted LSH-bucket state (round 11).

`streaming/dedup.py` bounds its exact-dedup state with a watermark —
right for content digests, where a late duplicate past the horizon
is an acceptable re-admit.  Embedding near-dup has the OPPOSITE
contract: a delivery must dedup against ALL history (the
`incremental.py` protocol — state holds every ingested vector,
kept and dropped alike, so decisions equal a full recompute).  A
watermarked state store cannot express that, so the streaming shape
is ``foreachBatch`` driving `ingest_embedding_increment` per
micro-batch: the checkpoint gives exactly-once SOURCE-side file
tracking, the store lease serializes concurrent writers, and each
batch's decisions land in a per-epoch partition of the decision log.

Sink-side semantics: EXACTLY-ONCE against foreachBatch retries
since r16 (the CDX epoch-stamp protocol) — every appended state row
carries its epoch, so `ingest_embedding_increment` distinguishes a
crash before the append (normal re-run), between the append and the
epoch marker (re-append SKIPPED — the formerly-open window), and
after the marker (decisions recompute from state-minus-this-epoch,
equal to the original under last-batch-only replay).  A retried
epoch therefore always RETURNS its decisions again, and the
decision log's ``batch_id=<epoch>`` dynamic-overwrite partition
re-lands them idempotently — no crash position loses an epoch's
decisions or double-appends its vectors.  Legacy (pre-epoch-column)
states keep the old marker-no-op behavior.

Stream == batch: N micro-batches through this wrapper produce the
same decisions as N calls to `ingest_embedding_increment` with the
same deliveries in the same order (pinned by the pytest twin).
Within one micro-batch, lower-id-wins ordering comes from the
increment operator itself, so arrival jitter inside a batch cannot
flip a decision.

Scale: state grows with the corpus (by design — it IS the dedup
history), ~(8B id + bucket + norm + vector) per vector; pair cost
per delivery is the LSH bucket equi-join against history, never
all-pairs.  Use the int8-quantized IVF state (`operators/
quantize.py`) when the vector payload dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["embedding_dedup_stream"]


def embedding_dedup_stream(
    stream: DataFrame,
    state_path: str,
    decisions_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
):
    """Returns an unstarted DataStreamWriter.  ``stream`` is a
    streaming DataFrame of ``(id, vector)`` deliveries; each
    micro-batch runs one `ingest_embedding_increment` cycle against
    ``state_path`` and appends its decisions (``vec_id,
    near_dup_of, keep, batch_id``) to ``decisions_path``."""
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.incremental import (
        ingest_embedding_increment,
    )

    def on_batch(batch_df: DataFrame, epoch: int) -> None:
        if not batch_df.take(1):  # empty trigger: no state append
            return
        spark = batch_df.sparkSession
        decisions = ingest_embedding_increment(
            spark, batch_df, state_path,
            id_col=id_col, vec_col=vec_col, threshold=threshold,
            epoch=int(epoch),
        )
        if decisions is None:  # retried, already-committed epoch
            return
        # per-epoch partition + dynamic overwrite: a re-run epoch
        # replaces its own rows, never duplicates them
        (
            decisions.withColumn(
                "batch_id", F.lit(int(epoch)).cast("bigint")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(decisions_path)
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(on_batch)
    )
