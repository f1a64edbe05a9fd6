"""Always-on exact substring dedup: a streaming document source
feeding the persisted digest state (round 13; the r12 verdict's ask
8 — the `streaming/embedding.py` pattern applied to the newest dedup
family).

The substring state has the embedding-state contract, not the
watermarked-digest one: a delivery must dedup against ALL history
(every shingle digest ever seen), so the streaming shape is
``foreachBatch`` driving `operators/substring.py::substring_increment`
per micro-batch — checkpointed exactly-once source-side file
tracking, the store lease serializing concurrent writers, per-epoch
decision-log partitions.

Idempotence against foreachBatch's at-least-once retries is
EXACTLY-ONCE since r16 (the CDX epoch-stamp protocol): every digest
the increment appends is stamped with its foreachBatch epoch, so a
retried delivery — whatever the crash position — recomputes its
decisions with the state MINUS its own epoch's rows as history
(equal to the original under last-batch-only replay), skips the
re-append, advances the watermark if the crash beat it, and
re-lands its decision partition idempotently.  Before r16 a
crash between the state append and the watermark write made the
retry see its own digests as history and strip the entire delivery.
Legacy states without the epoch column keep the r13 watermark
behavior (retry = no-op via the ascending-ids raise).

Stream == batch: N micro-batches produce the same kept-text outputs
as N `substring_increment` calls with the same deliveries in the
same order (pinned by the pytest twin).

Scale: state grows with DISTINCT shingles (never occurrences); per
delivery cost is one digest equi-join against history + the doc-keyed
rebuild — use the bucketed state variant when history dwarfs
deliveries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["substring_dedup_stream", "substring_batch_handler"]


def substring_batch_handler(
    state_path: str,
    decisions_path: str,
    w: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The foreachBatch handler (exposed for the crash-window
    tests): one `substring_increment` cycle per micro-batch, with
    the epoch passed through so stamped states make retries
    exactly-once; the watermark rejection remains the legacy
    (unstamped-state) no-op."""
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.substring import (
        substring_increment,
    )

    def on_batch(batch_df: DataFrame, epoch: int) -> None:
        if not batch_df.take(1):  # empty trigger: no state mutation
            return
        spark = batch_df.sparkSession
        try:
            out = substring_increment(
                spark, batch_df, state_path,
                w=w, id_col=id_col, text_col=text_col,
                epoch=int(epoch),
            )
        except ValueError as exc:
            if "watermark" in str(exc):
                return  # legacy unstamped state: retry = no-op
            raise
        (
            out.withColumn(
                "batch_id", F.lit(int(epoch)).cast("bigint")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(decisions_path)
        )

    return on_batch


def substring_dedup_stream(
    stream: DataFrame,
    state_path: str,
    decisions_path: str,
    checkpoint: str,
    w: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns an unstarted DataStreamWriter.  ``stream`` is a
    streaming DataFrame of ``(id, text)`` deliveries with ascending
    ids across deliveries (the state contract); each micro-batch runs
    one `substring_increment` cycle against ``state_path`` (which
    must exist — build it with `build_substring_state`) and lands its
    per-doc dedup output (``doc_id, n_tokens, n_removed, kept_text,
    batch_id``) in ``decisions_path``."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            substring_batch_handler(
                state_path, decisions_path,
                w=w, id_col=id_col, text_col=text_col,
            )
        )
    )
