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

Idempotence against foreachBatch's at-least-once retries rides the
state's OWN delivery watermark (r13): a retried epoch re-delivers doc
ids at or below the recorded watermark, `substring_increment` raises
its ascending-ids error, and the wrapper treats that as
"already applied" and skips — so a retry never double-mutates the
digest state.  The one remaining window is a crash between the state
append and the decision write (the same boundary
`streaming/embedding.py` documents; closing it needs a transactional
substrate — see the Delta MERGE dispatch note in `operators/
upsert.py`).

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
    """The foreachBatch handler (exposed for the retry-noop test):
    one `substring_increment` cycle per micro-batch; a watermark
    rejection (re-delivered epoch) is a documented no-op."""
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
            )
        except ValueError as exc:
            if "watermark" in str(exc):
                return  # retried epoch: state already carries it
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
