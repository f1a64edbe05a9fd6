"""Always-on crawl indexing: a streaming capture source feeding the
bucketed CDX capture state (round 14 — the `streaming/substring.py`
pattern applied to the URL index).

Each micro-batch runs one `sources/cdx.py::ingest_captures_increment`
cycle: the delivery's captures append to the ``bucketBy(urlkey)``
state and the recrawl decisions for the touched urlkeys land in a
per-epoch decision partition — the continuously-updated scheduling
signal a live crawler consumes.

Idempotence against foreachBatch's at-least-once retries: the capture
state has no natural ascending-id watermark (captures arrive in any
timestamp order), so the wrapper records the last APPLIED epoch in a
small sidecar (Hadoop-FS, the substring `_watermark` mechanism) and a
SIDECAR-ACKNOWLEDGED epoch never re-appends captures (which would
corrupt ``n_captures``).  Such a retried epoch is NOT a pure no-op,
though: the state already carries that delta (the sidecar is written
only after the append), so the retry recomputes the recrawl
decisions FROM THE STATE restricted to the delivery's touched
urlkeys — identical to what the original call produced — and
rewrites the epoch's decision partition (an idempotent
dynamic-partition overwrite).  That closes the sidecar→decisions
crash window (r14 advice): a crash between the sidecar write and
the decisions write no longer loses the epoch's scheduling signal.
The state-append→sidecar window REMAINS the documented at-least-once
boundary (same as `streaming/embedding.py`): a crash after the
append lands but before the sidecar write makes the retry re-append
that delta — captures have no natural ascending-id watermark to
dedupe on, so exactly-once here would need an atomic
state+watermark commit the parquet state does not provide.

Stream == batch: N micro-batches produce the same decision outputs as
N `ingest_captures_increment` calls with the same deliveries in the
same order (pinned by the pytest twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["cdx_index_stream", "cdx_batch_handler"]


def _epoch_path(state_path: str) -> str:
    return state_path.rstrip("/") + ".__epoch__"


def cdx_batch_handler(
    table_name: str,
    state_path: str,
    decisions_path: str,
    n_buckets: int = 64,
):
    """The foreachBatch handler (exposed for the retry-noop test):
    one `ingest_captures_increment` cycle per micro-batch, guarded by
    the applied-epoch sidecar."""
    from pyspark.sql import functions as F

    from minerva_etl_spark.fsutil import fs_read_small, fs_write_small
    from minerva_etl_spark.sources.cdx import (
        ingest_captures_increment,
        recrawl_candidates,
    )

    def on_batch(batch_df: DataFrame, epoch: int) -> None:
        if not batch_df.take(1):  # empty trigger: no state mutation
            return
        spark = batch_df.sparkSession
        applied = fs_read_small(spark, _epoch_path(state_path))
        if applied is not None and int(epoch) <= int(applied.strip()):
            # Retried epoch: the state already carries this delta
            # (the sidecar lands only after the append), so the
            # decisions recompute from the state alone — restricted
            # to the delivery's urlkeys this equals the original
            # output — and the partition write below re-lands it.
            spark.sql(f"REFRESH TABLE {table_name}")
            keys = batch_df.select("urlkey").distinct()
            out = recrawl_candidates(
                spark.table(table_name).join(
                    F.broadcast(keys), "urlkey"
                )
            )
        else:
            out = ingest_captures_increment(
                spark, batch_df, table_name,
                n_buckets=n_buckets, path=state_path,
            )
            fs_write_small(
                spark, _epoch_path(state_path), str(int(epoch))
            )
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


def cdx_index_stream(
    stream: DataFrame,
    table_name: str,
    state_path: str,
    decisions_path: str,
    checkpoint: str,
    n_buckets: int = 64,
):
    """Returns an unstarted DataStreamWriter.  ``stream`` is a
    streaming DataFrame of capture rows (``urlkey, url, ts, status,
    digest``); each micro-batch appends to the bucketed capture state
    ``table_name`` (which must exist — build it with
    `build_capture_state`) and lands the touched-key recrawl
    decisions (+ ``batch_id``) in ``decisions_path``."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            cdx_batch_handler(
                table_name, state_path, decisions_path,
                n_buckets=n_buckets,
            )
        )
    )
