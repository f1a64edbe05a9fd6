"""Streaming exact deduplication for document ingest.

The batch dedup operators (`operators/dedup.py`) assume the corpus is
at rest; an always-on ingest pipeline wants the streaming shape: keep
the FIRST arrival of each distinct (normalized) content digest and drop
later duplicates as they arrive, with state bounded by a watermark —
Structured Streaming's ``dropDuplicatesWithinWatermark`` is the native
home for that (digest-keyed state store, expired by event time, exactly
the bounded-state posture a 100 TB/day crawl ingest needs; unbounded
``dropDuplicates`` state would grow with the corpus).

The digest matches :func:`operators.dedup.exact_dedup`'s normalized
content key (md5 over the whitespace-normalized token stream), so a
document admitted by the stream and one admitted by a batch backfill
dedup against the same key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from minerva_etl_spark.operators.text import tokens_spark_sql


def with_content_key(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the normalized content digest used by batch exact dedup."""
    return df.withColumn(
        "content_key",
        F.md5(F.array_join(F.expr(tokens_spark_sql(text_col)), " ")),
    )


def dedup_stream(
    stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """First-arrival-wins streaming exact dedup.

    ``stream`` is a streaming DataFrame with an event-time column; the
    result keeps one row per content digest within the watermark
    horizon — the first in ARRIVAL (processing) order, which is how
    `dropDuplicatesWithinWatermark` resolves a digest seen across
    micro-batches.  The batch twin below orders by EVENT time, so for
    out-of-order arrivals the two admit the same digest set but may
    pick different representative rows; reconcile on ``content_key``,
    not row identity.  State is per-digest and expires ``watermark``
    past the event-time high mark — a late duplicate beyond the horizon
    is re-admitted (the stream's honesty boundary; a periodic batch
    `exact_dedup` compaction closes it, same division of labor as the
    reference's staged/compact attribute path).
    """
    keyed = with_content_key(stream, text_col)
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_key"]
    )


def dedup_batch_first_arrival(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Batch twin of :func:`dedup_stream` (verification shape): the
    first row per content digest by (event time, id) order.  Matches
    the stream's admitted DIGEST SET whenever every duplicate falls
    inside the watermark; the representative row also matches when
    arrival order equals event order (out-of-order streams may admit a
    later-timestamped representative — see :func:`dedup_stream`)."""
    from pyspark.sql import Window

    keyed = with_content_key(df, text_col)
    w = Window.partitionBy("content_key").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
