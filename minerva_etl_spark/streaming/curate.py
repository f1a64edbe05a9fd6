"""Streaming curation: quality filter → Gopher rules → exact dedup as
ONE always-on pipeline.

The batch curation pipeline (`operators/pipeline.py::curate_corpus`)
assumes the corpus is at rest; a live crawl ingest wants the same
gauntlet applied per micro-batch.  The quality classifier and the
Gopher rules are stateless scan-projects, so they apply to a streaming
DataFrame unchanged (whole-stage codegen, zero state); only the dedup
tail carries state — the watermark-bounded digest store of
:func:`~minerva_etl_spark.streaming.dedup.dedup_stream`.  At 100 TB/day
that ordering also minimizes state: documents rejected by the
filters never enter the dedup state store.

Verification: :func:`curate_batch_twin` is the at-rest formulation of
the identical gauntlet; the two-delivery pytest pins stream == batch
over a split delivery (the curation analog of `streaming_hourly`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from minerva_etl_spark.operators.text import classify_quality, with_gopher_keep
from minerva_etl_spark.streaming.dedup import (
    dedup_batch_first_arrival,
    dedup_stream,
)


def _filtered(df: DataFrame, text_col: str) -> DataFrame:
    """Quality + Gopher gauntlet, keeping only the caller's columns plus
    ``model_logit`` — stateless, so it works on batch AND streaming
    frames identically (the twin guarantee reduces to `dedup_stream`'s
    own)."""
    cols = df.columns
    scored = classify_quality(df, text_col)
    scored = scored.filter(F.col("keep")).select(*cols, "model_logit")
    gated = with_gopher_keep(scored, text_col)
    return gated.filter(F.col("gopher_keep")).drop("gopher_keep")


def curate_stream(
    stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming curation gauntlet.  ``stream`` is a streaming
    DataFrame with an event-time column; the result admits documents
    that pass the model-based quality filter AND every Gopher rule AND
    are the first arrival of their normalized content digest within the
    watermark horizon.  Output: input columns + ``model_logit`` +
    ``content_key``."""
    return dedup_stream(
        _filtered(stream, text_col), watermark, ts_col, text_col
    )


def curate_batch_twin(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """At-rest twin of :func:`curate_stream` (verification shape):
    identical filters, then first-row-per-digest by (event time, id).
    Matches the stream's admitted digest set whenever duplicates fall
    inside the watermark (see `dedup_stream` for the representative-row
    caveat on out-of-order arrivals)."""
    return dedup_batch_first_arrival(
        _filtered(df, text_col), ts_col, id_col, text_col
    )
