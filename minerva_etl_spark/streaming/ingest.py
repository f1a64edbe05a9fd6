"""Always-on ingest: a streaming CSV directory feeding the trend store.

The reference's loader is batch per-file; its live deployment shape is
"a directory where files keep landing".  Structured Streaming's file
source gives exactly that: new CSV files become micro-batches, each
batch runs the same normalize → upsert path as the batch loader
(`foreachBatch` with exactly-once SOURCE-side file tracking from the
checkpoint).

Retry semantics (r16 note — why this wrapper needs no epoch stamp,
unlike the unbounded-state families in `streaming/cdx.py` /
`substring.py` / `embedding.py`): `TrendStore.store` is an UPSERT on
(entity_id, timestamp) with dynamic partition overwrite, so a
retried micro-batch re-lands byte-equivalent rows over themselves —
idempotent by key, no append to duplicate and no decision output to
lose.  Only the bookkeeping `created` column moves on a retry
(last-wins, the store's documented semantics).

Downstream incrementality needs nothing new: every store marks the
modified log, which the live-monitor watcher already turns into
re-materializations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from minerva_etl_spark.sources.csv_harvest import (
    CsvParserConfig,
    normalize_frame,
)
from minerva_etl_spark.catalog import datatypes as dt
from minerva_etl_spark.store.trendstore import TrendStore


def ingest_stream(
    spark: SparkSession,
    csv_dir: str,
    config: CsvParserConfig,
    store: TrendStore,
    checkpoint: str,
    columns: list[str],
    column_types: dict[str, str] | None = None,
):
    """Returns an unstarted DataStreamWriter ingesting ``csv_dir``.

    ``columns``: the CSV header order (streams need a declared schema);
    ``column_types``: minerva type name per metric column (default:
    ``config.column_types`` or text).
    """
    raw_schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in columns]
    )
    types = {
        c: dt.REGISTRY[
            (column_types or config.column_types).get(c, "text").lower()
        ]
        for c in columns
        if c not in (config.identifier_column, config.timestamp_column)
    }

    stream = (
        spark.readStream.schema(raw_schema)
        .option("header", True)
        .option("delimiter", config.delimiter)
        .csv(csv_dir)
    )

    def on_batch(batch_df: DataFrame, _epoch: int) -> None:
        frame = normalize_frame(batch_df, config, types)
        metric_cols = [
            c for c in frame.columns
            if c not in ("entity_id", "entity_ref", "timestamp")
        ]
        store.store(
            batch_df.sparkSession if hasattr(batch_df, "sparkSession") else spark,
            frame.select("entity_id", "timestamp", *metric_cols),
            job_id=_epoch,
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(on_batch)
    )
