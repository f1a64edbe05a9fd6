"""Streaming exact dedup: dropDuplicatesWithinWatermark over a file
stream admits exactly one row per content digest, matching the batch
first-arrival twin's digest set."""

import datetime

import pyspark.sql.functions as F


def _docs(spark, tmp_path):
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    texts = [
        "the quick brown fox",
        "jumps over the lazy dog",
        "the  quick   brown fox",   # whitespace variant -> same digest
        "completely different text",
        "jumps over the lazy dog",  # exact duplicate
    ]
    for i, t in enumerate(texts):
        rows.append((i, base + datetime.timedelta(minutes=i), t))
    df = spark.createDataFrame(rows, "doc_id bigint, ts timestamp, text string")
    path = str(tmp_path / "stream_docs")
    df.repartition(2).write.mode("overwrite").parquet(path)
    return path, df


def test_streaming_dedup_matches_batch_twin(spark, tmp_path):
    from minerva_etl_spark.streaming.dedup import (
        dedup_batch_first_arrival,
        dedup_stream,
    )

    path, df = _docs(spark, tmp_path)
    stream = spark.readStream.schema(
        "doc_id bigint, ts timestamp, text string"
    ).parquet(path)
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_admitted")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    admitted = spark.table("dedup_admitted")
    batch = dedup_batch_first_arrival(df)
    # one admitted row per digest; digest sets agree with the batch twin
    got_keys = sorted(r.content_key for r in admitted.collect())
    want_keys = sorted(r.content_key for r in batch.collect())
    assert got_keys == want_keys
    assert len(got_keys) == 3  # 5 docs, 2 dup pairs collapse
    # the whitespace variant normalized onto its twin's digest
    a = admitted.filter(F.col("text").contains("fox")).count()
    assert a == 1
