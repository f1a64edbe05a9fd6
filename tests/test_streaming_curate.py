"""Streaming curation twin: the quality + Gopher + dedup gauntlet
applied per micro-batch over a TWO-DELIVERY ingest equals the at-rest
batch formulation over the union — including dedup state carried
across deliveries through the checkpoint."""

import datetime


def _mk_text(seed: int, n_words: int = 60) -> str:
    """Gopher-passing prose: ≥50 words, mean word length in range,
    stopwords present, fully alphabetic."""
    words = []
    fillers = ["the", "and", "of", "have", "with", "that"]
    for i in range(n_words):
        words.append(fillers[i % len(fillers)])
        words.append(f"token{(seed * 13 + i) % 97}word")
    return " ".join(words)


def _rows():
    base = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        # delivery 1
        (1, base, _mk_text(1)),
        (2, base + datetime.timedelta(minutes=1), "too short to pass"),
        (3, base + datetime.timedelta(minutes=2), _mk_text(3)),
        (4, base + datetime.timedelta(minutes=3), _mk_text(1)),  # dup of 1
        # delivery 2
        (5, base + datetime.timedelta(minutes=4), _mk_text(3)),  # dup of 3
        (6, base + datetime.timedelta(minutes=5), _mk_text(6)),
        (7, base + datetime.timedelta(minutes=6), "#@# " * 70),  # symbols
    ]
    return rows


def test_streaming_curation_matches_batch_twin(spark, tmp_path):
    from minerva_etl_spark.streaming.curate import (
        curate_batch_twin,
        curate_stream,
    )

    schema = "doc_id bigint, ts timestamp, text string"
    rows = _rows()
    df_all = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")

    out_path = str(tmp_path / "curated")
    for lo, hi in ((0, 4), (4, 7)):  # two deliveries
        spark.createDataFrame(rows[lo:hi], schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        stream = spark.readStream.schema(schema).parquet(path)
        # a real file sink (not the test-only memory sink): it supports
        # restarting from the checkpoint, which is what carries dedup
        # state across deliveries
        q = (
            curate_stream(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .option("path", out_path)
            .start()
        )
        q.awaitTermination(120)
    admitted = spark.read.parquet(out_path).collect()
    admitted_keys = [r.content_key for r in admitted]
    admitted_ids = [r.doc_id for r in admitted]

    batch = curate_batch_twin(df_all).collect()
    assert sorted(admitted_keys) == sorted(r.content_key for r in batch)
    # filters bit (2: short, 7: symbols) and dedup bit (4 dups 1 across
    # the SAME delivery, 5 dups 3 across DELIVERIES via checkpoint state)
    assert sorted(admitted_ids) == [1, 3, 6]
    assert sorted(r.doc_id for r in batch) == [1, 3, 6]
    # model_logit rides along for downstream reporting
    assert all(r.model_logit is not None for r in batch)
