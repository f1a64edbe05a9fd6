"""Stateful streaming edge trigger (batch + streaming paths), salted
aggregation equivalence, retention drop."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.operators.skew import salted_aggregate
from minerva_etl_spark.store.trendstore import TrendStore, TrendStorePart
from minerva_etl_spark.streaming.stateful import (
    edge_trigger_batch,
    edge_trigger_stream,
)


def ts(*args):
    return datetime(*args)


EDGE_ROWS = [
    (1, ts(2024, 1, 1, 0, 0), 10.0),   # below
    (1, ts(2024, 1, 1, 0, 15), 60.0),  # rising
    (1, ts(2024, 1, 1, 0, 30), 70.0),  # (still above: silent)
    (1, ts(2024, 1, 1, 0, 45), 20.0),  # falling
    (2, ts(2024, 1, 1, 0, 0), 90.0),   # rising (first row already above)
]


def test_edge_trigger_batch(spark):
    df = spark.createDataFrame(
        EDGE_ROWS, "entity_id bigint, timestamp timestamp, value double"
    )
    out = edge_trigger_batch(df, threshold=50.0)
    got = sorted((r.entity_id, r.timestamp.minute, r.edge) for r in out.collect())
    assert got == [(1, 15, "rising"), (1, 45, "falling"), (2, 0, "rising")]


def test_edge_trigger_stream_matches_batch(spark, tmp_path):
    src_dir = tmp_path / "stream_src"
    df = spark.createDataFrame(
        EDGE_ROWS, "entity_id bigint, timestamp timestamp, value double"
    )
    df.coalesce(1).write.parquet(str(src_dir))

    stream = (
        spark.readStream.schema("entity_id bigint, timestamp timestamp, value double")
        .parquet(str(src_dir))
    )
    out = edge_trigger_stream(stream, threshold=50.0)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("edges")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.entity_id, r.timestamp.minute, r.edge)
        for r in spark.sql("SELECT * FROM edges").collect()
    )
    assert got == [(1, 15, "rising"), (1, 45, "falling"), (2, 0, "rising")]


def test_salted_aggregate_equivalence(spark):
    # hot key 1 with many rows + long tail
    rows = [(1, float(i % 7)) for i in range(500)] + [
        (k, float(k)) for k in range(2, 30)
    ]
    df = spark.createDataFrame(rows, "k int, v double").repartition(8)
    salted = salted_aggregate(
        df,
        keys=["k"],
        aggs={
            "n": ("count", "v"),
            "sum_v": ("sum_decimal", "v"),
            "max_v": ("max", "v"),
        },
        salt_buckets=8,
    )
    direct = df.groupBy("k").agg(
        F.count("v").cast("bigint").alias("n"),
        F.sum(F.col("v").cast("decimal(32,6)")).cast("double").alias("sum_v"),
        F.max("v").alias("max_v"),
    )
    s = {r.k: (r.n, r.sum_v, r.max_v) for r in salted.collect()}
    d = {r.k: (r.n, r.sum_v, r.max_v) for r in direct.collect()}
    assert s == d


def test_retention_drop(spark, tmp_path):
    store = TrendStore(
        data_source="hub", entity_type="node", granularity="15m",
        parts=[TrendStorePart("main", ["v"])],
        base_path=str(tmp_path),
        retention_period="1w",
    )
    pkg = spark.createDataFrame(
        [
            (1, ts(2024, 1, 1, 1), 1.0),
            (1, ts(2024, 3, 1, 1), 2.0),
        ],
        "entity_id bigint, timestamp timestamp_ntz, v double",
    )
    store.store(spark, pkg)
    dropped = store.drop_expired(spark, "main", now=ts(2024, 3, 5))
    assert len(dropped) == 1
    left = store.read_part(spark, "main").collect()
    assert len(left) == 1 and left[0].v == 2.0
