"""Regression test for the streaming hourly tumbling-window query.

The gate row ``streaming_hourly`` once regressed when the fixture's
``events.parquet`` switched ``ts`` from an epoch-millis bigint to a
parquet TIMESTAMP while the streaming query still declared a hardcoded
``ts bigint`` read schema.  This test runs the actual streaming query
against a fixture written with a *timestamp* ts column AND against a
legacy fixture with a *bigint* epoch-millis ts column, asserting both
produce the batch-equivalent result — so any future fixture-schema
drift fails here rather than only in the driver gate.
"""

import datetime

import pyspark.sql.functions as F
import pytest

from minerva_etl_spark.gate import q_streaming_hourly


def _write_events(spark, path, ts_as_bigint: bool):
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for i in range(200):
        ts = base + datetime.timedelta(minutes=7 * i)
        rows.append((i, ts, i % 5, "click", float(i % 13), "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    if ts_as_bigint:
        df = df.withColumn(
            "ts", (F.unix_timestamp("ts") * 1000).cast("bigint")
        )
    # match the driver fixture layout: a single .parquet *file*
    tmp = str(path) + ".d"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    import glob
    import shutil

    part = glob.glob(tmp + "/part-*.parquet")[0]
    shutil.move(part, str(path))
    shutil.rmtree(tmp)


def _expected(spark, path):
    ev = spark.read.parquet(str(path))
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.col("ts") * 1000))
    return {
        (r["user_id"], r["ts"], r["samples"], r["sum_value"])
        for r in ev.groupBy(
            F.window("ts", "1 hour"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("samples"),
            F.sum(F.col("value").cast("decimal(32,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("window.end").cast("timestamp_ntz").alias("ts"),
            "samples",
            "sum_value",
        )
        .collect()
    }


@pytest.mark.parametrize("ts_as_bigint", [False, True])
def test_streaming_hourly_matches_batch(spark, tmp_path, ts_as_bigint):
    sf_dir = tmp_path / ("legacy" if ts_as_bigint else "modern")
    sf_dir.mkdir()
    _write_events(spark, sf_dir / "events.parquet", ts_as_bigint)
    out = q_streaming_hourly(spark, str(sf_dir))
    got = {
        (r["user_id"], r["ts"], r["samples"], r["sum_value"])
        for r in out.collect()
    }
    assert got == _expected(spark, sf_dir / "events.parquet")
    assert len(got) > 0
