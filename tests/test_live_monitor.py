"""Live monitor: poll loop and the Structured Streaming watcher driving
the fingerprint engine; store edge cases."""

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.materialize.fingerprint import (
    Materialization,
    MaterializationEngine,
)
from minerva_etl_spark.store.trendstore import TrendStore, TrendStorePart
from minerva_etl_spark.streaming.live_monitor import run_loop, watch_stream

LOG_SCHEMA = "part string, timestamp timestamp_ntz, modified timestamp_ntz"


def utcnow():
    return datetime.now(timezone.utc).replace(tzinfo=None)


def make_engine(spark, tmp_path, calls):
    eng = MaterializationEngine(spark, str(tmp_path / "state"))

    def transform(spark_, timestamps):
        calls.append(sorted(timestamps))
        return spark_.createDataFrame(
            [(t,) for t in timestamps], "timestamp timestamp_ntz"
        )

    eng.register(
        Materialization(
            name="m1",
            target_gran=Granularity.parse("1h"),
            sources=["p1"],
            transform=transform,
            processing_delay=timedelta(0),
            stability_delay=timedelta(0),
            reprocessing_period=timedelta(days=100000),
        )
    )
    return eng


def test_run_loop_polls_and_processes(spark, tmp_path):
    calls = []
    eng = make_engine(spark, tmp_path, calls)
    log_df = spark.createDataFrame(
        [("p1", datetime(2024, 1, 1, 0, 15), utcnow() - timedelta(minutes=1))],
        LOG_SCHEMA,
    )
    done = run_loop(
        eng,
        read_log=lambda: log_df,
        sink=lambda *a: None,
        poll_seconds=0.01,
        max_cycles=3,
    )
    # first cycle materializes, later cycles see a clean fingerprint
    assert done == 1
    assert calls == [[datetime(2024, 1, 1, 1, 0)]]


def test_watch_stream_drives_engine(spark, tmp_path):
    calls = []
    eng = make_engine(spark, tmp_path, calls)
    log_dir = str(tmp_path / "modified_log")
    spark.createDataFrame(
        [("p1", datetime(2024, 1, 1, 0, 15), utcnow() - timedelta(minutes=1))],
        LOG_SCHEMA,
    ).write.mode("append").parquet(log_dir)

    writer = watch_stream(
        spark, eng, log_dir, LOG_SCHEMA,
        sink=lambda *a: None,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q = writer.start()
    try:
        q.processAllAvailable()
        assert calls == [[datetime(2024, 1, 1, 1, 0)]]
        # late data arrives -> new micro-batch -> re-materialization
        spark.createDataFrame(
            [("p1", datetime(2024, 1, 1, 0, 30), utcnow())], LOG_SCHEMA
        ).write.mode("append").parquet(log_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    assert calls == [
        [datetime(2024, 1, 1, 1, 0)],
        [datetime(2024, 1, 1, 1, 0)],  # same target bucket, new fingerprint
    ]


def test_store_empty_package_noop(spark, tmp_path):
    store = TrendStore(
        data_source="hub", entity_type="node", granularity="15m",
        parts=[TrendStorePart("main", ["v"])],
        base_path=str(tmp_path),
    )
    empty = spark.createDataFrame(
        [], "entity_id bigint, timestamp timestamp_ntz, v double"
    )
    store.store(spark, empty)  # must not raise
    df = store.read_part(spark, "main")
    assert df is None or df.count() == 0


def test_store_package_without_part_columns(spark, tmp_path):
    store = TrendStore(
        data_source="hub", entity_type="node", granularity="15m",
        parts=[TrendStorePart("main", ["v"])],
        base_path=str(tmp_path),
    )
    other = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 2.0)],
        "entity_id bigint, timestamp timestamp_ntz, unrelated double",
    )
    store.store(spark, other)  # no overlapping columns -> part untouched
    assert store.read_part(spark, "main") is None


def test_streaming_csv_ingest(spark, tmp_path):
    """Always-on ingest: CSV files landing in a directory stream into
    the trend store; a late file upserts and re-marks the bucket."""
    from minerva_etl_spark.sources.csv_harvest import CsvParserConfig
    from minerva_etl_spark.streaming.ingest import ingest_stream

    csv_dir = tmp_path / "landing"
    csv_dir.mkdir()
    store = TrendStore(
        data_source="hub", entity_type="node", granularity="15m",
        parts=[TrendStorePart("main", ["power_kwh"])],
        base_path=str(tmp_path / "data"),
    )
    cfg = CsvParserConfig(
        identifier_column="node", timestamp_column="timestamp",
        entity_type="node", column_types={"power_kwh": "double precision"},
    )
    (csv_dir / "f1.csv").write_text(
        "node,timestamp,power_kwh\n"
        "n1,2024-01-01 00:15:00,1.0\n"
        "n2,2024-01-01 00:15:00,2.0\n"
    )
    writer = ingest_stream(
        spark, str(csv_dir), cfg, store,
        checkpoint=str(tmp_path / "ckpt"),
        columns=["node", "timestamp", "power_kwh"],
    )
    q = writer.start()
    try:
        q.processAllAvailable()
        assert store.read_part(spark, "main").count() == 2
        # late file: replaces n1's value, adds n3
        (csv_dir / "f2.csv").write_text(
            "node,timestamp,power_kwh\n"
            "n1,2024-01-01 00:15:00,9.0\n"
            "n3,2024-01-01 00:30:00,3.0\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = store.read_part(spark, "main").collect()
    assert len(rows) == 3  # upsert replaced n1, appended n3
    by_val = sorted(r.power_kwh for r in rows)
    assert by_val == [2.0, 3.0, 9.0]
    # two distinct buckets marked across the two batches (plus re-mark)
    log = store.read_modified_log(spark)
    assert log.select("timestamp").distinct().count() == 2
