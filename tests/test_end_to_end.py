"""The SURVEY §7 step-1 spine, end-to-end through the engine:

CSV sample (reference tiny_instance shape) → harvest parse + entity-id
resolution → trend-store upsert → modified log → fingerprint
materialization of a KPI (power_mwh = power_kwh * 1000, the reference's
`hub-kpi_node_15m.yaml`) → 1h time-aggregation rung → threshold trigger
→ notification store.  Mirrors `integration_tests/test_data_loading.py`
+ the materialize path, with the platform swapped for Spark+parquet.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.materialize.fingerprint import (
    Materialization,
    MaterializationEngine,
)
from minerva_etl_spark.operators.aggregation import TrendAggSpec, time_aggregate
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.sources.csv_harvest import CsvParserConfig
from minerva_etl_spark.sources.loader import JobLog, Loader
from minerva_etl_spark.store.notification import NotificationStore
from minerva_etl_spark.store.trendstore import TrendStore, TrendStorePart
from minerva_etl_spark.trigger.trigger import Trigger


SAMPLE_CSV = """node,timestamp,power_kwh,inside_temp
hillside14,2024-01-01 00:15:00,0.02,20.0
hillside14,2024-01-01 00:30:00,0.07,20.5
hillside15,2024-01-01 00:15:00,0.01,19.0
hillside15,2024-01-01 00:30:00,0.02,19.5
"""


def test_spine(spark, tmp_path):
    # ---- instance objects ------------------------------------------------
    raw_store = TrendStore(
        data_source="hub",
        entity_type="node",
        granularity="15m",
        parts=[TrendStorePart("node_main_15m", ["power_kwh", "inside_temp"])],
        base_path=str(tmp_path),
    )
    kpi_store = TrendStore(
        data_source="hub-kpi",
        entity_type="node",
        granularity="15m",
        parts=[TrendStorePart("hub-kpi_node_15m", ["power_mwh"])],
        base_path=str(tmp_path),
    )

    # ---- load the sample file -------------------------------------------
    csv_path = tmp_path / "sample.csv"
    csv_path.write_text(SAMPLE_CSV)
    loader = Loader(store=raw_store, job_log=JobLog(str(tmp_path)))
    job_id = loader.load_file(
        spark, "csv", str(csv_path),
        CsvParserConfig(
            identifier_column="node", timestamp_column="timestamp",
            entity_type="node", granularity="15m",
        ),
    )
    raw = raw_store.read_part(spark, "node_main_15m")
    assert raw.count() == 4
    assert raw.filter(F.col("job_id") == job_id).count() == 4
    jobs = loader.job_log.read(spark).collect()
    assert len(jobs) == 1 and jobs[0].state == "finished"

    # ---- KPI materialization through the fingerprint engine -------------
    # user-supplied PG expression, through the dialect translator
    kpi_expr = translate("(power_kwh * 1000)::double precision")

    def kpi_transform(spark_, timestamps):
        src = raw_store.read_part(spark_, "node_main_15m")
        return (
            src.filter(F.col("timestamp").isin(timestamps))
            .select(
                "entity_id", "timestamp",
                F.expr(kpi_expr).alias("power_mwh"),
            )
        )

    engine = MaterializationEngine(spark, str(tmp_path / "state"))
    engine.register(
        Materialization(
            name="hub-kpi_node_15m",
            target_gran=Granularity.parse("15m"),
            sources=["node_main_15m"],
            transform=kpi_transform,
            processing_delay=timedelta(0),
            stability_delay=timedelta(0),
            reprocessing_period=timedelta(days=365 * 10),
        )
    )

    def sink(name, df, timestamps):
        kpi_store.store(spark, df, job_id=99)

    # engine clock must be ahead of the store's (real) modified stamps
    now = datetime.utcnow() + timedelta(minutes=1)
    done = engine.run(raw_store.read_modified_log(spark), now, sink)
    assert len(done) == 2  # two 15m buckets materialized
    kpi = kpi_store.read_part(spark, "hub-kpi_node_15m")
    got = {
        (r.entity_id, r.timestamp): r.power_mwh for r in kpi.collect()
    }
    assert len(got) == 4
    # hillside14 @00:30 -> 0.07 * 1000 ≈ 70.0 (IEEE: 70.00000000000001)
    assert any(abs(v - 70.0) < 1e-4 for v in got.values())

    # idempotence: nothing stale on a second pass
    assert engine.run(raw_store.read_modified_log(spark), now, sink) == []

    # ---- late re-load: upsert + re-materialization -----------------------
    (tmp_path / "late.csv").write_text(
        "node,timestamp,power_kwh,inside_temp\n"
        "hillside14,2024-01-01 00:30:00,0.09,21.0\n"
    )
    loader.load_file(
        spark, "csv", str(tmp_path / "late.csv"),
        CsvParserConfig(
            identifier_column="node", timestamp_column="timestamp",
            entity_type="node", granularity="15m",
        ),
    )
    assert raw_store.read_part(spark, "node_main_15m").count() == 4  # upsert
    done = engine.run(raw_store.read_modified_log(spark), now, sink)
    assert len(done) == 1  # only the touched bucket re-materialized
    kpi = {
        (r.entity_id, r.timestamp): r.power_mwh
        for r in kpi_store.read_part(spark, "hub-kpi_node_15m").collect()
    }
    assert any(abs(v - 90.0) < 1e-4 for v in kpi.values())
    assert not any(abs(v - 70.0) < 1e-4 for v in kpi.values())

    # ---- 1h aggregation rung + trigger → notifications -------------------
    hourly = time_aggregate(
        raw_store.read_part(spark, "node_main_15m"),
        "1h",
        [TrendAggSpec("power_kwh", "sum", alias="power_kwh")],
    )
    assert {r.samples for r in hourly.collect()} == {2}

    def trig_kpi(spark_, _ts):
        return kpi_store.read_part(spark_, "hub-kpi_node_15m").select(
            "entity_id", "timestamp", "power_mwh"
        )

    trig = Trigger(
        name="HighPowerUsage",
        kpi=trig_kpi,
        thresholds={"max_power": 50.0},
        condition="power_mwh > max_power",
        weight="100",
        notification_message="concat('power too high: ', power_mwh)",
    )
    notifications = trig.evaluate(spark, [])
    ns = NotificationStore(
        "trigger-notification", ["rule", "weight", "details", "data"],
        str(tmp_path),
    )
    ns.store(notifications)
    stored = ns.read(spark).collect()
    assert len(stored) == 1
    assert stored[0].weight == 100 and "90.0" in stored[0].details[:30]


def test_multi_part_read(spark, tmp_path):
    store = TrendStore(
        data_source="hub", entity_type="node", granularity="15m",
        parts=[
            TrendStorePart("main", ["power_kwh"]),
            TrendStorePart("module", ["cpu_load"]),
        ],
        base_path=str(tmp_path),
    )
    pkg = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 15), 1.5, 0.7)],
        "entity_id bigint, timestamp timestamp_ntz, power_kwh double, cpu_load double",
    )
    store.store(spark, pkg)
    wide = store.read_store(spark)
    row = wide.collect()[0]
    assert row.power_kwh == 1.5 and row.cpu_load == 0.7
