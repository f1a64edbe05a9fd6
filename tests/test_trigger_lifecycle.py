"""Trigger lifecycle admin: create/enable/disable/update/execute
(reference `commands/trigger.py`, `trigger/trigger.py:80-235`)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.store.notification import NotificationStore
from minerva_etl_spark.trigger.lifecycle import TriggerSet
from minerva_etl_spark.trigger.trigger import Trigger


@pytest.fixture()
def trigger_set(spark, tmp_path):
    def factory(config: dict) -> Trigger:
        def kpi(sp, _timestamps):
            return sp.createDataFrame(
                [
                    (1, datetime(2024, 1, 1, 1, 0), 10.0),
                    (1, datetime(2024, 1, 1, 2, 0), 99.0),
                    (2, datetime(2024, 1, 1, 1, 0), 55.0),
                ],
                "entity_id bigint, timestamp timestamp_ntz, load double",
            )

        return Trigger(
            name=config["name"],
            kpi=kpi,
            thresholds={
                t["name"]: t["value"] for t in config.get("thresholds", [])
            },
            condition=config.get("condition", "true"),
            weight=str(config.get("weight", 1)),
            notification_message=config.get("notification", "'fired'"),
            notification_data=config.get("data"),
            enabled=bool(config.get("enabled", True)),
            tags=list(config.get("tags", [])),
        )

    ts = TriggerSet(str(tmp_path), factory)
    ts.create(
        {
            "name": "highload",
            "thresholds": [{"name": "max_load", "value": 50.0}],
            "condition": "load > max_load",
            "weight": 5,
        }
    )
    return ts


def test_create_list_and_flags(trigger_set):
    rows = trigger_set.list()
    assert rows == [
        {
            "name": "highload", "enabled": True, "weight": 5, "tags": [],
            "thresholds": {"max_load": 50.0},
        }
    ]
    with pytest.raises(ValueError):
        trigger_set.create({"name": "highload"})
    trigger_set.set_enabled("highload", False)
    assert trigger_set.list()[0]["enabled"] is False
    trigger_set.add_tags("highload", ["capacity", "node"])
    assert trigger_set.list()[0]["tags"] == ["capacity", "node"]


def test_execute_and_threshold_update(spark, trigger_set, tmp_path):
    sink = NotificationStore(
        "trig", ["rule", "weight", "details", "data"], str(tmp_path / "ns")
    )
    n = trigger_set.execute(spark, "highload", sink)
    assert n == 2  # 99.0 and 55.0 exceed 50
    # tighten the threshold: only 99.0 fires now
    trigger_set.set_thresholds("highload", {"max_load": 60.0})
    n2 = trigger_set.execute(spark, "highload", sink)
    assert n2 == 1
    stored = sink.read(spark)
    assert stored.count() == 3
    assert {r.weight for r in stored.collect()} == {5}


def test_execute_respects_enabled_and_timestamps(spark, trigger_set, tmp_path):
    sink = NotificationStore(
        "trig", ["rule", "weight", "details", "data"], str(tmp_path / "ns2")
    )
    only = [datetime(2024, 1, 1, 2, 0)]
    assert trigger_set.execute(spark, "highload", sink, timestamps=only) == 1
    trigger_set.set_enabled("highload", False)
    assert trigger_set.execute(spark, "highload", sink) == 0


def test_update_weight_and_delete(trigger_set):
    trigger_set.update_weight("highload", 9)
    assert trigger_set.list()[0]["weight"] == 9
    trigger_set.delete("highload")
    assert trigger_set.names() == []


def test_kpi_cache_reused_across_evaluations(spark):
    calls = []

    def kpi(sp, _timestamps):
        calls.append(1)
        return sp.createDataFrame(
            [(1, datetime(2024, 1, 1, 1, 0), 10.0)],
            "entity_id bigint, timestamp timestamp_ntz, load double",
        )

    trig = Trigger(
        name="t", kpi=kpi, thresholds={"m": 5.0}, condition="load > m",
        cache_kpi=True,
    )
    trig.evaluate(spark, [datetime(2024, 1, 1, 1, 0)]).count()
    trig.evaluate(spark, [datetime(2024, 1, 1, 2, 0)]).count()
    assert len(calls) == 1  # KPI frame built once, reused
    trig.invalidate_kpi_cache()
    trig.evaluate(spark, []).count()
    assert len(calls) == 2


def test_update_data_function_changes_notification_data(
    spark, trigger_set, tmp_path
):
    """`trigger update-data-function` (`commands/trigger.py:183-196`):
    mutating the data expression changes the notification `data`
    payload on the next execution."""
    sink = NotificationStore(
        "trig", ["rule", "weight", "details", "data"], str(tmp_path / "ns3")
    )
    trigger_set.execute(spark, "highload", sink)
    before = {r.data for r in sink.read(spark).collect()}
    assert all(d.startswith("{") for d in before)  # default: KPI JSON

    trigger_set.update_data_function(
        "highload", "concat('load=', cast(load as string))"
    )
    trigger_set._cache.clear()  # force re-compile from config
    sink2 = NotificationStore(
        "trig", ["rule", "weight", "details", "data"], str(tmp_path / "ns4")
    )
    trigger_set.execute(spark, "highload", sink2)
    after = {r.data for r in sink2.read(spark).collect()}
    assert after == {"load=99.0", "load=55.0"}


def test_trigger_kpi_source_scan_pruned(spark, tmp_path):
    """A trigger with a declared granularity bounds its KPI source scan
    to the evaluated buckets (PushedFilters range on timestamp) — the
    reference's kpi_function is `WHERE t.timestamp = $1` time-bounded."""
    import yaml
    from datetime import datetime

    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    inst = tmp_path / "inst"
    (inst / "trend").mkdir(parents=True)
    (inst / "trigger").mkdir()
    (inst / "trend" / "kpi.yaml").write_text(yaml.safe_dump({
        "data_source": "hub-kpi", "entity_type": "node",
        "granularity": "15m", "partition_size": "1d",
        "parts": [{"name": "hub-kpi_node_15m",
                   "trends": [{"name": "power_mwh",
                               "data_type": "double precision"}]}],
    }))
    # an AGGREGATING KPI: the post-agg timestamp filter lands on the
    # bucket expression (unprunable); only the declared-granularity
    # source range can reach the parquet scan
    (inst / "trigger" / "t.yaml").write_text(yaml.safe_dump({
        "name": "HighPowerUsage",
        "granularity": "1h",
        "kpi_sources": ["hub-kpi_node_15m"],
        "kpi_query": (
            "SELECT entity_id, cast(date_trunc('HOUR', timestamp) + "
            "interval 1 hour as timestamp_ntz) AS timestamp, "
            "sum(power_mwh) AS power_mwh "
            'FROM trend."hub-kpi_node_15m" GROUP BY 1, 2'
        ),
        "thresholds": [{"name": "max_power", "value": 0.05}],
        "condition": "power_mwh > max_power",
        "weight": 100,
        "notification": "'too high'",
    }))
    ctx = initialize(spark, MinervaInstance.load(inst), str(tmp_path / "d"))
    store = ctx.trend_stores["hub-kpi_node_15m"]
    store.store(spark, spark.createDataFrame(
        [(1, datetime(2024, 1, 1 + d, 0, 15), 0.1) for d in range(5)],
        "entity_id bigint, timestamp timestamp_ntz, power_mwh double",
    ))
    trig = ctx.triggers["HighPowerUsage"]
    out = trig.evaluate(spark, [datetime(2024, 1, 3, 1, 0)])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "GreaterThan(timestamp" in plan
    assert "LessThanOrEqual(timestamp" in plan
    rows = out.collect()
    assert len(rows) == 1 and rows[0].timestamp == datetime(2024, 1, 3, 1, 0)
