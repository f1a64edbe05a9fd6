"""Capstone: the complete reference lifecycle in one run.

YAML instance (raw store + generated ladder + virtual entity + regex
relation + trigger + notification store) → initialize → load CSV →
materialize virtual entities → materialize relations → fingerprint
engine runs generated time-aggregation AND relation-crossing entity
aggregation → trigger fires into the notification store.

This is `examples/tiny_instance` semantics end-to-end: the shape a
reference user's deployment takes after switching to this engine.
"""

from datetime import datetime, timedelta

import pytest
import yaml

from minerva_etl_spark.catalog.aggregation_compile import (
    generate_entity_aggregation,
    write_generated,
)
from minerva_etl_spark.catalog.initialize import initialize
from minerva_etl_spark.catalog.instance import MinervaInstance, TrendStoreDef

RAW = {
    "data_source": "hub",
    "entity_type": "node",
    "granularity": "15m",
    "partition_size": "1d",
    "title": "raw node data",
    "parts": [{
        "name": "node_main_15m",
        "trends": [
            {"name": "power_kwh", "data_type": "double precision",
             "time_aggregation": "sum", "entity_aggregation": "sum"},
        ],
    }],
}

VIRTUAL_ENTITY = {
    "name": "v-site",
    "query": 'SELECT DISTINCT substring(name from \'([a-z]+)-.*\') AS name '
             'FROM entity."node"',
}

RELATION = {
    "name": "node->v-site",
    "query": 'SELECT n.id AS source_id, v.id AS target_id\n'
             'FROM entity."node" n JOIN entity."v-site" v\n'
             '  ON substring(n.name from \'([a-z]+)-.*\') = v.name',
}

TRIGGER = {
    "name": "SiteHighPower",
    "kpi_sources": ["node__v_site_node_main_15m"],
    "kpi_query": 'SELECT entity_id, timestamp, power_kwh '
                 'FROM trend."node__v_site_node_main_15m"',
    "thresholds": [{"name": "max_power", "value": 2.5}],
    "condition": "power_kwh > max_power",
    "weight": 100,
    "notification": "'site power high'",
}

NOTIFICATION = {"data_source": "trigger-notification",
                "attributes": [{"name": "rule"}, {"name": "weight"}]}

CSV = (
    "node,timestamp,power_kwh\n"
    "alpha-1,2024-01-01 00:15:00,1.0\n"
    "alpha-2,2024-01-01 00:15:00,2.0\n"
    "beta-1,2024-01-01 00:15:00,2.0\n"
)


def test_full_lifecycle(spark, tmp_path):
    # ---- lay out the instance -------------------------------------------
    inst_dir = tmp_path / "instance"
    for sub in ("trend", "materialization", "relation", "virtual-entity",
                "trigger", "notification", "attribute"):
        (inst_dir / sub).mkdir(parents=True)
    (inst_dir / "trend" / "raw.yaml").write_text(yaml.safe_dump(RAW))
    (inst_dir / "virtual-entity" / "vsite.yaml").write_text(
        yaml.safe_dump(VIRTUAL_ENTITY)
    )
    (inst_dir / "relation" / "rel.yaml").write_text(yaml.safe_dump(RELATION))
    (inst_dir / "trigger" / "t.yaml").write_text(yaml.safe_dump(TRIGGER))
    (inst_dir / "notification" / "n.yaml").write_text(
        yaml.safe_dump(NOTIFICATION)
    )
    # generated ladder (time) + entity aggregation across the relation
    store_def = TrendStoreDef.from_dict(RAW)
    write_generated(inst_dir, store_def)
    ea_store, ea_mat = generate_entity_aggregation(
        store_def, "node->v-site", "v-site"
    )[0]
    (inst_dir / "trend" / "vsite_agg.yaml").write_text(yaml.safe_dump(ea_store))
    (inst_dir / "materialization" / "ea.yaml").write_text(
        yaml.safe_dump(ea_mat)
    )

    # ---- initialize + load ----------------------------------------------
    inst = MinervaInstance.load(inst_dir)
    data_dir = tmp_path / "data"
    ctx = initialize(spark, inst, str(data_dir))

    from minerva_etl_spark.sources.csv_harvest import CsvParserConfig
    from minerva_etl_spark.sources.loader import Loader
    from minerva_etl_spark.catalog.directory import register_entities

    csv = tmp_path / "load.csv"
    csv.write_text(CSV)
    Loader(store=ctx.trend_stores["hub_node_15m"]).load_file(
        spark, "csv", str(csv),
        CsvParserConfig(
            identifier_column="node", timestamp_column="timestamp",
            entity_type="node",
            column_types={"power_kwh": "double precision"},
        ),
    )
    # entity dimension for 'node' (loader assigns hash ids; dim powers
    # the virtual-entity/relation queries)
    register_entities(
        spark, str(data_dir / "entity" / "node"),
        spark.createDataFrame(
            [("alpha-1",), ("alpha-2",), ("beta-1",)], "name string"
        ),
        "node",
    )

    # ---- virtual entities + relations (initialize's final steps) --------
    assert ctx.materialize_virtual_entities() == ["v-site"]
    assert ctx.materialize_relations() == ["node->v-site"]
    sites = spark.read.parquet(str(data_dir / "entity" / "v-site"))
    assert {r.name for r in sites.collect()} == {"alpha", "beta"}

    # ---- incremental materialization (time ladder + entity agg) ----------
    for mat in ctx.engine.materializations.values():
        mat.processing_delay = timedelta(0)
        mat.stability_delay = timedelta(0)
        mat.reprocessing_period = timedelta(days=365 * 100)
    done = ctx.materialize_stale(datetime.utcnow() + timedelta(minutes=1))
    done_parts = {name for name, _ in done}
    assert {"node_main_1h", "node_main_1d", "node__v_site_node_main_15m"} <= done_parts

    # per-site roll-up: alpha = 1+2, beta = 2
    site_ids = {r.name: r.id for r in sites.collect()}
    got = {
        r.entity_id: (r.samples, r.power_kwh)
        for r in ctx.read_part("node__v_site_node_main_15m").collect()
    }
    assert got[site_ids["alpha"]] == (2, 3.0)
    assert got[site_ids["beta"]] == (1, 2.0)

    # ---- trigger over the entity-aggregated KPI --------------------------
    notifications = ctx.triggers["SiteHighPower"].evaluate(spark, [])
    rows = notifications.collect()
    assert len(rows) == 1 and rows[0].entity_id == site_ids["alpha"]
    ctx.notification_stores["trigger-notification"].store(notifications)
    assert ctx.notification_stores["trigger-notification"].read(spark).count() == 1
