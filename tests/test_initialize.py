"""YAML instance → initialized engine: a tiny_instance-shaped directory
compiled by catalog.initialize, then loaded + materialized end-to-end."""

from datetime import datetime, timedelta

import pytest

from minerva_etl_spark.catalog.initialize import initialize
from minerva_etl_spark.catalog.instance import MinervaInstance
from minerva_etl_spark.sources.csv_harvest import CsvParserConfig
from minerva_etl_spark.sources.loader import Loader

TREND_YAML = """\
data_source: hub
entity_type: node
granularity: 15m
partition_size: 1d
parts:
  - name: node_main_15m
    trends:
      - name: power_kwh
        data_type: double precision
"""

KPI_TREND_YAML = """\
data_source: hub-kpi
entity_type: node
granularity: 15m
partition_size: 1d
parts:
  - name: kpi_node_15m
    trends:
      - name: power_mwh
        data_type: double precision
"""

MATERIALIZATION_YAML = """\
target_trend_store_part: kpi_node_15m
enabled: true
processing_delay: 1s
stability_delay: 1s
reprocessing_period: 520w
sources:
  - trend_store_part: node_main_15m
view: |
  SELECT entity_id, timestamp, (power_kwh * 1000)::double precision AS power_mwh
  FROM trend."node_main_15m"
"""

TRIGGER_YAML = """\
name: HighPowerUsage
kpi_sources: [kpi_node_15m]
kpi_query: |
  SELECT entity_id, timestamp, power_mwh FROM trend."kpi_node_15m"
thresholds:
  - name: max_power
    value: 50.0
condition: power_mwh > max_power
weight: 100
notification: "'high power'"
"""

NOTIFICATION_YAML = """\
data_source: trigger-notification
attributes:
  - name: rule
  - name: weight
"""


@pytest.fixture()
def instance_dir(tmp_path):
    root = tmp_path / "instance"
    for sub, files in {
        "trend": {"hub_node_15m.yaml": TREND_YAML, "kpi_node.yaml": KPI_TREND_YAML},
        "materialization": {"kpi.yaml": MATERIALIZATION_YAML},
        "trigger": {"high_power.yaml": TRIGGER_YAML},
        "notification": {"notification.yaml": NOTIFICATION_YAML},
        "relation": {},
        "attribute": {},
    }.items():
        (root / sub).mkdir(parents=True, exist_ok=True)
        for name, body in files.items():
            (root / sub / name).write_text(body)
    return root


def test_initialize_and_run(spark, tmp_path, instance_dir):
    inst = MinervaInstance.load(instance_dir)
    assert len(inst.trend_stores) == 2
    assert len(inst.materializations) == 1

    ctx = initialize(spark, inst, str(tmp_path / "data"))
    assert set(ctx.parts_index) == {"node_main_15m", "kpi_node_15m"}
    assert "HighPowerUsage" in ctx.triggers

    # load a csv through the initialized raw store
    csv = tmp_path / "s.csv"
    csv.write_text(
        "node,timestamp,power_kwh\n"
        "n1,2024-01-01 00:15:00,0.02\n"
        "n1,2024-01-01 00:30:00,0.07\n"
    )
    raw = ctx.trend_stores["hub_node_15m"]
    Loader(store=raw).load_file(
        spark, "csv", str(csv),
        CsvParserConfig(
            identifier_column="node", timestamp_column="timestamp",
            entity_type="node",
            column_types={"power_kwh": "double precision"},
        ),
    )

    # fingerprint engine materializes the translated view per bucket
    done = ctx.materialize_stale(datetime.utcnow() + timedelta(minutes=1))
    assert len(done) == 2
    kpi = ctx.read_part("kpi_node_15m")
    vals = sorted(round(r.power_mwh, 6) for r in kpi.collect())
    assert vals == [20.0, 70.0]

    # trigger over the materialized KPI -> notification store
    notifications = ctx.triggers["HighPowerUsage"].evaluate(spark, [])
    rows = notifications.collect()
    assert len(rows) == 1 and rows[0].weight == 100
    ctx.notification_stores["trigger-notification"].store(notifications)
    assert (
        ctx.notification_stores["trigger-notification"].read(spark).count() == 1
    )


RELATION_YAML = """\
name: node->v-site
query: |
  SELECT n.id AS source_id, v.id AS target_id
  FROM entity."node" n JOIN entity."v-site" v
    ON substring(n.name from '([a-z]+)-.*') = v.name
"""


def test_relation_from_yaml_definition(spark, tmp_path, instance_dir):
    """§3.3 final step: relations rebuilt from their defining SQL over
    entity dimension views (the reference's regex-prefix example)."""
    from minerva_etl_spark.catalog.directory import register_entities

    (instance_dir / "relation" / "node_vsite.yaml").write_text(RELATION_YAML)
    inst = MinervaInstance.load(instance_dir)
    assert len(inst.relations) == 1

    data_dir = tmp_path / "data"
    ctx = initialize(spark, inst, str(data_dir))
    register_entities(
        spark, str(data_dir / "entity" / "node"),
        spark.createDataFrame(
            [("alpha-1",), ("alpha-2",), ("beta-1",)], "name string"
        ),
        "node",
    )
    register_entities(
        spark, str(data_dir / "entity" / "v-site"),
        spark.createDataFrame([("alpha",), ("beta",)], "name string"),
        "v-site",
    )
    done = ctx.materialize_relations()
    assert done == ["node->v-site"]
    rel = ctx.relations.read(spark, "node->v-site")
    # alpha has two member nodes, beta one
    counts = (
        rel.groupBy("target_id").count().collect()
    )
    assert sorted(r["count"] for r in counts) == [1, 2]


LOOKBACK_MAT_YAML = """\
target_trend_store_part: kpi_node_15m
enabled: true
processing_delay: 1s
stability_delay: 1s
reprocessing_period: 520w
sources:
  - trend_store_part: node_main_15m
view: |
  SELECT entity_id, timestamp,
         sum(power_kwh) OVER (PARTITION BY entity_id ORDER BY timestamp
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS power_mwh
  FROM trend."node_main_15m"
"""


def _run_lookback_case(spark, tmp_path, instance_dir, extra_yaml=""):
    (instance_dir / "materialization" / "kpi.yaml").write_text(
        LOOKBACK_MAT_YAML + extra_yaml
    )
    inst = MinervaInstance.load(instance_dir)
    ctx = initialize(spark, inst, str(tmp_path / "data"))
    raw = ctx.trend_stores["hub_node_15m"]
    cfg = CsvParserConfig(
        identifier_column="node", timestamp_column="timestamp",
        entity_type="node",
        column_types={"power_kwh": "double precision"},
    )
    first = tmp_path / "a.csv"
    first.write_text(
        "node,timestamp,power_kwh\n"
        "n1,2024-01-01 00:15:00,1\n"
        "n1,2024-01-01 00:30:00,2\n"
    )
    Loader(store=raw).load_file(spark, "csv", str(first), cfg)
    ctx.materialize_stale(datetime.utcnow() + timedelta(minutes=1))
    # second pass: ONLY the 00:45 bucket is stale — its rolling window
    # reaches two buckets back, outside the stale range
    second = tmp_path / "b.csv"
    second.write_text(
        "node,timestamp,power_kwh\nn1,2024-01-01 00:45:00,4\n"
    )
    Loader(store=raw).load_file(spark, "csv", str(second), cfg)
    ctx.materialize_stale(datetime.utcnow() + timedelta(minutes=1))
    kpi = ctx.read_part("kpi_node_15m")
    return {
        r.timestamp.strftime("%H:%M"): round(r.power_mwh, 6)
        for r in kpi.collect()
    }


def test_lookback_view_sources_left_unpruned(spark, tmp_path, instance_dir):
    """ADVICE r5 (medium): a window-function view auto-detects as
    lookback — its sources see the full part, so the incremental
    recompute of the newest bucket still reads two buckets back."""
    with pytest.warns(UserWarning, match="lookback"):
        vals = _run_lookback_case(spark, tmp_path, instance_dir)
    assert vals == {"00:15": 1.0, "00:30": 3.0, "00:45": 7.0}


def test_unbounded_sources_false_forces_pruning(spark, tmp_path, instance_dir):
    """Explicit opt-back-in: unbounded_sources: false prunes even a
    window-function view (the 00:45 recompute sees only its own
    bucket's source rows)."""
    vals = _run_lookback_case(
        spark, tmp_path, instance_dir,
        extra_yaml="unbounded_sources: false\n",
    )
    assert vals["00:45"] == 4.0


ATTRIBUTE_YAML = """\
data_source: att
entity_type: node
attributes:
  - name: power_class
"""

ATTR_MAT_YAML = """\
attribute_store:
  data_source: att
  entity_type: node
query: |
  SELECT entity_id, timestamp,
         CASE WHEN power_kwh >= 0.05 THEN 'high' ELSE 'low' END
           AS power_class
  FROM trend."node_main_15m"
"""


def test_attribute_materialization(spark, tmp_path, instance_dir):
    """SampledViewMaterialization (reference initialize step
    'Initializing attribute materializations'): a view over a trend
    part sampled into an attribute store's history + curr pointer."""
    (instance_dir / "attribute" / "node_attrs.yaml").write_text(
        ATTRIBUTE_YAML
    )
    mat_dir = instance_dir / "attribute" / "materialization"
    mat_dir.mkdir()
    (mat_dir / "node_attrs.yaml").write_text(ATTR_MAT_YAML)

    inst = MinervaInstance.load(instance_dir)
    assert len(inst.attribute_materializations) == 1
    ctx = initialize(spark, inst, str(tmp_path / "data"))
    assert "att_node" in ctx.attribute_stores

    csv = tmp_path / "s.csv"
    csv.write_text(
        "node,timestamp,power_kwh\n"
        "n1,2024-01-01 00:15:00,0.02\n"
        "n1,2024-01-01 00:30:00,0.07\n"
    )
    raw = ctx.trend_stores["hub_node_15m"]
    Loader(store=raw).load_file(
        spark, "csv", str(csv),
        CsvParserConfig(
            identifier_column="node", timestamp_column="timestamp",
            entity_type="node",
            column_types={"power_kwh": "double precision"},
        ),
    )
    done = ctx.materialize_attributes(materialize_curr=True)
    assert done == ["att_node"]

    store = ctx.attribute_stores["att_node"]
    hist = {
        r.timestamp.strftime("%H:%M"): r.power_class
        for r in store.read_history(spark).collect()
    }
    assert hist == {"00:15": "low", "00:30": "high"}
    curr = spark.read.parquet(store.curr_path).collect()
    assert len(curr) == 1 and curr[0].power_class == "high"
    # re-run samples the same rows: history unchanged (upsert on key)
    ctx.materialize_attributes()
    assert store.read_history(spark).count() == 2


def test_custom_init_sql_hooks(spark, tmp_path, instance_dir):
    """Custom pre-/post-init SQL (reference initialize runs
    custom/{pre-init,pre-materialization-init,post-init}/**/*.sql):
    a post-init view over a trend part is queryable right after
    initialize (declared-schema empty fallback) and sees loaded data
    after the hook re-runs."""
    pre = instance_dir / "custom" / "pre-init"
    post = instance_dir / "custom" / "post-init"
    pre.mkdir(parents=True)
    post.mkdir(parents=True)
    (pre / "00_probe.sql").write_text("SELECT 1 AS probe;\n")
    (post / "10_summary.sql").write_text(
        "-- per-entity KPI roll-up over the materialized part\n"
        'CREATE VIEW kpi_summary AS\n'
        'SELECT entity_id, max(power_mwh) AS max_mwh\n'
        'FROM trend."kpi_node_15m" GROUP BY entity_id;\n'
    )
    inst = MinervaInstance.load(instance_dir)
    assert set(inst.custom_sql) == {"pre-init", "post-init"}
    ctx = initialize(spark, inst, str(tmp_path / "data"))
    # view exists immediately (empty: declared-schema fallback)
    assert spark.sql("SELECT * FROM kpi_summary").count() == 0

    csv = tmp_path / "s.csv"
    csv.write_text(
        "node,timestamp,power_kwh\n"
        "n1,2024-01-01 00:15:00,0.02\n"
        "n1,2024-01-01 00:30:00,0.07\n"
    )
    Loader(store=ctx.trend_stores["hub_node_15m"]).load_file(
        spark, "csv", str(csv),
        CsvParserConfig(
            identifier_column="node", timestamp_column="timestamp",
            entity_type="node",
            column_types={"power_kwh": "double precision"},
        ),
    )
    ctx.materialize_stale(datetime.utcnow() + timedelta(minutes=1))
    assert ctx.run_custom_sql("post-init") == 1  # refresh the snapshot
    rows = spark.sql("SELECT * FROM kpi_summary").collect()
    assert len(rows) == 1 and round(rows[0].max_mwh, 6) == 70.0
