"""CLI-driven lifecycle: the `minerva` subcommand surface end-to-end
(reference `commands/minerva_cli.py:42-60`) against the tiny instance.

Unlike test_full_lifecycle (library-driven), everything here goes
through `cli.main(argv)` — parity with how an operator uses the tool.
"""

import shutil

import pytest

from minerva_etl_spark import cli

TINY = "examples/tiny_instance"


@pytest.fixture()
def instance_dir(tmp_path):
    dst = tmp_path / "instance"
    shutil.copytree(TINY, dst)
    return str(dst)


@pytest.fixture()
def data_dir(tmp_path):
    return str(tmp_path / "data")


def run(instance_dir, data_dir, *argv):
    cli.main(["--instance", instance_dir, "--data-dir", data_dir, *argv])


def test_cli_full_lifecycle(spark, instance_dir, data_dir, capsys):
    # initialize: instance YAML -> engine objects
    run(instance_dir, data_dir, "initialize")
    out = capsys.readouterr().out
    assert "trend stores:        2" in out
    assert "triggers:            1" in out

    # structure dump
    run(instance_dir, data_dir, "structure", "dump")
    out = capsys.readouterr().out
    assert "trend store hub/node/15m" in out
    assert "power_kwh: numeric" in out

    # load the sample through the CLI
    run(
        instance_dir, data_dir, "load-data",
        "--data-source", "hub", "--entity-type", "node",
        "--granularity", "15m", "--identifier-column", "node",
        f"{instance_dir}/sample-data/sample.csv",
    )
    assert "loaded" in capsys.readouterr().out

    # materialize the KPI store (now pushed past the stability delay)
    from datetime import datetime, timedelta, timezone

    later = (
        datetime.now(timezone.utc).replace(tzinfo=None) + timedelta(minutes=10)
    ).isoformat()
    run(instance_dir, data_dir, "materialize", "--now", later)
    out = capsys.readouterr().out
    assert "materialized hub-kpi_node_15m" in out

    # report over the loaded store
    run(
        instance_dir, data_dir, "report",
        "--data-source", "hub", "--entity-type", "node",
        "--granularity", "15m",
    )
    assert "node_main_15m: rows=" in capsys.readouterr().out

    # trigger admin: list / update / disable / execute
    run(instance_dir, data_dir, "trigger", "list")
    out = capsys.readouterr().out
    assert "HighPowerUsage" in out and "weight=100" in out

    run(
        instance_dir, data_dir, "trigger", "update-weight",
        "HighPowerUsage", "--value", "42",
    )
    capsys.readouterr()
    run(instance_dir, data_dir, "trigger", "list")
    assert "weight=42" in capsys.readouterr().out

    run(
        instance_dir, data_dir, "trigger", "create-notifications",
        "HighPowerUsage", "--notification-store", "trigger-notification",
    )
    out = capsys.readouterr().out
    assert "Notifications generated:" in out
    n = int(out.strip().rsplit(" ", 1)[1])
    assert n > 0

    run(instance_dir, data_dir, "trigger", "disable", "HighPowerUsage")
    capsys.readouterr()
    run(
        instance_dir, data_dir, "trigger", "create-notifications",
        "HighPowerUsage",
    )
    assert "Notifications generated: 0" in capsys.readouterr().out


def test_cli_directory_and_alias(spark, instance_dir, data_dir, tmp_path, capsys):
    run(instance_dir, data_dir, "data-source", "create", "hub")
    run(instance_dir, data_dir, "entity-type", "create", "node")
    capsys.readouterr()
    run(instance_dir, data_dir, "data-source", "list")
    assert capsys.readouterr().out.strip() == "hub"

    alias_csv = tmp_path / "aliases.csv"
    alias_csv.write_text("alias,name\nh14,hillside14\nh15,hillside15\n")
    run(
        instance_dir, data_dir, "alias", "create",
        "--file", str(alias_csv), "--entity-type", "node",
    )
    capsys.readouterr()
    run(instance_dir, data_dir, "alias", "list")
    out = capsys.readouterr().out
    assert "h14" in out and "h15" in out

    run(instance_dir, data_dir, "data-source", "delete", "hub")
    capsys.readouterr()
    run(instance_dir, data_dir, "data-source", "list")
    assert capsys.readouterr().out.strip() == ""


def test_cli_deduce_config_roundtrip(spark, instance_dir, data_dir, tmp_path, capsys):
    """Deduced YAML loads through initialize and ingests the sample
    (the VERDICT round-2 'done' criterion for the deducer)."""
    out_yaml = tmp_path / "deduced.yaml"
    run(
        instance_dir, data_dir, "deduce-config",
        f"{instance_dir}/sample-data/sample.csv",
        "--identifier-column", "node", "--granularity", "15m",
        "--data-source", "ded", "--entity-type", "node",
        "--part-name", "ded_node_15m", "--out", str(out_yaml),
    )
    capsys.readouterr()
    text = out_yaml.read_text()
    assert "power_kwh" in text and "freq_power" in text
    # install the deduced store into a fresh instance and load with it
    fresh = tmp_path / "fresh_instance" / "trend"
    fresh.mkdir(parents=True)
    (fresh / "ded_node_15m.yaml").write_text(text)
    run(
        str(tmp_path / "fresh_instance"), data_dir, "load-data",
        "--data-source", "ded", "--entity-type", "node",
        "--granularity", "15m", "--identifier-column", "node",
        f"{instance_dir}/sample-data/sample.csv",
    )
    assert "loaded" in capsys.readouterr().out
    run(
        str(tmp_path / "fresh_instance"), data_dir, "report",
        "--data-source", "ded", "--entity-type", "node",
        "--granularity", "15m",
    )
    assert "ded_node_15m: rows=4" in capsys.readouterr().out


def test_cli_alter_trends(spark, instance_dir, data_dir, capsys):
    run(
        instance_dir, data_dir, "alter-trends",
        "--data-source", "hub", "--entity-type", "node",
        "--granularity", "15m", "--part", "node_main_15m", "volt", "amp",
    )
    out = capsys.readouterr().out
    assert "['volt', 'amp']" in out


def test_cli_attribute_store_admin(spark, instance_dir, data_dir, capsys):
    """attribute-store compact / materialize-curr-ptr / delete (--all)."""
    from datetime import datetime

    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    ctx = initialize(
        spark, MinervaInstance.load(instance_dir), data_dir
    )
    store = ctx.attribute_stores["hub_node"]
    batch = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), "rtu", "alpha"),
            (1, datetime(2024, 1, 2), "rtu", "alpha"),  # run: compacts away
            (1, datetime(2024, 1, 3), "bbu", "alpha"),
            (2, datetime(2024, 1, 1), "rtu", "beta"),
        ],
        "entity_id bigint, timestamp timestamp_ntz, equipment_type string, "
        "site string",
    )
    store.store_batch(spark, batch)

    run(instance_dir, data_dir, "attribute-store", "compact", "--all")
    assert "hub_node: compacted" in capsys.readouterr().out
    assert store.read_history(spark).count() == 3  # middle run collapsed

    run(
        instance_dir, data_dir, "attribute-store", "materialize-curr-ptr",
        "hub_node",
    )
    assert "curr rows = 2" in capsys.readouterr().out

    run(instance_dir, data_dir, "attribute-store", "delete", "hub_node")
    assert "hub_node: deleted" in capsys.readouterr().out
    assert store.read_history(spark) is None


def test_cli_quick_start_and_initialize(spark, tmp_path, capsys):
    """quick-start lays down an instance skeleton that `initialize`
    accepts as-is (`commands/quick_start.py:14-57`)."""
    root = str(tmp_path / "fresh")
    cli.main(["quick-start", "--instance-name", "demo", root])
    assert "skeleton" in capsys.readouterr().out

    from minerva_etl_spark.catalog.instance import MinervaInstance

    inst = MinervaInstance.load(root)
    assert len(inst.trend_stores) == 2
    assert inst.trend_stores[0].data_source == "demo"
    assert len(inst.materializations) == 1

    run(root, str(tmp_path / "data"), "initialize")
    out = capsys.readouterr().out
    assert "trend stores:        2" in out
    assert "materializations:    1" in out


def test_cli_relation_and_virtual_entity(spark, instance_dir, data_dir, capsys):
    """CLI-only relation/virtual-entity admin: load entities, materialize
    the virtual entity + relation, remove the relation
    (`commands/relation.py:63-141`, `commands/virtual_entity.py:9-57`)."""
    run(
        instance_dir, data_dir, "load-data",
        "--data-source", "hub", "--entity-type", "node",
        "--granularity", "15m", "--identifier-column", "node",
        f"{instance_dir}/sample-data/sample.csv",
    )
    capsys.readouterr()
    run(instance_dir, data_dir, "virtual-entity", "materialize")
    assert "materialized virtual entity v-site" in capsys.readouterr().out
    run(instance_dir, data_dir, "relation", "materialize")
    assert "materialized relation node->v-site" in capsys.readouterr().out

    from minerva_etl_spark.store.relation import RelationStore

    rel = RelationStore(data_dir)
    assert rel.read(spark, "node->v-site").count() > 0

    run(instance_dir, data_dir, "relation", "remove", "node->v-site")
    assert "removed" in capsys.readouterr().out
    assert rel.read(spark, "node->v-site") is None
    import os
    assert not os.path.exists(f"{instance_dir}/relation/node->v-site.yaml")


def test_cli_notification_store_admin(instance_dir, data_dir, tmp_path, capsys):
    import yaml

    f = tmp_path / "ns.yaml"
    f.write_text(yaml.safe_dump({
        "data_source": "ops-alerts",
        "attributes": [{"name": "rule", "data_type": "text"}],
    }))
    run(instance_dir, data_dir, "notification-store", "create", "--file", str(f))
    assert "created notification store ops-alerts" in capsys.readouterr().out
    run(instance_dir, data_dir, "notification-store", "list")
    out = capsys.readouterr().out
    assert "ops-alerts" in out and "trigger-notification" in out
    run(instance_dir, data_dir, "notification-store", "delete", "ops-alerts")
    assert "deleted" in capsys.readouterr().out
    run(instance_dir, data_dir, "notification-store", "list")
    assert "ops-alerts" not in capsys.readouterr().out


def test_cli_partition_create(instance_dir, data_dir, capsys):
    """partition pre-creation (T9, `commands/partition.py:50-151`):
    directories appear for the retention..ahead window; re-run is a
    no-op."""
    import os

    run(
        instance_dir, data_dir, "partition", "create",
        "--now", "2024-03-10T12:00:00", "--ahead-interval", "3d",
    )
    out = capsys.readouterr().out
    n = int(out.split()[1])
    assert n > 0
    base = (
        f"{data_dir}/trend/hub_node_15m/node_main_15m"
    )
    made = [d for d in os.listdir(base) if d.startswith("__part_idx=")]
    assert len(made) > 0
    run(
        instance_dir, data_dir, "partition", "create",
        "--now", "2024-03-10T12:00:00", "--ahead-interval", "3d",
    )
    assert "created 0 partition(s)" in capsys.readouterr().out

    # create-for-timestamp: one partition per part, far outside the
    # window so it's genuinely new; re-run is a no-op
    run(instance_dir, data_dir, "partition", "create-for-timestamp",
        "2030-01-01T00:00:00")
    out = capsys.readouterr().out
    n2 = int(out.split()[1])
    assert n2 > 0
    run(instance_dir, data_dir, "partition", "create-for-timestamp",
        "2030-01-01T00:00:00")
    assert "created 0 partition(s)" in capsys.readouterr().out


def test_cli_partition_remove_old(spark, instance_dir, data_dir, capsys):
    """partition remove-old = retention enforcement through the CLI:
    partitions wholly past retention drop; recent ones stay."""
    import datetime
    from types import SimpleNamespace

    from minerva_etl_spark.cli import _build_store

    store = _build_store(SimpleNamespace(
        instance=instance_dir, data_dir=data_dir,
        data_source="hub", entity_type="node", granularity="15m",
    ))
    # the tiny-instance store declares retention_period: 1month
    old = datetime.datetime(2024, 1, 1, 0, 15)
    new = datetime.datetime(2024, 3, 10, 0, 15)
    frame = spark.createDataFrame(
        [(1, old, 1.0), (1, new, 2.0)],
        "entity_id bigint, timestamp timestamp_ntz, power_kwh double",
    )
    store.store(spark, frame, job_id=1)
    run(instance_dir, data_dir, "partition", "remove-old",
        "--now", "2024-03-10T12:00:00")
    out = capsys.readouterr().out
    assert "removed" in out
    left = store.read_part(spark, store.parts[0].name)
    rows = left.select("timestamp").collect()
    assert all(r.timestamp >= datetime.datetime(2024, 3, 1) for r in rows)


def test_cli_trend_materialization_admin(instance_dir, data_dir, tmp_path, capsys):
    import yaml

    run(instance_dir, data_dir, "trend-materialization", "list")
    out = capsys.readouterr().out
    assert "hub-kpi_node_15m\tenabled" in out

    run(instance_dir, data_dir, "trend-materialization", "disable",
        "hub-kpi_node_15m")
    capsys.readouterr()
    d = yaml.safe_load(
        open(f"{instance_dir}/materialization/hub-kpi_node_15m.yaml")
    )
    assert d["enabled"] is False
    run(instance_dir, data_dir, "trend-materialization", "enable",
        "hub-kpi_node_15m")
    capsys.readouterr()

    newdef = dict(d, target_trend_store_part="extra_1d", enabled=True)
    f = tmp_path / "extra.yaml"
    f.write_text(yaml.safe_dump(newdef))
    run(instance_dir, data_dir, "trend-materialization", "create",
        "--file", str(f))
    capsys.readouterr()
    run(instance_dir, data_dir, "trend-materialization", "list")
    assert "extra_1d" in capsys.readouterr().out
    run(instance_dir, data_dir, "trend-materialization", "drop", "extra_1d")
    capsys.readouterr()
    run(instance_dir, data_dir, "trend-materialization", "list")
    assert "extra_1d" not in capsys.readouterr().out


def test_cli_trigger_update_data_function(instance_dir, data_dir, tmp_path, capsys):
    import yaml

    cfg = yaml.safe_load(
        open(f"{instance_dir}/trigger/high-power-usage.yaml")
    ) if __import__("os").path.exists(
        f"{instance_dir}/trigger/high-power-usage.yaml"
    ) else None
    if cfg is None:
        import glob
        path = glob.glob(f"{instance_dir}/trigger/*.yaml")[0]
        cfg = yaml.safe_load(open(path))
    cfg["data"] = "cast(power_mwh as string)"
    f = tmp_path / "trig.yaml"
    f.write_text(yaml.safe_dump(cfg))
    run(instance_dir, data_dir, "trigger", "update-data-function",
        "--file", str(f))
    assert "updated data function" in capsys.readouterr().out
    import glob
    stored = None
    for p in glob.glob(f"{instance_dir}/trigger/*.yaml"):
        d = yaml.safe_load(open(p))
        if d.get("name") == cfg["name"]:
            stored = d
    assert stored["data"] == "cast(power_mwh as string)"


def test_cli_attribute_materialization_run(
    spark, instance_dir, data_dir, capsys
):
    """attribute-store materialization-list / materialization-run: the
    tiny_instance sampled-view def populates hub-class_node's history
    from the raw trend part."""
    from datetime import datetime

    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    ctx = initialize(spark, MinervaInstance.load(instance_dir), data_dir)
    raw = ctx.trend_stores["hub_node_15m"]
    rows = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 15), 0.02),
            (1, datetime(2024, 1, 1, 0, 30), 0.07),
            (2, datetime(2024, 1, 1, 0, 15), 0.09),
        ],
        "entity_id bigint, timestamp timestamp_ntz, power_kwh double",
    )
    raw.store(spark, rows, job_id=1)

    run(instance_dir, data_dir, "attribute-store", "materialization-list")
    assert "hub-class_node" in capsys.readouterr().out

    run(
        instance_dir, data_dir, "attribute-store", "materialization-run",
        "--materialize-curr",
    )
    assert "hub-class_node: 3" in capsys.readouterr().out

    store = ctx.attribute_stores["hub-class_node"]
    hist = {
        (r.entity_id, r.timestamp.strftime("%H:%M")): r.power_class
        for r in store.read_history(spark).collect()
    }
    assert hist == {
        (1, "00:15"): "low", (1, "00:30"): "high", (2, "00:15"): "high",
    }
    curr = {
        r.entity_id: r.power_class
        for r in spark.read.parquet(store.curr_path).collect()
    }
    assert curr == {1: "high", 2: "high"}


def test_cli_trend_store_admin(spark, instance_dir, data_dir, capsys, tmp_path):
    """trend-store create/add-parts/add-trends/remove-trends/show/list/
    delete sync the instance YAML catalog (reference
    `commands/trend_store.py` definition-file semantics)."""
    import yaml

    # list: the two tiny-instance stores
    run(instance_dir, data_dir, "trend-store", "list")
    out = capsys.readouterr().out
    assert "hub\tnode\t15m" in out and "hub-kpi\tnode\t15m" in out

    # create: new store from a definition file; duplicate is an error
    newdef = tmp_path / "acme_node_1h.yaml"
    newdef.write_text(yaml.safe_dump({
        "data_source": "acme", "entity_type": "node", "granularity": "1h",
        "partition_size": "4d",
        "parts": [{"name": "acme_main_1h",
                   "trends": [{"name": "kwh", "data_type": "double precision"}]}],
    }))
    run(instance_dir, data_dir, "trend-store", "create", str(newdef))
    assert "OK" in capsys.readouterr().out
    with __import__("pytest").raises(SystemExit):
        run(instance_dir, data_dir, "trend-store", "create", str(newdef))
    capsys.readouterr()

    # add-parts + add-trends from an extended definition
    extdef = tmp_path / "acme_ext.yaml"
    extdef.write_text(yaml.safe_dump({
        "data_source": "acme", "entity_type": "node", "granularity": "1h",
        "parts": [
            {"name": "acme_main_1h",
             "trends": [{"name": "kwh", "data_type": "double precision"},
                        {"name": "temp", "data_type": "double precision"}]},
            {"name": "acme_aux_1h",
             "trends": [{"name": "events", "data_type": "bigint"}]},
        ],
    }))
    run(instance_dir, data_dir, "trend-store", "add-parts", str(extdef))
    assert "Added parts: acme_aux_1h" in capsys.readouterr().out
    run(instance_dir, data_dir, "trend-store", "add-trends", str(extdef))
    assert "Added trends: acme_main_1h.temp" in capsys.readouterr().out

    # show reflects the synced catalog
    run(instance_dir, data_dir, "trend-store", "show",
        "--data-source", "acme", "--entity-type", "node",
        "--granularity", "1h")
    out = capsys.readouterr().out
    assert "acme_aux_1h" in out and "temp: double precision" in out

    # remove-trends: definition without 'temp' drops it again
    run(instance_dir, data_dir, "trend-store", "remove-trends", str(newdef))
    assert "Removed trends: acme_main_1h.temp" in capsys.readouterr().out

    # delete unregisters
    run(instance_dir, data_dir, "trend-store", "delete",
        "--data-source", "acme", "--entity-type", "node",
        "--granularity", "1h")
    capsys.readouterr()
    run(instance_dir, data_dir, "trend-store", "list")
    assert "acme" not in capsys.readouterr().out


def test_cli_trend_store_change(instance_dir, data_dir, capsys, tmp_path):
    """trend-store change: one-shot definition sync (add + remove +
    alter in one pass); narrowing needs --force, widening doesn't."""
    import yaml

    basedef = tmp_path / "acme_node_1h.yaml"
    basedef.write_text(yaml.safe_dump({
        "data_source": "acme", "entity_type": "node", "granularity": "1h",
        "parts": [{"name": "acme_main_1h",
                   "trends": [
                       {"name": "kwh", "data_type": "integer"},
                       {"name": "old_metric", "data_type": "bigint"},
                   ]}],
    }))
    run(instance_dir, data_dir, "trend-store", "create", str(basedef))
    capsys.readouterr()

    newdef = tmp_path / "acme_changed.yaml"
    newdef.write_text(yaml.safe_dump({
        "data_source": "acme", "entity_type": "node", "granularity": "1h",
        "parts": [{"name": "acme_main_1h",
                   "trends": [
                       {"name": "kwh", "data_type": "double precision"},
                       {"name": "temp", "data_type": "real"},
                   ]}],
    }))
    run(instance_dir, data_dir, "trend-store", "change", str(newdef))
    out = capsys.readouterr().out
    assert "added ['temp']" in out
    assert "removed ['old_metric']" in out
    assert "changed ['kwh']" in out  # integer -> double = widening

    # idempotent second run
    run(instance_dir, data_dir, "trend-store", "change", str(newdef))
    assert "no changes were made" in capsys.readouterr().out

    # narrowing (double -> smallint) refused without --force
    narrow = tmp_path / "acme_narrow.yaml"
    narrow.write_text(yaml.safe_dump({
        "data_source": "acme", "entity_type": "node", "granularity": "1h",
        "parts": [{"name": "acme_main_1h",
                   "trends": [
                       {"name": "kwh", "data_type": "smallint"},
                       {"name": "temp", "data_type": "real"},
                   ]}],
    }))
    run(instance_dir, data_dir, "trend-store", "change", str(narrow))
    assert "no changes were made" in capsys.readouterr().out
    run(instance_dir, data_dir, "trend-store", "change", str(narrow),
        "--force")
    assert "changed ['kwh']" in capsys.readouterr().out


def test_cli_help_surface():
    """Every registered subcommand's argparse wiring parses --help
    (guards against a broken add_parser edit taking out the whole
    CLI)."""
    subcommands = [
        "load-data", "report", "retention", "aggregation-generate",
        "aggregation-compile", "aggregation-compile-all", "materialize",
        "live-monitor", "attribute", "attribute-store", "initialize",
        "structure", "deduce-config", "alter-trends", "load-sample-data",
        "generate-sample-data", "alias", "trigger", "relation",
        "virtual-entity", "notification-store", "partition",
        "trend-store", "trend-materialization", "curate", "corpus",
        "quick-start",
        "data-source", "entity-type",
    ]
    for name in subcommands:
        with pytest.raises(SystemExit) as exc:
            cli.main([name, "--help"])
        assert exc.value.code == 0, name


def test_cli_curate(spark, instance_dir, data_dir, tmp_path, capsys):
    """curate: the full pipeline through the CLI writes a shard table."""
    docs = spark.createDataFrame(
        [
            (i,
             f"the quick brown fox number {i} jumps over the lazy dog "
             f"and then walks to the old town square for some news",
             "en")
            for i in range(12)
        ],
        "doc_id bigint, text string, lang string",
    )
    dpath = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(dpath)
    out = str(tmp_path / "shards.parquet")
    run(instance_dir, data_dir, "curate", "--documents", dpath,
        "--output", out, "--shard-tokens", "40", "--source-col", "lang")
    msg = capsys.readouterr().out
    assert "curated" in msg and "shards" in msg
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "copy", "n_tokens", "shard_id"}
    assert got.count() > 0


def test_cli_process_modified_log(spark, instance_dir, data_dir, capsys):
    """process-modified-log compacts the append-only modified log to one
    row per (part, timestamp) without changing max(modified)."""
    from datetime import datetime

    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    ctx = initialize(spark, MinervaInstance.load(instance_dir), data_dir)
    raw = ctx.trend_stores["hub_node_15m"]
    for job in (1, 2, 3):  # three loads -> three log appends per ts
        raw.store(
            spark,
            spark.createDataFrame(
                [(1, datetime(2024, 1, 1, 0, 15), float(job))],
                "entity_id bigint, timestamp timestamp_ntz, power_kwh double",
            ),
            job_id=job,
            created=datetime(2024, 1, 2, job),
        )
    before = raw.read_modified_log(spark)
    keyed = before.groupBy("part", "timestamp").count().collect()
    assert any(r["count"] >= 3 for r in keyed)
    import pyspark.sql.functions as F

    max_before = before.agg(F.max("modified")).collect()[0][0]

    run(instance_dir, data_dir, "trend-store", "process-modified-log",
        "--data-source", "hub", "--entity-type", "node",
        "--granularity", "15m")
    assert "state rows" in capsys.readouterr().out

    after = raw.read_modified_log(spark)
    assert after.groupBy("part", "timestamp").count().agg(
        F.max("count")).collect()[0][0] == 1
    assert after.agg(F.max("modified")).collect()[0][0] == max_before


def test_cli_trend_store_check_config(
    spark, instance_dir, data_dir, capsys, tmp_path
):
    """check-config: tiny instance is clean; a definition with duplicate
    parts / bad types / bad granularity reports each error."""
    import yaml

    import pytest

    run(instance_dir, data_dir, "trend-store", "check-config")
    out = capsys.readouterr().out
    assert "All trend stores Ok" in out

    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.safe_dump({
        "data_source": "x", "entity_type": "node", "granularity": "sometimes",
        "parts": [
            {"name": "dup", "trends": [{"name": "a", "data_type": "nope"}]},
            {"name": "dup", "trends": []},
        ],
    }))
    with pytest.raises(SystemExit):
        run(instance_dir, data_dir, "trend-store", "check-config", str(bad))
    out = capsys.readouterr().out
    assert "2 parts named 'dup'" in out
    assert "unknown data type 'nope'" in out
    assert "unparsable granularity" in out


def test_cli_attribute_store_catalog_admin(
    spark, instance_dir, data_dir, capsys, tmp_path
):
    """attribute-store create/add-attribute/remove-attribute/show/list
    sync the instance attribute YAML (reference
    `commands/attribute_store.py:47-253`)."""
    import yaml

    import pytest

    run(instance_dir, data_dir, "attribute-store", "list")
    assert "hub-class_node" in capsys.readouterr().out

    newdef = tmp_path / "geo_node.yaml"
    newdef.write_text(yaml.safe_dump({
        "data_source": "geo", "entity_type": "node",
        "attributes": [{"name": "region", "data_type": "text"}],
    }))
    run(instance_dir, data_dir, "attribute-store", "create", str(newdef))
    assert "created attribute store geo_node" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        run(instance_dir, data_dir, "attribute-store", "create", str(newdef))
    capsys.readouterr()

    run(instance_dir, data_dir, "attribute-store", "add-attribute",
        "geo_node", "--attribute-name", "zone", "--data-type", "smallint")
    capsys.readouterr()
    run(instance_dir, data_dir, "attribute-store", "show", "geo_node")
    out = capsys.readouterr().out
    assert "region: text" in out and "zone: smallint" in out

    run(instance_dir, data_dir, "attribute-store", "remove-attribute",
        "geo_node", "--attribute-name", "region")
    capsys.readouterr()
    run(instance_dir, data_dir, "attribute-store", "show", "geo_node")
    out = capsys.readouterr().out
    assert "zone" in out and "region" not in out


def test_cli_load_data_attribute_target(spark, instance_dir, data_dir, capsys, tmp_path):
    """load-data --target attribute routes a harvest CSV into the
    instance's attribute store (staging-merge + curr)."""
    csv = tmp_path / "attrs.csv"
    csv.write_text(
        "node,timestamp,power_class\n"
        "alpha,2024-01-01 00:00:00,low\n"
        "beta,2024-01-01 00:00:00,high\n"
    )
    run(
        instance_dir, data_dir, "load-data",
        "--target", "attribute",
        "--data-source", "hub-class", "--entity-type", "node",
        "--identifier-column", "node",
        str(csv),
    )
    out = capsys.readouterr().out
    assert "(attribute)" in out

    from minerva_etl_spark.store.attribute_store import AttributeStore

    store = AttributeStore("hub-class", "node", ["power_class"], data_dir)
    hist = {r.power_class for r in store.read_history(spark).collect()}
    assert hist == {"low", "high"}


def test_cli_instance_wide_report(spark, instance_dir, data_dir, capsys, tmp_path):
    """report without --data-source: the reference's instance-wide
    metrics (entity counts, trend-part records/trends, attribute
    stores)."""
    csv = tmp_path / "r.csv"
    csv.write_text(
        "node,timestamp,power_kwh\n"
        "alpha,2024-01-01 00:15:00,1.5\n"
        "beta,2024-01-01 00:15:00,2.5\n"
    )
    run(instance_dir, data_dir, "load-data",
        "--data-source", "hub", "--entity-type", "node",
        "--granularity", "15m", "--identifier-column", "node", str(csv))
    capsys.readouterr()
    run(instance_dir, data_dir, "report")
    out = capsys.readouterr().out
    assert "Number of entity types: 1" in out
    assert "Total number of entities: 2" in out
    assert "node_main_15m" in out and "Trend Store Metrics" in out
    assert "hub-class_node: history rows=0 attributes=1" in out


def test_cli_generate_sample_data(spark, instance_dir, data_dir, capsys, tmp_path):
    """generate-sample-data: definition.yaml generators run without
    loading; fallback emits one deterministic CSV per declared store."""
    # fallback path (tiny instance has no definition.yaml)
    tgt = tmp_path / "gen"
    run(instance_dir, data_dir, "generate-sample-data",
        "-t", str(tgt), "--timestamp", "2024-03-01T00:00:00")
    out = capsys.readouterr().out
    assert out.count("Generated file") == 2  # hub + hub-kpi stores
    csvs = sorted(p.name for p in tgt.glob("*.csv"))
    assert csvs == ["hub-kpi_node_15m.csv", "hub_node_15m.csv"]
    part = next((tgt / "hub_node_15m.csv").glob("part-*.csv"))
    header = part.read_text().splitlines()[0]
    assert "entity_ref" in header and "power_kwh" in header

    # definition.yaml path: a native generator module
    sd = __import__("pathlib").Path(instance_dir) / "sample-data"
    (sd / "definition.yaml").write_text(
        "- native:\n    name: gen_demo\n    granularity: 1h\n"
    )
    (sd / "gen_demo.py").write_text(
        "def generate(target_dir, timestamp, granularity):\n"
        "    p = str(target_dir) + '/demo.csv'\n"
        "    open(p, 'w').write(f'ts,{granularity}\\n{timestamp},1\\n')\n"
        "    yield p\n"
    )
    tgt2 = tmp_path / "gen2"
    run(instance_dir, data_dir, "generate-sample-data",
        "-t", str(tgt2), "--timestamp", "2024-03-01T10:30:00")
    out = capsys.readouterr().out
    assert "demo.csv" in out
    body = (tgt2 / "demo.csv").read_text()
    assert "2024-03-01 10:00:00" in body  # truncated to the 1h label


def test_cli_corpus_split_and_cap(tmp_path, spark):
    """`minerva-spark corpus split|cap` round-trip over a small parquet."""
    from minerva_etl_spark.cli import main

    docs = spark.createDataFrame(
        [(i, f"some distinct body text number {i} with words", "en",
          "web", 40 + i) for i in range(20)],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    out1 = str(tmp_path / "split")
    main(["corpus", "split", "--input", src, "--output", out1,
          "--fractions", "train=0.8,val=0.2", "--seed", "3"])
    got = spark.read.parquet(out1)
    assert got.count() == 20
    assert set(got.columns) == {"doc_id", "component_id", "split_bucket",
                                "split"}
    assert {r.split for r in got.collect()} <= {"train", "val"}

    out2 = str(tmp_path / "cap")
    main(["corpus", "cap", "--input", src, "--output", out2,
          "--keys", "source", "--order-col", "n_chars", "--n", "3"])
    capped = spark.read.parquet(out2)
    assert capped.count() == 3
    assert {r.doc_id for r in capped.collect()} == {19, 18, 17}


def test_cli_corpus_preference_pairs(tmp_path, spark):
    """`corpus preference-pairs` builds DPO pairs with the margin flag."""
    from minerva_etl_spark.cli import main

    cands = spark.createDataFrame(
        [(1, 1, "good", 9.0), (1, 2, "bad", 1.0),
         (2, 1, "meh", 5.0), (2, 2, "meh2", 4.5)],
        "prompt_id bigint, cand_id bigint, response string, score double",
    )
    src = str(tmp_path / "cands")
    cands.write.parquet(src)

    out = str(tmp_path / "pairs")
    main(["corpus", "preference-pairs", "--input", src, "--output", out,
          "--min-margin", "2.0"])
    got = spark.read.parquet(out)
    rows = got.collect()
    assert len(rows) == 1 and rows[0].prompt_id == 1
    assert rows[0].chosen == "good" and rows[0].rejected == "bad"


def test_cli_corpus_code_profile(tmp_path, spark):
    """`corpus code-profile` profiles a code parquet — language from
    shebang/extension, line stats, license sniff."""
    from minerva_etl_spark.cli import main

    files = spark.createDataFrame(
        [(1, "a.py", "# Copyright 2020\nx = 1\n"),
         (2, "run", "#!/bin/bash\necho hi\n")],
        "file_id bigint, path string, content string",
    )
    src = str(tmp_path / "code")
    files.write.parquet(src)

    out = str(tmp_path / "prof")
    main(["corpus", "code-profile", "--input", src, "--output", out])
    got = {r.file_id: r for r in spark.read.parquet(out).collect()}
    assert got[1].language == "python" and got[1].has_license
    assert got[2].language == "shell" and not got[2].has_license

    # --path-col '' drops the extension map: only the shebang resolves
    out2 = str(tmp_path / "prof2")
    main(["corpus", "code-profile", "--input", src, "--output", out2,
          "--path-col", ""])
    got2 = {r.file_id: r for r in spark.read.parquet(out2).collect()}
    assert got2[1].language == "unknown" and got2[2].language == "shell"


def test_cli_corpus_code_dedup_and_fim(tmp_path, spark):
    """`corpus code-dedup` collapses reformatted twins; `corpus fim`
    renders the sentinel string at the given rate."""
    from minerva_etl_spark.cli import main

    files = spark.createDataFrame(
        [(1, "a.c", "int f() {\n  return 1;\n}"),
         (2, "b.c", "// mirror\nint f() {\n\n  return 1;\n}"),
         (3, "c.c", "int g() { return 2; }")],
        "file_id bigint, path string, content string",
    )
    src = str(tmp_path / "code")
    files.write.parquet(src)

    out = str(tmp_path / "groups")
    main(["corpus", "code-dedup", "--input", src, "--output", out])
    groups = {r.canonical_id: r.n_files
              for r in spark.read.parquet(out).collect()}
    assert groups == {1: 2, 3: 1}

    out2 = str(tmp_path / "fim")
    main(["corpus", "fim", "--input", src, "--output", out2,
          "--rate", "1.0", "--seed", "3"])
    rows = spark.read.parquet(out2).collect()
    assert all(r.fim_applied == 1 for r in rows)
    assert all(r.fim_text.startswith("<|fim_prefix|>") for r in rows)


def test_cli_corpus_increment_and_pack_ids(tmp_path, spark):
    """`corpus increment` runs a two-delivery dedup through a persisted
    state; `corpus pack-ids` writes packed token-id sequences."""
    from minerva_etl_spark.cli import main

    docs1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally different corpus body here")],
        "doc_id bigint, text string",
    )
    docs2 = spark.createDataFrame(
        [(4, "alpha beta gamma delta epsilon zeta"),
         (5, "never seen before text body")],
        "doc_id bigint, text string",
    )
    src1, src2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    docs1.write.parquet(src1)
    docs2.write.parquet(src2)
    state = str(tmp_path / "state")

    out1 = str(tmp_path / "dec1")
    main(["corpus", "increment", "--input", src1, "--output", out1,
          "--state", state])
    dec1 = {r.doc_id: r.keep for r in spark.read.parquet(out1).collect()}
    assert dec1 == {1: True, 2: False, 3: True}

    out2 = str(tmp_path / "dec2")
    main(["corpus", "increment", "--input", src2, "--output", out2,
          "--state", state])
    dec2 = {r.doc_id: r for r in spark.read.parquet(out2).collect()}
    assert dec2[4].exact_dup_of == 1 and not dec2[4].keep  # dups history
    assert dec2[5].keep

    packed = str(tmp_path / "packed")
    main(["corpus", "pack-ids", "--input", src1, "--output", packed,
          "--n", "4", "--seq-len", "8"])
    back = spark.read.parquet(packed)
    assert back.count() > 0
    assert "token_ids" in back.columns


def test_cli_media_verbs(tmp_path, spark):
    """`media png-features` / `png-resize` / `wav-features` round-trip
    real codec bytes through the CLI surface."""
    from minerva_etl_spark.cli import main
    from minerva_etl_spark.operators.multimodal import (
        synthesize_png,
        synthesize_wav,
    )

    px = bytes((y * 31 + x * 13 + c * 101) % 256
               for y in range(6) for x in range(8) for c in range(3))
    pngs = spark.createDataFrame(
        [(1, synthesize_png(px, 8, 6, 3, [0, 1, 2, 3, 4, 1]))],
        "media_id bigint, payload binary",
    )
    wavs = spark.createDataFrame(
        [(7, synthesize_wav([100, -100, 50, -50], 8000))],
        "media_id bigint, payload binary",
    )
    src_png, src_wav = str(tmp_path / "png"), str(tmp_path / "wav")
    pngs.write.parquet(src_png)
    wavs.write.parquet(src_wav)

    out = str(tmp_path / "feat")
    main(["media", "png-features", "--input", src_png, "--output", out])
    r = spark.read.parquet(out).collect()[0]
    assert (r.width, r.height, r.n_channels) == (8, 6, 3)

    resized = str(tmp_path / "small")
    main(["media", "png-resize", "--input", src_png, "--output", resized,
          "--width", "4", "--height", "3"])
    out2 = str(tmp_path / "feat2")
    main(["media", "png-features", "--input", resized, "--output", out2])
    r2 = spark.read.parquet(out2).collect()[0]
    assert (r2.width, r2.height) == (4, 3)

    out3 = str(tmp_path / "wfeat")
    main(["media", "wav-features", "--input", src_wav, "--output", out3])
    w = spark.read.parquet(out3).collect()[0]
    assert w.sample_rate == 8000 and w.n_frames == 4


def test_cli_media_image_dedup(tmp_path, spark):
    """`media image-dhash` hashes decoded pixels; `image-dedup` pairs
    a brightness twin at the hamming radius."""
    from minerva_etl_spark.cli import main
    from minerva_etl_spark.operators.multimodal import synthesize_png

    base = bytes((17 * i + (i % 7) * 11) % 200
                 for i in range(9 * 8 * 3))
    twin = bytes(v + 3 for v in base)
    grad = bytes(v for x in range(9) for _ in range(8)
                 for v in (x * 28, x * 28, x * 28))
    imgs = spark.createDataFrame(
        [(1, synthesize_png(base, 9, 8, 3)),
         (2, synthesize_png(twin, 9, 8, 3)),
         (3, synthesize_png(grad, 9, 8, 3))],
        "media_id bigint, payload binary",
    )
    src = str(tmp_path / "imgs")
    imgs.write.parquet(src)

    out = str(tmp_path / "hashes")
    main(["media", "image-dhash", "--input", src, "--output", out])
    assert spark.read.parquet(out).count() == 3

    out2 = str(tmp_path / "pairs")
    main(["media", "image-dedup", "--input", src, "--output", out2,
          "--radius", "2"])
    pairs = spark.read.parquet(out2).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_cli_corpus_budget_select(tmp_path, spark):
    """`corpus budget-select` keeps top-priority docs per source until
    the token budget fills; sources without a budget drop."""
    from minerva_etl_spark.cli import main

    docs = spark.createDataFrame(
        [(1, "web", 40, 9.0), (2, "web", 40, 8.0), (3, "web", 40, 7.0),
         (4, "books", 5, 1.0)],
        "file_id bigint, source string, n_tokens int, quality double",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    out = str(tmp_path / "kept")
    main(["corpus", "budget-select", "--input", src, "--output", out,
          "--budget", "web=90", "--priority-col", "quality"])
    kept = sorted(r.file_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 2]


def test_cli_media_audio_dedup(tmp_path, spark):
    """`media audio-dedup` pairs a DC-shifted clip via the shared
    band join."""
    from minerva_etl_spark.cli import main
    from minerva_etl_spark.operators.multimodal import synthesize_wav

    n = 65 * 64
    base = [((i * 7) % 97) - 48 + (150 if (i // 64) % 5 < 2 else 0)
            for i in range(n)]
    clips = spark.createDataFrame(
        [(1, synthesize_wav(base, 8000)),
         (2, synthesize_wav([v + 2 for v in base], 8000)),
         (3, synthesize_wav(base[::-1], 8000))],
        "media_id bigint, payload binary",
    )
    src = str(tmp_path / "clips")
    clips.write.parquet(src)

    out = str(tmp_path / "pairs")
    main(["media", "audio-dedup", "--input", src, "--output", out])
    pairs = spark.read.parquet(out).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_cli_media_video_dedup(tmp_path, spark):
    """`media video-dedup` pairs clips sharing a frame."""
    from minerva_etl_spark.cli import main
    from minerva_etl_spark.operators.multimodal import synthesize_avi

    def frame(seed: int) -> bytes:
        return bytes((seed * 29 + 17 * i + (i % 7) * 11) % 200
                     for i in range(9 * 8 * 3))

    clips = spark.createDataFrame(
        [(1, synthesize_avi([frame(1), frame(2)], 9, 8)),
         (2, synthesize_avi([frame(2), frame(3)], 9, 8)),
         (3, synthesize_avi([frame(4)], 9, 8))],
        "media_id bigint, payload binary",
    )
    src = str(tmp_path / "clips")
    clips.write.parquet(src)

    out = str(tmp_path / "pairs")
    main(["media", "video-dedup", "--input", src, "--output", out,
          "--radius", "0"])
    pairs = spark.read.parquet(out).collect()
    assert [(p.id_a, p.id_b, p.n_frame_matches) for p in pairs] == [
        (1, 2, 1)
    ]


def test_cli_corpus_secrets(tmp_path, spark):
    """`corpus secrets` counts and redacts planted tokens in place."""
    from minerva_etl_spark.cli import main

    aws = "AKIA" + "A1B2C3D4E5F6G7H8"
    files = spark.createDataFrame(
        [(1, "a.py", f'k = "{aws}"'), (2, "b.py", "x = 1")],
        "file_id bigint, path string, content string",
    )
    src = str(tmp_path / "code")
    files.write.parquet(src)

    out = str(tmp_path / "scan")
    main(["corpus", "secrets", "--input", src, "--output", out])
    got = {r.file_id: r for r in spark.read.parquet(out).collect()}
    assert got[1].n_secrets == 1 and "<SECRET:aws_key>" in got[1].redacted
    assert aws not in got[1].redacted
    assert got[2].n_secrets == 0 and got[2].redacted == "x = 1"


def test_cli_media_image_increment(tmp_path, spark):
    """`media image-increment` runs a two-delivery dedup through a
    persisted dHash state; --state is required."""
    import pytest

    from minerva_etl_spark.cli import main
    from minerva_etl_spark.operators.multimodal import synthesize_png

    def img(seed, dc=0):
        return synthesize_png(
            bytes((seed * 29 + i * (13 + seed * 2) + (i % 7) * 11)
                  % 200 + dc for i in range(9 * 8 * 3)),
            9, 8, 3,
        )

    state = str(tmp_path / "state")
    p1 = spark.createDataFrame(
        [(1, img(1))], "media_id bigint, payload binary"
    )
    p2 = spark.createDataFrame(
        [(2, img(1, dc=3)), (3, img(5))],
        "media_id bigint, payload binary",
    )
    src1, src2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    p1.write.parquet(src1)
    p2.write.parquet(src2)

    out1 = str(tmp_path / "d1")
    main(["media", "image-increment", "--input", src1, "--output", out1,
          "--state", state])
    assert spark.read.parquet(out1).collect()[0].keep

    out2 = str(tmp_path / "d2")
    main(["media", "image-increment", "--input", src2, "--output", out2,
          "--state", state])
    d2 = {r.media_id: r for r in spark.read.parquet(out2).collect()}
    assert d2[2].near_dup_of == 1 and not d2[2].keep
    assert d2[3].keep

    with pytest.raises(SystemExit):
        main(["media", "image-increment", "--input", src1,
              "--output", out1])


def test_cli_corpus_pack_ids_binary(tmp_path, spark):
    """`corpus pack-ids --binary` writes .bin/.idx shards + manifest."""
    import glob

    from minerva_etl_spark.cli import main

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id bigint, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "bin")
    main(["corpus", "pack-ids", "--input", src, "--output", out,
          "--n", "6", "--seq-len", "4", "--binary"])
    assert glob.glob(out + "/shard-*.bin") and glob.glob(out + "/shard-*.idx")
    assert spark.read.parquet(out + "/_manifest").count() >= 1


def test_cli_media_avi_verbs(tmp_path, spark):
    from minerva_etl_spark.cli import main
    from minerva_etl_spark.operators.multimodal import synthesize_avi

    frames = [bytes((f * 40 + i) % 256 for i in range(4 * 3 * 3))
              for f in range(4)]
    media = spark.createDataFrame(
        [(1, synthesize_avi(frames, 4, 3, fps=10))],
        "media_id bigint, payload binary",
    )
    src = str(tmp_path / "avi")
    media.write.parquet(src)
    out = str(tmp_path / "feat")
    main(["media", "avi-features", "--input", src, "--output", out])
    r = spark.read.parquet(out).collect()[0]
    assert (r.width, r.height, r.fps, r.n_frames) == (4, 3, 10, 4)
    out2 = str(tmp_path / "frames")
    main(["media", "avi-frames", "--input", src, "--output", out2,
          "--frame-stride", "2", "--n", "2"])
    kept = spark.read.parquet(out2).select("frame_idx").collect()
    assert sorted(r.frame_idx for r in kept) == [0, 2]


def test_cli_corpus_decontaminate(tmp_path, spark):
    from minerva_etl_spark.cli import main

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated corpus text body with no overlap")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy")],
        "doc_id bigint, text string",
    )
    src, bsrc = str(tmp_path / "docs"), str(tmp_path / "bench")
    docs.write.parquet(src)
    bench.write.parquet(bsrc)
    out = str(tmp_path / "clean")
    main(["corpus", "decontaminate", "--input", src, "--output", out,
          "--benchmark", bsrc])
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {2}

    # the bloom scale path must keep the same documents
    out2 = str(tmp_path / "clean_bloom")
    main(["corpus", "decontaminate", "--input", src, "--output", out2,
          "--benchmark", bsrc, "--bloom-bits", "8192"])
    kept2 = {r.doc_id for r in spark.read.parquet(out2).collect()}
    assert kept2 == {2}


def test_cli_corpus_ivf_verbs(tmp_path, spark):
    """`corpus ivf-build` / `ivf-increment` / `ivf-query`: the
    persisted-centroid retrieval protocol end-to-end from the CLI —
    build on delivery 1, assign delivery 2 against the frozen
    centroids, query across both."""
    from minerva_etl_spark.cli import main

    def vec(i):
        base = [[1.0, 0.0], [0.0, 1.0]][i % 2]
        return base + [0.001 * i] * 2

    ddl = "vec_id bigint, embedding array<double>"
    d1 = spark.createDataFrame([(i, vec(i)) for i in range(8)], ddl)
    d2 = spark.createDataFrame([(i, vec(i)) for i in range(8, 12)], ddl)
    src1, src2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    d1.write.parquet(src1)
    d2.write.parquet(src2)
    state = str(tmp_path / "ivf")

    out1 = str(tmp_path / "a1")
    main(["corpus", "ivf-build", "--input", src1, "--output", out1,
          "--state", state, "--n", "2"])
    assert spark.read.parquet(out1).count() == 8

    out2 = str(tmp_path / "a2")
    main(["corpus", "ivf-increment", "--input", src2, "--output", out2,
          "--state", state])
    assert spark.read.parquet(out2).count() == 4
    assert spark.read.parquet(state + "/assigned").count() == 12

    qsrc = str(tmp_path / "q")
    spark.createDataFrame([(100, vec(10))], ddl).write.parquet(qsrc)
    out3 = str(tmp_path / "hits")
    main(["corpus", "ivf-query", "--input", qsrc, "--output", out3,
          "--state", state, "--n", "12"])
    hits = {r.vec_id for r in spark.read.parquet(out3).collect()}
    # even ids share vector-10's direction, across BOTH deliveries
    assert hits & {0, 2, 4, 6} and hits & {8, 10}

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["corpus", "ivf-query", "--input", qsrc, "--output", out3])


def test_cli_corpus_bpe_byte_fallback(tmp_path, spark):
    """`corpus bpe --byte-fallback` emits token-id arrays through the
    persisted-vocab byte-fallback encoder — no -1, no drops (r14)."""
    from minerva_etl_spark.cli import main

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "cats chase rats on mats"),
         (3, "quiz with unseen q letters")],
        "doc_id bigint, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "ids")
    main(["corpus", "bpe", "--input", src, "--output", out,
          "--n", "4", "--byte-fallback"])
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2, 3}
    for r in got.values():
        assert r.n_bpe_tokens == len(r.token_ids)
        assert all(i is not None and i >= 0 for i in r.token_ids)
