"""The §3.3 compile path end-to-end: `aggregation generate` over a raw
store emits ladder YAML; `initialize` compiles it; the fingerprint
engine materializes the generated view; values match the operator API."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.catalog.aggregation_compile import (
    generate_time_aggregations,
    write_generated,
)
from minerva_etl_spark.catalog.initialize import initialize
from minerva_etl_spark.catalog.instance import MinervaInstance, TrendStoreDef

RAW_YAML = {
    "data_source": "hub",
    "entity_type": "node",
    "granularity": "15m",
    "partition_size": "1d",
    "title": "raw node data",
    "parts": [
        {
            "name": "node_main_15m",
            "trends": [
                {"name": "power_kwh", "data_type": "double precision",
                 "time_aggregation": "sum", "entity_aggregation": "sum"},
                {"name": "inside_temp", "data_type": "double precision",
                 "time_aggregation": "avg", "entity_aggregation": "avg"},
            ],
        }
    ],
}


def test_generate_shapes():
    store = TrendStoreDef.from_dict(RAW_YAML)
    gen = generate_time_aggregations(store)
    # 15m -> 1h, 1d direct; 1w, 1month CHAINED from the generated 1d
    # (reference STANDARD_AGGREGATIONS, aggregation_generation.py:27-44)
    targets = {m["target_trend_store_part"] for _, m in gen}
    assert targets == {
        "node_main_1h", "node_main_1d", "node_main_1w", "node_main_1month",
    }
    store_1h = next(s for s, _ in gen if s["granularity"] == "1h")
    names = [t["name"] for t in store_1h["parts"][0]["trends"]]
    assert names == ["samples", "power_kwh", "inside_temp"]
    # type promotion: sum(double)->double; samples injected as integer
    mat_1h = next(m for _, m in gen if m["target_trend_store_part"] == "node_main_1h")
    assert 'trend."node_main_15m"' in mat_1h["view"]
    assert "GROUP BY" in mat_1h["view"]
    assert "count(*)" in mat_1h["view"].lower()
    # chained rung: reads the generated 1d part, rolls samples up with
    # SUM, and no samples double-spec appears
    mat_1w = next(m for _, m in gen if m["target_trend_store_part"] == "node_main_1w")
    assert 'trend."node_main_1d"' in mat_1w["view"]
    assert mat_1w["sources"] == [{"trend_store_part": "node_main_1d"}]
    assert "SUM(samples)" in mat_1w["view"]
    assert "count(*)" not in mat_1w["view"].lower()


def test_generated_ladder_runs(spark, tmp_path):
    instance_dir = tmp_path / "instance"
    (instance_dir / "trend").mkdir(parents=True)
    import yaml

    (instance_dir / "trend" / "hub_node_15m.yaml").write_text(
        yaml.safe_dump(RAW_YAML, sort_keys=False)
    )
    store = TrendStoreDef.from_dict(RAW_YAML)
    write_generated(instance_dir, store)

    inst = MinervaInstance.load(instance_dir)
    assert len(inst.trend_stores) == 5  # raw + 1h + 1d + 1w + 1month
    assert len(inst.materializations) == 4

    ctx = initialize(spark, inst, str(tmp_path / "data"))
    raw = ctx.trend_stores["hub_node_15m"]
    pkg = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 15), 1.0, 20.0),
            (1, datetime(2024, 1, 1, 0, 30), 2.0, 22.0),
            (1, datetime(2024, 1, 1, 1, 15), 4.0, 24.0),
        ],
        "entity_id bigint, timestamp timestamp_ntz, power_kwh double, inside_temp double",
    )
    raw.store(spark, pkg)

    # generated defaults gate on processing_delay=30m/reprocessing=3d;
    # our data is synthetic-old, so loosen the registered delays
    for mat in ctx.engine.materializations.values():
        mat.processing_delay = timedelta(0)
        mat.stability_delay = timedelta(0)
        mat.reprocessing_period = timedelta(days=365 * 100)

    done = ctx.materialize_stale(datetime.utcnow() + timedelta(minutes=1))
    assert len(done) >= 2
    hourly = {
        r.timestamp: (r.samples, r.power_kwh, r.inside_temp)
        for r in ctx.read_part("node_main_1h").collect()
    }
    assert hourly[datetime(2024, 1, 1, 1, 0)] == (2, 3.0, 21.0)
    assert hourly[datetime(2024, 1, 1, 2, 0)] == (1, 4.0, 24.0)

    # chained rungs: materializing 1d marks node_main_1d modified, so a
    # SECOND scheduling pass finds the 1w/1month rungs stale and rolls
    # the 1d samples up (3 raw rows -> one weekly bucket, samples=3)
    done2 = ctx.materialize_stale(datetime.utcnow() + timedelta(minutes=2))
    assert {name for name, _ in done2} >= {"node_main_1w", "node_main_1month"}
    weekly = {
        r.timestamp: (r.samples, r.power_kwh, r.inside_temp)
        for r in ctx.read_part("node_main_1w").collect()
    }
    assert list(weekly.values()) == [(3, 7.0, 22.0)]


def test_cli_compile_lifecycle_matches_library(spark, tmp_path, capsys):
    """The full file-to-file workflow through the CLI —
    ``aggregation-generate --definitions --with-relations`` → (user
    tunes the definition) → ``aggregation-compile-all`` →
    ``load-data`` → ``relation materialize`` → ``materialize`` —
    read-back hash-matches the fused generate path (reference
    `commands/aggregation.py:26-117`).  Covers a relation: entity
    aggregations are generated for the raw store AND each time rung
    (reference `generate_aggregations`), and the raw + 1h-rung entity
    parts ride the hash."""
    import hashlib

    import yaml

    from minerva_etl_spark import cli

    csv_path = tmp_path / "sample.csv"
    csv_path.write_text(
        "entity,timestamp,power_kwh,inside_temp\n"
        "n1,2024-01-01 00:15:00,1.0,20.0\n"
        "n1,2024-01-01 00:30:00,2.0,22.0\n"
        "n1,2024-01-01 01:15:00,4.0,24.0\n"
        "n2,2024-01-01 00:45:00,8.0,18.0\n"
    )
    relation_yaml = {
        "name": "node->site",
        "source_entity_type": "node",
        "target_entity_type": "site",
        "query": (
            'SELECT n.id AS source_id, CAST(1 AS BIGINT) AS target_id '
            'FROM entity."node" n'
        ),
    }

    def read_back_hash(instance_dir, data_dir):
        ctx = initialize(
            spark, MinervaInstance.load(instance_dir), str(data_dir)
        )
        rows = []
        for part in (
            "node_main_1h",              # time rung
            "node__site_node_main_15m",  # entity agg of the raw store
            "node__site_node_main_1h",   # entity agg of the 1h rung
        ):
            part_rows = sorted(
                (part, r.entity_id, r.timestamp, r.samples,
                 r.power_kwh, r.inside_temp)
                for r in ctx.read_part(part).collect()
            )
            assert part_rows, f"materialization produced no {part} rows"
            rows.extend(part_rows)
        return hashlib.md5(repr(rows).encode()).hexdigest()

    def loosen(instance_dir):
        # 2024 demo data sits outside the generated 3d reprocessing
        # window; widen it like the tiny instance does (260w)
        mdir = instance_dir / "materialization"
        for p in mdir.glob("*.yaml"):
            d = yaml.safe_load(p.read_text())
            d["reprocessing_period"] = "260w"
            p.write_text(yaml.safe_dump(d, sort_keys=False))

    def load_and_materialize(instance_dir, data_dir):
        cli.main([
            "--instance", str(instance_dir), "--data-dir", str(data_dir),
            "load-data", "--data-source", "hub", "--entity-type", "node",
            "--granularity", "15m", str(csv_path),
        ])
        cli.main([
            "--instance", str(instance_dir), "--data-dir", str(data_dir),
            "relation", "materialize",
        ])
        from datetime import datetime, timedelta, timezone

        later = (
            datetime.now(timezone.utc).replace(tzinfo=None)
            + timedelta(minutes=10)
        ).isoformat()
        # two passes: rung-sourced entity aggregations become stale
        # only once their rung part is written by the first pass
        for _ in range(2):
            cli.main([
                "--instance", str(instance_dir), "--data-dir", str(data_dir),
                "materialize", "--now", later,
            ])

    def seed_instance(root):
        (root / "trend").mkdir(parents=True)
        (root / "relation").mkdir()
        (root / "trend" / "hub_node_15m.yaml").write_text(
            yaml.safe_dump(RAW_YAML, sort_keys=False)
        )
        (root / "relation" / "node_site.yaml").write_text(
            yaml.safe_dump(relation_yaml, sort_keys=False)
        )

    # --- CLI path: generate definitions, tune, compile-all
    cli_inst, cli_data = tmp_path / "cli_inst", tmp_path / "cli_data"
    seed_instance(cli_inst)
    cli.main(["--instance", str(cli_inst), "--data-dir", str(cli_data),
              "aggregation-generate", "--definitions", "--with-relations"])
    out = capsys.readouterr().out
    assert "aggregation" in out
    # user tune step on the authored definitions: widen reprocessing
    # (time and entity flavors both carry the knob)
    for p in (cli_inst / "aggregation").glob("*.yaml"):
        d = yaml.safe_load(p.read_text())
        inner = d.get("time_aggregation") or d.get("entity_aggregation")
        inner["reprocessing_period"] = "260w"
        p.write_text(yaml.safe_dump(d, sort_keys=False))
    cli.main(["--instance", str(cli_inst), "--data-dir", str(cli_data),
              "aggregation-compile-all"])
    assert "compiled" in capsys.readouterr().out
    load_and_materialize(cli_inst, cli_data)

    # --- fused path: aggregation-generate --with-relations
    lib_inst, lib_data = tmp_path / "lib_inst", tmp_path / "lib_data"
    seed_instance(lib_inst)
    cli.main(["--instance", str(lib_inst), "--data-dir", str(lib_data),
              "aggregation-generate", "--with-relations"])
    loosen(lib_inst)
    load_and_materialize(lib_inst, lib_data)

    assert read_back_hash(cli_inst, cli_data) == read_back_hash(
        lib_inst, lib_data
    )


def test_entity_definition_compile_matches_fused(tmp_path):
    """An entity_aggregation definition compiled via
    compile_aggregation_definition yields the same materialization view
    and derived store content as the fused generate_entity_aggregation
    path."""
    import yaml

    from minerva_etl_spark.catalog.aggregation_compile import (
        compile_all_aggregations,
        generate_entity_aggregation,
        write_generated_entity_definitions,
    )

    root = tmp_path / "inst"
    (root / "trend").mkdir(parents=True)
    (root / "trend" / "hub_node_15m.yaml").write_text(
        yaml.safe_dump(RAW_YAML, sort_keys=False)
    )
    store = TrendStoreDef.from_dict(RAW_YAML)
    paths = write_generated_entity_definitions(
        root, store, "hub_node_15m", "node->v-site", "v-site"
    )
    assert len(paths) == 1
    written = compile_all_aggregations(root)
    assert len(written) == 2  # one materialization + one store file

    fused_store, fused_mat = generate_entity_aggregation(
        store, "node->v-site", "v-site"
    )[0]
    compiled_mat = yaml.safe_load(
        (root / "materialization" / "node__v_site_node_main_15m.yaml")
        .read_text()
    )
    assert compiled_mat == fused_mat
    compiled_store = yaml.safe_load(
        (root / "trend" / "node__v_site_hub_node_15m.yaml").read_text()
    )
    assert compiled_store["parts"] == fused_store["parts"]
    assert compiled_store["entity_type"] == fused_store["entity_type"]


def test_generated_entity_aggregation_runs(spark, tmp_path):
    """Entity aggregation across a relation through the generated-YAML +
    initialize + fingerprint-engine path (A2/A4/J1)."""
    import yaml

    from minerva_etl_spark.catalog.aggregation_compile import (
        generate_entity_aggregation,
    )

    store = TrendStoreDef.from_dict(RAW_YAML)
    pairs = generate_entity_aggregation(store, "node->v-site", "v-site")
    assert len(pairs) == 1
    store_yaml, mat_yaml = pairs[0]
    assert mat_yaml["target_trend_store_part"] == "node__v_site_node_main_15m"
    assert 'relation."node__v_site"' in mat_yaml["view"]

    instance_dir = tmp_path / "instance"
    (instance_dir / "trend").mkdir(parents=True)
    (instance_dir / "materialization").mkdir(parents=True)
    (instance_dir / "trend" / "raw.yaml").write_text(
        yaml.safe_dump(RAW_YAML, sort_keys=False)
    )
    (instance_dir / "trend" / "vsite.yaml").write_text(
        yaml.safe_dump(store_yaml, sort_keys=False)
    )
    (instance_dir / "materialization" / "ea.yaml").write_text(
        yaml.safe_dump(mat_yaml, sort_keys=False)
    )

    ctx = initialize(spark, MinervaInstance.load(instance_dir), str(tmp_path / "d"))
    # relation: nodes 1,2 -> site 100; node 3 -> site 200
    ctx.relations.materialize(
        spark, "node->v-site",
        spark.createDataFrame(
            [(1, 100), (2, 100), (3, 200)], "source_id bigint, target_id bigint"
        ),
    )
    raw = ctx.trend_stores["hub_node_15m"]
    raw.store(spark, spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 15), 1.0, 10.0),
            (2, datetime(2024, 1, 1, 0, 15), 2.0, 20.0),
            (3, datetime(2024, 1, 1, 0, 15), 4.0, 40.0),
        ],
        "entity_id bigint, timestamp timestamp_ntz, power_kwh double, inside_temp double",
    ))
    for mat in ctx.engine.materializations.values():
        mat.processing_delay = timedelta(0)
        mat.stability_delay = timedelta(0)
        mat.reprocessing_period = timedelta(days=365 * 100)
    done = ctx.materialize_stale(datetime.utcnow() + timedelta(minutes=1))
    assert ("node__v_site_node_main_15m", datetime(2024, 1, 1, 0, 15)) in done
    got = {
        r.entity_id: (r.samples, r.power_kwh, r.inside_temp)
        for r in ctx.read_part("node__v_site_node_main_15m").collect()
    }
    assert got == {100: (2, 3.0, 15.0), 200: (1, 4.0, 40.0)}


def test_aggregation_hints_select_flavor(tmp_path, capsys):
    """aggregation-generate --definitions --with-relations records the
    flavor from aggregation_hints.yaml in the generated entity
    definition; compile-all skips the hints file itself."""
    import yaml

    from minerva_etl_spark import cli
    from minerva_etl_spark.catalog.aggregation_compile import (
        compile_all_aggregations,
    )

    inst = tmp_path / "inst"
    (inst / "trend").mkdir(parents=True)
    (inst / "relation").mkdir()
    (inst / "aggregation").mkdir()
    (inst / "trend" / "hub_node_15m.yaml").write_text(
        yaml.safe_dump(RAW_YAML, sort_keys=False)
    )
    (inst / "relation" / "nv.yaml").write_text(yaml.safe_dump({
        "name": "node->v-site",
        "query": 'SELECT source_id, target_id FROM relation."node__v_site"',
        "target_entity_type": "v-site",
    }))
    (inst / "aggregation" / "aggregation_hints.yaml").write_text(
        "node->v-site: VIEW_MATERIALIZATION\n"
    )
    cli.main(["--instance", str(inst), "--data-dir", str(tmp_path / "d"),
              "aggregation-generate", "--definitions", "--with-relations"])
    capsys.readouterr()
    ent = yaml.safe_load(
        (inst / "aggregation" / "node__v_site_hub_node_15m.yaml").read_text()
    )
    assert ent["entity_aggregation"]["aggregation_type"] == "VIEW_MATERIALIZATION"
    import os

    written = compile_all_aggregations(inst)  # hints file not compiled
    assert all("aggregation_hints" not in os.path.basename(w) for w in written)
    assert any("node__v_site" in os.path.basename(w) for w in written)


def test_generate_is_idempotent_after_compile(tmp_path, capsys):
    """Re-running `aggregation-generate --definitions` after compile-all
    must not ladder the generated stores into
    aggregations-of-aggregations (reference guards via the raw title;
    we also recognize the injected samples trend)."""
    import yaml

    from minerva_etl_spark import cli

    inst = tmp_path / "inst"
    (inst / "trend").mkdir(parents=True)
    (inst / "trend" / "hub_node_15m.yaml").write_text(
        yaml.safe_dump(RAW_YAML, sort_keys=False)
    )
    argv = ["--instance", str(inst), "--data-dir", str(tmp_path / "d")]
    cli.main(argv + ["aggregation-generate", "--definitions"])
    cli.main(argv + ["aggregation-compile-all"])
    before = sorted(p.name for p in (inst / "aggregation").iterdir())
    # second generate: trend/ now holds the generated 1h/1d/1w/1month
    # stores, which must be skipped
    cli.main(argv + ["aggregation-generate", "--definitions"])
    capsys.readouterr()
    after = sorted(p.name for p in (inst / "aggregation").iterdir())
    assert after == before
    assert "hub_node_1h_1d.yaml" not in after
