"""CLI: mirror of the reference ``minerva`` command surface
(`/root/reference/src/minerva/commands/minerva_cli.py:42-60`) on the
Spark engine.

Subcommands (reference analog):
  initialize        ← `minerva initialize`
  structure         ← `minerva structure dump`
  load-data         ← `minerva load-data` (fused multi-file; --target
                      trend|attribute routes to either plugin flavor)
  load-sample-data  ← `minerva load-sample-data`
  generate-sample-data ← `minerva generate-sample-data` (definition.yaml
                      native generators, or per-store fallback)
  materialize       ← `minerva trend-store materialize`
  deduce-config     ← `minerva trend-store deduce` (config deducer)
  alter-trends      ← `minerva trend-store alter-trends`
  report            ← `minerva report` (instance-wide metrics; per-store
                      part stats with --data-source)
  aggregation-generate ← `minerva aggregation generate`
  aggregation-compile / aggregation-compile-all
                    ← `minerva aggregation compile` / `compile-all`
  attribute compact / attribute curr ← `minerva attribute-store ...`
  attribute-store create|add-attribute|remove-attribute|show|list|
          list-config|compact|materialize-curr-ptr|delete|
          materialization-list|materialization-run
                    ← `minerva attribute-store ...`
  retention         ← `minerva trend-store partition remove-old`
  live-monitor      ← `minerva live-monitor`
  data-source / entity-type create|delete|list ← directory admin
  alias create|delete|list ← `minerva alias`
  trigger create|list|enable|disable|delete|update-weight|
          set-thresholds|create-notifications|update-kpi-function|
          update-data-function ← `minerva trigger`
  relation create|materialize|remove ← `minerva relation`
  virtual-entity create|materialize ← `minerva virtual-entity`
  notification-store create|delete|list ← `minerva notification-store`
  partition create ← `minerva partition`
  trend-store create|add-parts|add-trends|remove-trends|delete|show|
          list|list-config|check-config|process-modified-log
                    ← `minerva trend-store ...`
  trend-materialization create|update|drop|list|enable|disable
                    ← `minerva trend-materialization`
  quick-start       ← `minerva quick-start`

Instance state (stores, materializations) comes from a YAML instance
directory via ``catalog.instance``; table data lives under --data-dir.
"""

from __future__ import annotations

import argparse

import sys
from datetime import datetime, timezone

from pyspark.sql import functions as F


def _spark():
    from minerva_etl_spark.session import get_spark

    return get_spark(app_name="minerva_etl_spark_cli")


def _utcnow() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def _build_store(args):
    from minerva_etl_spark.catalog.instance import MinervaInstance
    from minerva_etl_spark.store.trendstore import TrendStore, TrendStorePart

    inst = MinervaInstance.load(args.instance)
    ts_def = inst.find_trend_store(args.data_source, args.entity_type, args.granularity)
    if ts_def is None:
        sys.exit(
            f"no trend store for ({args.data_source}, {args.entity_type}, "
            f"{args.granularity}) in {args.instance}"
        )
    return TrendStore(
        data_source=ts_def.data_source,
        entity_type=ts_def.entity_type,
        granularity=ts_def.granularity,
        parts=[
            TrendStorePart(p.name, [t.name for t in p.trends])
            for p in ts_def.parts
        ],
        base_path=args.data_dir,
        partition_size=ts_def.partition_size,
        retention_period=ts_def.retention_period,
    )


def cmd_load_data(args) -> None:
    from minerva_etl_spark.sources.csv_harvest import CsvParserConfig
    from minerva_etl_spark.sources.loader import (
        AttributeLoader, JobLog, Loader,
    )

    spark = _spark()
    cfg = CsvParserConfig(
        identifier_column=args.identifier_column,
        timestamp_column=args.timestamp_column,
        entity_type=args.entity_type,
        granularity=getattr(args, "granularity", None),
        delimiter=args.delimiter,
    )
    if getattr(args, "target", "trend") == "attribute":
        # attribute-flavor harvest (reference plugin_api_attribute):
        # route into the attribute store's staging-merge path
        from minerva_etl_spark.catalog.initialize import initialize
        from minerva_etl_spark.catalog.instance import MinervaInstance

        ctx = initialize(
            spark, MinervaInstance.load(args.instance), args.data_dir
        )
        key = f"{args.data_source}_{args.entity_type}"
        if key not in ctx.attribute_stores:
            sys.exit(f"no attribute store {key!r}; have "
                     f"{sorted(ctx.attribute_stores)}")
        loader = AttributeLoader(
            store=ctx.attribute_stores[key],
            job_log=JobLog(args.data_dir),
            base_path=args.data_dir,
        )
        for path in args.files:
            job = loader.load_file(spark, args.file_type, path, cfg)
            print(f"loaded {path} as job {job} (attribute)")
        return
    if not args.granularity:
        sys.exit("--granularity is required for trend loads")
    store = _build_store(args)
    loader = Loader(store=store, job_log=JobLog(args.data_dir))
    if len(args.files) > 1:
        # fused batch load: one upsert cycle per part for the whole
        # delivery instead of one per file (O(parts), not O(files*parts))
        jobs = loader.load_files(
            spark,
            [(args.file_type, path, cfg, None, None) for path in args.files],
        )
        for path, job in zip(args.files, jobs):
            print(f"loaded {path} as job {job}")
    else:
        for path in args.files:
            job = loader.load_file(spark, args.file_type, path, cfg)
            print(f"loaded {path} as job {job}")


def cmd_report(args) -> None:
    """A6 report aggregates.  With --data-source: per-part stats of one
    store.  Without: the reference's instance-wide metrics report
    (`commands/report.py:84-180` — entity counts, every trend store
    part's record/trend counts, attribute store sizes)."""
    spark = _spark()
    if args.data_source:
        store = _build_store(args)
        for part in store.parts:
            df = store.read_part(spark, part.name)
            if df is None:
                print(f"{part.name}: (empty)")
                continue
            row = df.agg(
                F.count(F.lit(1)).alias("rows"),
                F.countDistinct("entity_id").alias("entities"),
                F.min("timestamp").alias("min_ts"),
                F.max("timestamp").alias("max_ts"),
            ).collect()[0]
            print(
                f"{part.name}: rows={row['rows']} entities={row['entities']} "
                f"range=[{row['min_ts']} .. {row['max_ts']}]"
            )
        return

    import glob
    import os

    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    ctx = initialize(spark, MinervaInstance.load(args.instance), args.data_dir)

    print("## Entity Metrics")
    dims = sorted(glob.glob(os.path.join(args.data_dir, "entity", "*")))
    print(f"Number of entity types: {len(dims)}")
    total = 0
    for d in dims:
        n = spark.read.parquet(d).count()
        total += n
        print(f"  {os.path.basename(d)}: {n}")
    print(f"Total number of entities: {total}")

    print("\n## Trend Store Metrics")
    print(f"{'Data Source':<12} {'Entity Type':<12} {'Part Name':<20} "
          f"{'Records':>8} {'Trends':>6}")
    for store in ctx.trend_stores.values():
        for part in store.parts:
            df = store.read_part(spark, part.name)
            n = 0 if df is None else df.count()
            print(f"{store.data_source:<12} {store.entity_type:<12} "
                  f"{part.name:<20} {n:>8} {len(part.trend_columns):>6}")

    print("\n## Attribute Store Metrics")
    for key, astore in sorted(ctx.attribute_stores.items()):
        hist = astore.read_history(spark)
        n = 0 if hist is None else hist.count()
        print(f"{key}: history rows={n} attributes={len(astore.attributes)}")


def cmd_retention(args) -> None:
    spark = _spark()
    store = _build_store(args)
    now = _utcnow()
    for part in store.parts:
        expired = store.expired_partitions(spark, part.name, now)
        print(f"{part.name}: {len(expired)} expired partitions {expired}")


def _is_generated_store(store) -> bool:
    """Aggregation outputs are recognizable by the injected ``samples``
    trend in every part — re-laddering them would generate
    aggregations-of-aggregations on a second `generate` run (the
    reference avoids this by only processing stores titled "raw",
    `aggregation_generation.py:63-67`; the samples marker keeps
    untitled raw stores working too)."""
    return bool(store.parts) and all(
        any(t.name == "samples" for t in p.trends) for p in store.parts
    )


def _relations_for(inst, entity_type: str, hints: dict) -> list[tuple]:
    """Relations applicable to a store: the reference entity-aggregates
    only relations whose source entity type matches the store's
    (`aggregation_generation.py:92-97`); undeclared source types apply
    to every store (repo YAML predates the field).  Returns
    ``(name, target_entity_type, aggregation_type_hint)`` tuples."""
    return [
        (
            r.name,
            r.target_entity_type or r.name.split("->")[-1],
            hints.get(r.name, "VIEW"),
        )
        for r in inst.relations
        if r.source_entity_type in (None, entity_type)
    ]


def cmd_aggregation_generate(args) -> None:
    """`minerva aggregation generate`: emit the standard ladder YAML for
    every raw trend store of the instance."""
    import yaml
    from pathlib import Path

    from minerva_etl_spark.catalog.aggregation_compile import (
        generate_entity_aggregation,
        load_aggregation_hints,
        write_generated,
        write_generated_definitions,
        write_generated_entity_definitions,
    )
    from minerva_etl_spark.catalog.instance import MinervaInstance, TrendStoreDef

    inst = MinervaInstance.load(args.instance)
    hints = load_aggregation_hints(args.instance)
    if getattr(args, "definitions", False):
        # two-step reference workflow: emit aggregation/*.yaml definition
        # files; `aggregation-compile`/`-all` expands them
        for p in sorted((Path(args.instance) / "trend").glob("*.yaml")):
            store = TrendStoreDef.from_dict(
                yaml.safe_load(p.read_text())
            )
            if args.raw_only and "raw" not in (store.title or "").lower():
                continue
            if _is_generated_store(store):
                # visible so a false positive (raw store that really
                # declares `samples` in every part) is noticeable
                print(f"skipped {p.stem} (looks generated)")
                continue
            rels = (
                _relations_for(inst, store.entity_type, hints)
                if args.with_relations
                else None
            )
            for path in write_generated_definitions(
                args.instance, store, p.stem, relations=rels
            ):
                print(f"generated {path}")
            for rel_name, target_type, agg_type in rels or []:
                # raw-rung entity aggregation (the per-rung ones ride
                # write_generated_definitions above)
                for path in write_generated_entity_definitions(
                    args.instance, store, p.stem, rel_name, target_type,
                    aggregation_type=agg_type,
                ):
                    print(f"generated {path}")
        return
    for store in inst.trend_stores:
        if args.raw_only and "raw" not in (store.title or "").lower():
            continue
        if _is_generated_store(store):
            print(
                f"skipped {store.data_source}_{store.entity_type}_"
                f"{store.granularity} (looks generated)"
            )
            continue
        written = list(write_generated(args.instance, store))
        for path in written:
            print(f"generated {path}")
        if args.with_relations:
            root = Path(args.instance)
            rels = _relations_for(inst, store.entity_type, hints)
            # entity-aggregate the raw store AND every generated rung
            # (reference generate_aggregations entity-aggregates each
            # time-aggregated target too, aggregation_generation.py:
            # 104-122)
            src_stores = [store] + [
                TrendStoreDef.from_dict(
                    yaml.safe_load(Path(p).read_text())
                )
                for p in written
                if Path(p).parent.name == "trend"
            ]
            for src in src_stores:
                for rel_name, target_type, _agg_type in rels:
                    pairs = generate_entity_aggregation(
                        src, rel_name, target_type
                    )
                    for store_yaml, mat_yaml in pairs:
                        part = mat_yaml["target_trend_store_part"]
                        sp = root / "trend" / f"{part}_store.yaml"
                        mp = root / "materialization" / f"{part}.yaml"
                        sp.write_text(
                            yaml.safe_dump(store_yaml, sort_keys=False)
                        )
                        mp.write_text(
                            yaml.safe_dump(mat_yaml, sort_keys=False)
                        )
                        print(f"generated {sp}")
                        print(f"generated {mp}")


def cmd_aggregation_compile(args) -> None:
    """`minerva aggregation compile`: expand aggregation definition
    file(s) into trend-store + materialization YAML (reference
    `src/minerva/commands/aggregation.py:49-65`)."""
    import json

    import yaml

    from minerva_etl_spark.catalog.aggregation_compile import (
        compile_aggregation_definition,
    )

    for path in args.definition:
        with open(path) as f:
            d = json.load(f) if args.format == "json" else yaml.safe_load(f)
        for p in compile_aggregation_definition(args.instance, d):
            print(f"compiled {p}")


def cmd_aggregation_compile_all(args) -> None:
    """`minerva aggregation compile-all`: compile every
    ``aggregation/*.yaml`` of the instance (reference
    `src/minerva/commands/aggregation.py:84-117`)."""
    from minerva_etl_spark.catalog.aggregation_compile import (
        compile_all_aggregations,
    )

    for p in compile_all_aggregations(args.instance):
        print(f"compiled {p}")


def cmd_materialize(args) -> None:
    """`minerva trend-store materialize`: run all stale chunks."""
    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    spark = _spark()
    ctx = initialize(spark, MinervaInstance.load(args.instance), args.data_dir)
    now = datetime.fromisoformat(args.now) if args.now else _utcnow()
    done = ctx.materialize_stale(now, max_num=args.max_num)
    for name, ts in done:
        print(f"materialized {name} @ {ts}")
    print(f"{len(done)} chunk(s)")


def cmd_live_monitor(args) -> None:
    """`minerva live-monitor`: poll the modified log and run stale
    materializations (reference cadence: 2 s, batch of 50)."""
    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance
    from minerva_etl_spark.streaming.live_monitor import run_loop

    spark = _spark()
    ctx = initialize(spark, MinervaInstance.load(args.instance), args.data_dir)

    def sink(name, df, timestamps):
        target = ctx.parts_index.get(name)
        if target is not None:
            # compiled roll-ups emit exactly the scheduled bucket
            # timestamps: skip the timestamp pre-pass job (r17)
            target.store(spark, df, job_id=0, known_timestamps=timestamps)

    total = run_loop(
        ctx.engine,
        read_log=ctx.modified_log,
        sink=sink,
        poll_seconds=args.poll_seconds,
        max_cycles=args.cycles,
        max_num=args.batch,
    )
    print(f"{total} chunk(s) materialized over "
          f"{args.cycles or 'unbounded'} cycle(s)")


def cmd_attribute(args) -> None:
    from minerva_etl_spark.store.attribute_store import AttributeStore

    spark = _spark()
    st = AttributeStore(
        args.data_source, args.entity_type, [], args.data_dir
    )
    if args.action == "compact":
        st.compact(spark)
        print("compacted")
    elif args.action == "curr":
        curr = st.materialize_curr(spark)
        print(f"curr rows: {0 if curr is None else curr.count()}")


def cmd_attribute_store(args) -> None:
    """`minerva attribute-store ...` admin over the initialized
    instance: compact / materialize-curr-ptr (one store or --all) and
    store deletion (`commands/attribute_store.py:523-579`)."""
    if args.action in (
        "create", "add-attribute", "remove-attribute", "show",
        "list", "list-config",
    ):
        # catalog-only actions: edit/inspect the instance YAML, no Spark
        # (reference `commands/attribute_store.py:47-253` — the live
        # catalog here IS the instance directory)
        import yaml
        from pathlib import Path

        adir = Path(args.instance) / "attribute"
        if args.action == "create":
            with open(args.store) as f:  # store arg = definition file
                d = yaml.safe_load(f)
            adir.mkdir(parents=True, exist_ok=True)
            name = f"{d['data_source']}_{d['entity_type']}"
            target = adir / f"{name}.yaml"
            if target.exists():
                sys.exit(f"attribute store {name} already exists")
            target.write_text(yaml.safe_dump(d, sort_keys=False))
            print(f"created attribute store {name} ({target})")
            return
        if args.action in ("list", "list-config"):
            for p in sorted(adir.glob("*.yaml")):
                d = yaml.safe_load(p.read_text())
                attrs = ", ".join(a["name"] for a in d.get("attributes", []))
                print(f"{d['data_source']}_{d['entity_type']}\t[{attrs}]")
            return
        # remaining actions address one store by data_source_entity_type
        target = None
        for p in sorted(adir.glob("*.yaml")):
            d = yaml.safe_load(p.read_text())
            if f"{d['data_source']}_{d['entity_type']}" == args.store:
                target = (p, d)
        if target is None:
            sys.exit(f"no attribute store {args.store!r}")
        p, d = target
        if args.action == "show":
            print(f"data_source: {d['data_source']}")
            print(f"entity_type: {d['entity_type']}")
            print("attributes:")
            for a in d.get("attributes", []):
                print(f"  {a['name']}: {a.get('data_type', 'text')}")
        elif args.action == "add-attribute":
            if any(a["name"] == args.attribute_name
                   for a in d.get("attributes", [])):
                sys.exit(f"attribute {args.attribute_name!r} already exists")
            attr = {"name": args.attribute_name}
            if args.data_type:
                attr["data_type"] = args.data_type
            d.setdefault("attributes", []).append(attr)
            p.write_text(yaml.safe_dump(d, sort_keys=False))
            print(f"added attribute {args.attribute_name} to {args.store}")
        elif args.action == "remove-attribute":
            before = len(d.get("attributes", []))
            d["attributes"] = [
                a for a in d.get("attributes", [])
                if a["name"] != args.attribute_name
            ]
            if len(d["attributes"]) == before:
                sys.exit(f"no attribute {args.attribute_name!r}")
            p.write_text(yaml.safe_dump(d, sort_keys=False))
            print(f"removed attribute {args.attribute_name} from {args.store}")
        return

    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    spark = _spark()
    ctx = initialize(spark, MinervaInstance.load(args.instance), args.data_dir)
    if args.action in ("materialization-list", "materialization-run"):
        # `minerva attribute-store materialization list/run`
        # (`commands/attribute_store.py:407-520`): sampled-view
        # materializations over the initialized instance
        defs = ctx._attribute_materialization_defs
        if args.store:
            defs = [
                d for d in defs
                if "{data_source}_{entity_type}".format(
                    **d["attribute_store"]
                ) == args.store
            ]
        if args.action == "materialization-list":
            for d in defs:
                spec = d["attribute_store"]
                print(f"{spec['data_source']}_{spec['entity_type']}: "
                      f"{' '.join(d['query'].split())}")
        else:
            for key in ctx.materialize_attributes(
                defs, materialize_curr=args.materialize_curr
            ):
                st = ctx.attribute_stores[key]
                hist = st.read_history(spark)
                print(f"{key}: {0 if hist is None else hist.count()}")
        return
    if args.all:
        targets = list(ctx.attribute_stores.values())
    else:
        key = args.store
        if key not in ctx.attribute_stores:
            sys.exit(f"no attribute store {key!r}; have "
                     f"{sorted(ctx.attribute_stores)}")
        targets = [ctx.attribute_stores[key]]
    for st in targets:
        label = f"{st.data_source}_{st.entity_type}"
        if args.action == "compact":
            st.compact(spark)
            print(f"{label}: compacted")
        elif args.action == "materialize-curr-ptr":
            curr = st.materialize_curr(spark)
            print(f"{label}: curr rows = {0 if curr is None else curr.count()}")
        elif args.action == "delete":
            st.delete()
            print(f"{label}: deleted")


def cmd_initialize(args) -> None:
    """`minerva initialize`: compile the YAML instance into engine
    objects, materialize relations and virtual entities."""
    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    spark = _spark()
    ctx = initialize(spark, MinervaInstance.load(args.instance), args.data_dir)
    print(f"trend stores:        {len(ctx.trend_stores)}")
    print(f"attribute stores:    {len(ctx.attribute_stores)}")
    print(f"notification stores: {len(ctx.notification_stores)}")
    print(f"materializations:    {len(ctx.engine.materializations)}")
    print(f"triggers:            {len(ctx.triggers)}")


def cmd_structure(args) -> None:
    """`minerva structure dump`: the instance's declared structure."""
    from minerva_etl_spark.catalog.granularity import Granularity
    from minerva_etl_spark.catalog.instance import MinervaInstance

    inst = MinervaInstance.load(args.instance)
    for s in inst.trend_stores:
        gran = Granularity.parse(s.granularity).name
        print(f"trend store {s.data_source}/{s.entity_type}/{gran}")
        for part in s.parts:
            print(f"  part {part.name}")
            for t in part.trends:
                print(
                    f"    {t.name}: {t.data_type} "
                    f"[{t.time_aggregation}/{t.entity_aggregation}]"
                )
    for a in inst.attribute_stores:
        print(
            f"attribute store {a.get('data_source', '?')}/"
            f"{a.get('entity_type', '?')}"
        )
    for n in inst.notification_stores:
        print(f"notification store {n.get('data_source', n.get('name', '?'))}")
    for m in inst.materializations:
        print(f"materialization -> {m.target_trend_store_part}")
    for t in inst.triggers:
        print(f"trigger {t['name']}")


def cmd_deduce_config(args) -> None:
    """`minerva trend-store deduce`: emit a trend-store YAML skeleton
    from a sample harvest file."""
    import yaml

    from minerva_etl_spark.sources.config_deducer import deduce_config
    from minerva_etl_spark.sources.csv_harvest import CsvParserConfig

    spark = _spark()
    cfg = CsvParserConfig(
        identifier_column=args.identifier_column,
        timestamp_column=args.timestamp_column,
        delimiter=args.delimiter,
        granularity=args.granularity,
    )
    deduced = deduce_config(
        spark, args.file, cfg,
        data_source=args.data_source, entity_type=args.entity_type,
        granularity=args.granularity, part_name=args.part_name,
    )
    text = yaml.safe_dump(deduced, sort_keys=False)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out}")
    else:
        print(text, end="")


def cmd_alter_trends(args) -> None:
    """`minerva trend-store alter-trends`: declare new trend columns."""
    store = _build_store(args)
    added = store.alter_trends(args.part, args.columns)
    print(f"added {added} to {args.part}")


def cmd_load_sample_data(args) -> None:
    """`minerva load-sample-data`: generate a deterministic sample CSV
    and load it through the normal harvest path."""
    from minerva_etl_spark.sources.csv_harvest import CsvParserConfig
    from minerva_etl_spark.sources.loader import JobLog, Loader
    from minerva_etl_spark.sources.sample_data import (
        generate_trend_sample,
        write_sample_csv,
    )

    spark = _spark()
    store = _build_store(args)
    metrics = {
        c: (0.0, 100.0) for p in store.parts for c in p.trend_columns
    }
    sample = generate_trend_sample(
        spark, args.entity_type, args.entities, args.granularity,
        datetime.fromisoformat(args.start), args.periods, metrics,
    )
    sample = sample.withColumn(
        "timestamp", F.col("timestamp").cast("string")
    )
    path = f"{args.data_dir}/sample_csv"
    write_sample_csv(sample, path)
    cfg = CsvParserConfig(
        identifier_column="entity_ref", timestamp_column="timestamp",
        entity_type=args.entity_type, granularity=args.granularity,
    )
    loader = Loader(store=store, job_log=JobLog(args.data_dir))
    job = loader.load_file(spark, "csv", path, cfg)
    print(f"loaded sample as job {job}")


def cmd_generate_sample_data(args) -> None:
    """`minerva generate-sample-data`
    (`/root/reference/src/minerva/commands/generate_sample_data.py:
    61-110`): run the instance's ``sample-data/definition.yaml``
    generators, writing files to a target directory WITHOUT loading.
    'native' definitions name a python module next to the definition
    whose ``generate(target_dir, timestamp, granularity)`` yields file
    paths.  Without a definition file, falls back to one deterministic
    CSV per declared trend store."""
    import os
    import sys as _sys
    from pathlib import Path

    import yaml

    from minerva_etl_spark.catalog.granularity import Granularity

    target = Path(args.target_directory or (args.data_dir + "/sample-data"))
    target.mkdir(parents=True, exist_ok=True)
    definition = Path(args.instance) / "sample-data" / "definition.yaml"
    if definition.is_file():
        _sys.path.append(str(definition.parent))
        ts = (
            datetime.fromisoformat(args.timestamp)
            if args.timestamp
            else _utcnow()
        )
        for entry in yaml.safe_load(definition.read_text()) or []:
            kind, config = next(iter(entry.items()))
            if args.dataset and config.get("name") != args.dataset:
                continue
            if kind != "native":
                print(f"skipping {config.get('name')} (unsupported "
                      f"definition type {kind!r})")
                continue
            import importlib

            module = importlib.import_module(config["name"])
            gran = config.get("granularity")
            label = (
                Granularity.parse(gran).truncate(ts) if gran else ts
            )
            for path in module.generate(
                target, label, gran
            ):
                print(f"Generated file '{path}'")
        return
    # fallback: deterministic per-store samples from the declared catalog
    from minerva_etl_spark.catalog.instance import MinervaInstance
    from minerva_etl_spark.sources.sample_data import (
        generate_trend_sample, write_sample_csv,
    )

    spark = _spark()
    inst = MinervaInstance.load(args.instance)
    ts = (
        datetime.fromisoformat(args.timestamp) if args.timestamp else _utcnow()
    )
    for ts_def in inst.trend_stores:
        metrics = {
            t.name: (0.0, 100.0)
            for p in ts_def.parts
            for t in p.trends
            if t.name != "samples"
        }
        if not metrics:
            continue
        gran = Granularity.parse(ts_def.granularity)
        sample = generate_trend_sample(
            spark, ts_def.entity_type, 5, ts_def.granularity,
            gran.truncate(ts), 4, metrics,
        ).withColumn("timestamp", F.col("timestamp").cast("string"))
        path = str(
            target
            / f"{ts_def.data_source}_{ts_def.entity_type}_{gran.name}.csv"
        )
        write_sample_csv(sample, path)
        print(f"Generated file '{path}'")


def cmd_directory(args) -> None:
    """data-source / entity-type create|delete|list."""
    from minerva_etl_spark.catalog.admin import DirectoryCatalog

    cat = DirectoryCatalog(args.data_dir)
    kind = args.kind
    if args.action == "create":
        cat.create(kind, args.name)
        print(f"created {kind} {args.name}")
    elif args.action == "delete":
        cat.delete(kind, args.name)
        print(f"deleted {kind} {args.name}")
    else:
        for name in cat.list(kind):
            print(name)


def cmd_alias(args) -> None:
    from minerva_etl_spark.catalog.admin import DirectoryCatalog

    cat = DirectoryCatalog(args.data_dir)
    spark = _spark()
    if args.action == "create":
        pairs = (
            spark.read.option("header", True).csv(args.file)
            .select("alias", "name")
        )
        cat.create_aliases(spark, args.entity_type, pairs, args.alias_type)
        print("aliases loaded")
    elif args.action == "delete":
        cat.delete_aliases(spark, args.alias_type)
        print(f"deleted aliases of type {args.alias_type}")
    else:
        df = cat.read_aliases(spark)
        for r in (df.collect() if df is not None else []):
            print(f"{r.alias}\t{r.entity_id}\t{r.type}")


def _trigger_set(args):
    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance
    from minerva_etl_spark.trigger.lifecycle import TriggerSet

    spark = _spark()
    ctx = initialize(spark, MinervaInstance.load(args.instance), args.data_dir)
    # rooted at the INSTANCE dir: admin edits the same YAML files
    # `initialize` loads — the instance directory IS the catalog
    return spark, ctx, TriggerSet(args.instance, ctx.trigger_factory)


def cmd_trigger(args) -> None:
    """`minerva trigger ...` lifecycle admin."""
    import yaml

    spark, ctx, tset = _trigger_set(args)
    if args.action == "create":
        with open(args.file) as f:
            tset.create(yaml.safe_load(f))
        print(f"created trigger from {args.file}")
    elif args.action == "list":
        for row in tset.list():
            flags = "enabled" if row["enabled"] else "disabled"
            print(
                f"{row['name']}\tweight={row['weight']}\t{flags}\t"
                f"thresholds={row['thresholds']}\ttags={row['tags']}"
            )
    elif args.action in ("enable", "disable"):
        tset.set_enabled(args.name, args.action == "enable")
        print(f"{args.action}d {args.name}")
    elif args.action == "delete":
        tset.delete(args.name)
        print(f"deleted {args.name}")
    elif args.action == "update-weight":
        tset.update_weight(args.name, int(args.value))
        print(f"weight({args.name}) = {args.value}")
    elif args.action == "set-thresholds":
        thresholds = dict(kv.split("=") for kv in args.value.split(","))
        tset.set_thresholds(
            args.name, {k: float(v) for k, v in thresholds.items()}
        )
        print(f"thresholds({args.name}) = {thresholds}")
    elif args.action in ("update-kpi-function", "update-data-function"):
        # reference shape: the yaml definition is the source of truth;
        # the named function is re-created from it
        # (`commands/trigger.py:166-200`)
        with open(args.file) as f:
            cfg = yaml.safe_load(f)
        name = cfg["name"]
        if args.action == "update-kpi-function":
            tset.update_kpi_function(name, cfg.get("kpi_query", ""))
            print(f"updated kpi function of {name}")
        else:
            tset.update_data_function(name, cfg.get("data", ""))
            print(f"updated data function of {name}")
    elif args.action == "create-notifications":
        sink = ctx.notification_stores.get(args.notification_store)
        if sink is None:
            from minerva_etl_spark.store.notification import NotificationStore

            sink = NotificationStore(
                args.notification_store or "trigger",
                ["rule", "weight", "details", "data"],
                args.data_dir,
            )
        timestamps = (
            [datetime.fromisoformat(args.timestamp)] if args.timestamp else []
        )
        n = tset.execute(spark, args.name, sink, timestamps)
        print(f"Notifications generated: {n}")


def _instance_yaml_write(instance_dir: str, sub: str, name: str, d: dict) -> str:
    """Write one YAML definition into the instance directory (the
    instance dir IS the catalog — `minerva initialize` compiles it)."""
    import yaml
    from pathlib import Path

    dest = Path(instance_dir) / sub
    dest.mkdir(parents=True, exist_ok=True)
    path = dest / f"{name}.yaml"
    path.write_text(yaml.safe_dump(d, sort_keys=False))
    return str(path)


def cmd_relation(args) -> None:
    """`minerva relation create|materialize|remove`
    (`/root/reference/src/minerva/commands/relation.py:63-141`):
    relations are YAML-defined edge tables; materialize rebuilds each
    from its defining query (TRUNCATE+INSERT ≡ overwrite)."""
    import shutil
    import yaml
    from pathlib import Path

    if args.action == "create":
        with open(args.file) as f:
            d = yaml.safe_load(f)
        path = _instance_yaml_write(args.instance, "relation", d["name"], d)
        print(f"created relation {d['name']} ({path})")
    elif args.action == "materialize":
        from minerva_etl_spark.catalog.initialize import initialize
        from minerva_etl_spark.catalog.instance import MinervaInstance

        spark = _spark()
        ctx = initialize(
            spark, MinervaInstance.load(args.instance), args.data_dir
        )
        defs = ctx._relation_defs
        if args.names:
            defs = [r for r in defs if r.name in set(args.names)]
        for name in ctx.materialize_relations(defs):
            print(f"materialized relation {name}")
    elif args.action == "remove":
        p = Path(args.instance) / "relation" / f"{args.name}.yaml"
        if p.exists():
            p.unlink()
        from minerva_etl_spark.store.relation import RelationStore

        shutil.rmtree(
            RelationStore(args.data_dir).path(args.name), ignore_errors=True
        )
        print(f"removed relation {args.name}")


def cmd_virtual_entity(args) -> None:
    """`minerva virtual-entity create|materialize`
    (`/root/reference/src/minerva/commands/virtual_entity.py:9-57`):
    each definition is a name-producing query; new names anti-insert
    into the entity dimension."""
    import yaml

    if args.action == "create":
        with open(args.file) as f:
            d = yaml.safe_load(f)
        path = _instance_yaml_write(
            args.instance, "virtual-entity", d["name"], d
        )
        print(f"created virtual entity {d['name']} ({path})")
    else:  # materialize
        from minerva_etl_spark.catalog.initialize import initialize
        from minerva_etl_spark.catalog.instance import MinervaInstance

        spark = _spark()
        ctx = initialize(
            spark, MinervaInstance.load(args.instance), args.data_dir
        )
        defs = ctx._virtual_entity_defs
        if args.names:
            defs = [d for d in defs if d["name"] in set(args.names)]
        for name in ctx.materialize_virtual_entities(defs):
            print(f"materialized virtual entity {name}")


def cmd_notification_store(args) -> None:
    """`minerva notification-store create|delete|list`
    (`/root/reference/src/minerva/commands/notification_store.py:21-100`)."""
    import shutil
    import yaml
    from pathlib import Path

    if args.action == "create":
        with open(args.file) as f:
            d = yaml.safe_load(f)
        name = d.get("data_source") or d["name"]
        path = _instance_yaml_write(args.instance, "notification", name, d)
        print(f"created notification store {name} ({path})")
    elif args.action == "delete":
        p = Path(args.instance) / "notification" / f"{args.name}.yaml"
        if p.exists():
            p.unlink()
        from minerva_etl_spark.store.notification import NotificationStore

        shutil.rmtree(
            NotificationStore(args.name, [], args.data_dir).path,
            ignore_errors=True,
        )
        print(f"deleted notification store {args.name}")
    else:  # list
        from pathlib import Path

        for p in sorted(
            (Path(args.instance) / "notification").glob("*.yaml")
        ):
            print(p.stem)


def cmd_partition(args) -> None:
    """`minerva partition create|create-for-timestamp|remove-old`
    (`/root/reference/src/minerva/commands/partition.py:50-151`):
    pre-create partition directories for every trend store covering
    (now - retention - partition_size, now + partition_size + ahead],
    or just the partitions covering one timestamp, or drop the
    partitions past retention.  On the parquet substrate partition
    pre-creation is mkdir-only (metadata), exactly as cheap as the
    reference's CREATE TABLE partitions — writes land in them via
    dynamic partition overwrite; removal is a directory drop (T8)."""
    import os
    from datetime import timedelta

    from minerva_etl_spark.catalog.granularity import Granularity
    from minerva_etl_spark.catalog.instance import MinervaInstance
    from minerva_etl_spark.store.trendstore import (
        PARTITION_COL,
        TrendStore,
        TrendStorePart,
    )

    if args.timestamp and args.action != "create-for-timestamp":
        sys.exit(
            f"the timestamp argument only applies to create-for-timestamp "
            f"(got action {args.action!r})"
        )
    inst = MinervaInstance.load(args.instance)
    now = datetime.fromisoformat(args.now) if args.now else _utcnow()
    ahead = Granularity.parse(args.ahead_interval)
    total = 0
    for ts_def in inst.trend_stores:
        store = TrendStore(
            data_source=ts_def.data_source,
            entity_type=ts_def.entity_type,
            granularity=ts_def.granularity,
            parts=[
                TrendStorePart(p.name, [t.name for t in p.trends])
                for p in ts_def.parts
            ],
            base_path=args.data_dir,
            partition_size=ts_def.partition_size,
            retention_period=ts_def.retention_period,
        )
        if args.action == "remove-old":
            spark = _spark()
            for part in store.parts:
                dropped = store.drop_expired(spark, part.name, now)
                if dropped:
                    print(f"{part.name}: removed partitions {dropped}")
                    total += len(dropped)
            continue
        if args.action == "create-for-timestamp":
            if not args.timestamp:
                sys.exit("create-for-timestamp needs a timestamp argument")
            ts = datetime.fromisoformat(args.timestamp)
            idx = _partition_index(store, ts)
            for part in store.parts:
                d = os.path.join(
                    store.part_path(part.name), f"{PARTITION_COL}={idx}"
                )
                if not os.path.exists(d):
                    os.makedirs(d, exist_ok=True)
                    total += 1
            continue
        psize = store.partition_size
        start = now
        if store.retention_period is not None:
            r = store.retention_period
            start = (
                r.decr(start) if r.months
                else start - timedelta(seconds=r.seconds)
            )
        start = psize.decr(start)
        end = psize.inc(
            ahead.inc(now) if ahead.months
            else now + timedelta(seconds=ahead.seconds)
        )
        indexes: set[int] = set()
        cur = start
        while cur <= end:
            indexes.add(_partition_index(store, cur))
            cur = psize.inc(cur)
        for part in store.parts:
            base = store.part_path(part.name)
            for idx in sorted(indexes):
                d = os.path.join(base, f"{PARTITION_COL}={idx}")
                if not os.path.exists(d):
                    os.makedirs(d, exist_ok=True)
                    total += 1
    verb = "removed" if args.action == "remove-old" else "created"
    print(f"{verb} {total} partition(s)")


def _partition_index(store, ts: datetime) -> int:
    psize = store.partition_size
    if psize.months:
        return (ts.year * 12 + ts.month - 1) // psize.months
    epoch = int((ts - datetime(1970, 1, 1)).total_seconds())
    return epoch // psize.seconds


def cmd_trend_store(args) -> None:
    """`minerva trend-store create|add-parts|add-trends|remove-trends|
    change|delete|show|list|list-config|process-modified-log`
    (`/root/reference/src/minerva/commands/trend_store.py`).  The
    instance YAML directory is the catalog; definition-file actions sync
    it the way the reference syncs ``trend_directory``."""
    from minerva_etl_spark.catalog import trendstore_admin as tsa

    if args.action == "create":
        try:
            path = tsa.create_trend_store(args.instance, args.definition)
        except FileExistsError as exc:
            sys.exit(f"Could not create trend store: {exc}")
        print(f"Creating trend store ... OK ({path})")
    elif args.action == "add-parts":
        added = tsa.add_parts(args.instance, args.definition)
        print(
            f"Added parts: {', '.join(added)}" if added
            else "No parts to be added"
        )
    elif args.action == "add-trends":
        added = tsa.add_trends(args.instance, args.definition)
        print(
            f"Added trends: {', '.join(added)}" if added
            else "No trends to be added"
        )
    elif args.action == "remove-trends":
        removed = tsa.remove_trends(args.instance, args.definition)
        print(
            f"Removed trends: {', '.join(removed)}" if removed
            else "No trends to be removed."
        )
    elif args.action == "change":
        results = tsa.change_trend_store(
            args.instance, args.definition, force=args.force
        )
        any_change = False
        for part, (added, removed, changed) in results:
            if added or removed or changed:
                any_change = True
                print(f"{part}: added {added}")
                print(f"{part}: removed {removed}")
                print(f"{part}: changed {changed}")
        if not any_change:
            print("no changes were made")
    elif args.action == "delete":
        from minerva_etl_spark.catalog.granularity import Granularity

        key = (args.data_source, args.entity_type,
               Granularity.parse(args.granularity).name)
        try:
            path = tsa.delete_trend_store(args.instance, key)
        except FileNotFoundError as exc:
            sys.exit(str(exc))
        print(f"deleted trend store ({path})")
    elif args.action == "show":
        from minerva_etl_spark.catalog.granularity import Granularity

        key = (args.data_source, args.entity_type,
               Granularity.parse(args.granularity).name)
        try:
            print(tsa.show_trend_store(args.instance, key))
        except FileNotFoundError as exc:
            sys.exit(str(exc))
    elif args.action in ("list", "list-config"):
        for fname, ds, et, gran in tsa.list_trend_stores(args.instance):
            print(f"{fname}\t{ds}\t{et}\t{gran}")
    elif args.action == "check-config":
        report = tsa.check_config(args.instance, args.definition)
        bad = 0
        for fname, errors in report.items():
            for err in errors:
                print(err)
            print(f"{fname} - Ok" if not errors else
                  f"{fname} - {len(errors)} errors")
            bad += bool(errors)
        if args.definition is None:
            print("All trend stores Ok" if bad == 0 else
                  f"{bad} trend stores with errors")
        if bad:
            sys.exit(1)
    elif args.action == "process-modified-log":
        spark = _spark()
        store = _build_store(args)
        n = store.process_modified_log(spark)
        print(f"Processed modified log into {n} state rows")


def cmd_trend_materialization(args) -> None:
    """`minerva trend-materialization create|update|drop|list|enable|
    disable`
    (`/root/reference/src/minerva/commands/trend_materialization.py`)."""
    import yaml
    from pathlib import Path

    mat_dir = Path(args.instance) / "materialization"
    if args.action in ("create", "update"):
        with open(args.file) as f:
            d = yaml.safe_load(f)
        name = d["target_trend_store_part"]
        path = _instance_yaml_write(args.instance, "materialization", name, d)
        print(f"{args.action}d materialization {name} ({path})")
    elif args.action == "drop":
        p = mat_dir / f"{args.name}.yaml"
        if p.exists():
            p.unlink()
            print(f"dropped materialization {args.name}")
        else:
            sys.exit(f"no materialization {args.name!r}")
    elif args.action in ("enable", "disable"):
        p = mat_dir / f"{args.name}.yaml"
        if not p.exists():
            sys.exit(f"no materialization {args.name!r}")
        d = yaml.safe_load(p.read_text())
        d["enabled"] = args.action == "enable"
        p.write_text(yaml.safe_dump(d, sort_keys=False))
        print(f"{args.action}d materialization {args.name}")
    else:  # list
        for p in sorted(mat_dir.glob("*.yaml")):
            d = yaml.safe_load(p.read_text())
            flag = "enabled" if d.get("enabled", True) else "disabled"
            print(f"{p.stem}\t{flag}")


_QUICKSTART_TREND = """\
data_source: {name}
entity_type: node
granularity: 15m
partition_size: 1d
parts:
  - name: node_main_15m
    trends:
      - name: power_kwh
        data_type: double precision
        time_aggregation: sum
        entity_aggregation: sum
      - name: temp
        data_type: double precision
        time_aggregation: avg
        entity_aggregation: avg
"""

_QUICKSTART_TREND_1H = """\
data_source: {name}
entity_type: node
granularity: 1h
partition_size: 4d
parts:
  - name: node_main_1h
    trends:
      - name: samples
        data_type: bigint
        time_aggregation: sum
        entity_aggregation: sum
      - name: power_kwh
        data_type: double precision
        time_aggregation: sum
        entity_aggregation: sum
      - name: temp
        data_type: double precision
        time_aggregation: avg
        entity_aggregation: avg
"""

_QUICKSTART_MAT = """\
target_trend_store_part: node_main_1h
enabled: true
processing_delay: 30m
stability_delay: 5m
reprocessing_period: 3d
sources:
  - trend_store_part: node_main_15m
    mapping_function: trend.mapping_15m->1h
view: |
  SELECT entity_id, timestamp, count(*) AS samples,
         sum(power_kwh) AS power_kwh, avg(temp) AS temp
  FROM trend."node_main_15m"
  GROUP BY entity_id, timestamp
"""


def cmd_quick_start(args) -> None:
    """`minerva quick-start`
    (`/root/reference/src/minerva/commands/quick_start.py:14-57`):
    lay down an instance skeleton a user can edit and `initialize`."""
    import os

    root = os.path.abspath(args.instance_root or args.instance)
    for sub in (
        "trend", "attribute", "notification", "relation",
        "materialization", "trigger", "virtual-entity",
    ):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    trend_path = os.path.join(root, "trend", f"{args.instance_name}.yaml")
    if not os.path.exists(trend_path):
        with open(trend_path, "w") as f:
            f.write(_QUICKSTART_TREND.format(name=args.instance_name))
    trend_1h = os.path.join(root, "trend", f"{args.instance_name}_1h.yaml")
    if not os.path.exists(trend_1h):
        with open(trend_1h, "w") as f:
            f.write(_QUICKSTART_TREND_1H.format(name=args.instance_name))
    mat_path = os.path.join(root, "materialization", "node_main_1h.yaml")
    if not os.path.exists(mat_path):
        with open(mat_path, "w") as f:
            f.write(_QUICKSTART_MAT)
    print(f"created Minerva instance skeleton in {root}")


def cmd_corpus(args) -> None:
    """`minerva-spark corpus <action>`: the standalone curation
    operators as CLI verbs over parquet in/out — `split` (leakage-safe
    train/val/test by near-dup component), `cap` (skew-safe per-key
    document cap), `tfidf` (top-N keywords per doc), `kmeans`
    (distributed Lloyd's fit over an embedding column), `bpe` (train a
    merge table), `pack-ids` (train + encode + pack token-id
    sequences), `increment` / `increment-emb` (dedup a text or embedding
    delivery against the persisted signature/vector state),
    `ivf-build` / `ivf-increment` / `ivf-query` (persisted-centroid
    ANN retrieval: fit once, assign deltas against the frozen
    centroids, query the state), `ivf-build-q` / `ivf-query-pq`
    (the int8-quantized state variant: ~4× smaller payload, integer
    qcos candidate rank + exact rescore against the full-precision
    source — pass it via --benchmark, default the query parquet),
    `pq-build` / `pq-query` (TRAINED product quantization: per-subspace
    L2 codebooks, m-byte codes — the 10–50× compression step — with
    exact-BIGINT ADC candidate rank + exact rescore;
    --pq-m/--pq-k size the codebooks), `substring-dedup` (corpus-scale
    exact substring dedup — the Lee et al. ≥w-token overlap rule as a
    sorted-shingle digest groupBy + per-token coverage rebuild;
    --window sets w), `c4-rules` (the C4 line/page cleaning ruleset:
    per-rule attrition + cleaned text), `unigram` (SentencePiece-style
    unigram-LM tokenizer: hard-EM Viterbi train over the distinct-word
    table, vocab sidecar at <output>_vocab, encoded pieces out; --n
    vocab size, --window max piece length, --iters EM rounds),
    `sketch` (deterministic distinct-count sketches over --text-col:
    KMV at --n minima + HLL m=256, one estimate row each),
    `weighted-sample` (Efraimidis-Spirakis sampling without
    replacement: --n rows drawn proportional to --order-col, seeded),
    `chat-curate` (SFT conversation
    prep: parse JSONL chat records, validate structure, bound turns,
    render the ChatML training string — all Catalyst, dirty records
    filtered), `preference-pairs` (DPO pair prep from scored
    candidates: deterministic chosen/rejected per prompt),
    `code-profile` (code-corpus stats: language, line shape, comment
    and alnum fractions, license sniff — one codegen scan),
    `code-dedup` (comment/whitespace-invariant exact dedup groups),
    `fim` (char-level fill-in-the-middle prep with seeded cuts),
    `budget-select` (greedy per-source selection under TOKEN budgets),
    `secrets` (anchored secret detection + redaction: AWS keys,
    GitHub/Slack tokens, PEM private keys, JWTs).
    Extends the reference surface (its CLI has no corpus side)."""
    from pyspark.sql import functions as F

    # argument sanity BEFORE a SparkSession spins up: a missing flag
    # should be a one-line usage error, not an AttributeError mid-job
    if args.action in ("increment", "increment-emb", "ivf-build",
                       "ivf-increment", "ivf-query", "ivf-build-q",
                       "ivf-increment-q", "ivf-query-pq",
                       "pq-build", "pq-increment", "pq-query",
                       "substring-increment") and not args.state:
        raise SystemExit(
            f"minerva-spark corpus {args.action}: --state is required "
            "(path of the persisted state)"
        )
    if args.action == "decontaminate" and not args.benchmark:
        raise SystemExit(
            "minerva-spark corpus decontaminate: --benchmark is "
            "required (held-out eval parquet)"
        )
    spark = _spark()
    df = spark.read.parquet(args.input)
    if args.action == "split":
        from minerva_etl_spark.operators.dedup import (
            connected_components,
            minhash_candidate_pairs,
        )
        from minerva_etl_spark.operators.split import leakage_safe_split

        fracs = {}
        for part in args.fractions.split(","):
            name, _, frac = part.partition("=")
            fracs[name.strip()] = float(frac)
        comps = connected_components(minhash_candidate_pairs(df))
        out = leakage_safe_split(df, comps, fracs, seed=args.seed)
    elif args.action == "cap":
        from minerva_etl_spark.operators.skew import cap_per_key

        out = cap_per_key(
            df,
            keys=args.keys.split(","),
            order_by=[F.col(args.order_col).desc(), F.col("doc_id").asc()],
            n=args.n,
            salt_col="doc_id",
        )
    elif args.action == "tfidf":
        from minerva_etl_spark.operators.text import tfidf_top_terms

        out = tfidf_top_terms(df, n=args.n)
    elif args.action == "kmeans":
        from minerva_etl_spark.operators.kmeans import kmeans_fit

        assigned, cent = kmeans_fit(df, k=args.n, iters=args.iters)
        cent.write.mode("overwrite").parquet(args.output + "_centroids")
        out = assigned
    elif args.action == "bpe":
        from minerva_etl_spark.operators.bpe import bpe_train

        merges, _vocab = bpe_train(df, n_merges=args.n)
        if getattr(args, "byte_fallback", False):
            # --byte-fallback: emit token-id arrays through the
            # persisted-vocab byte-fallback encoder (never -1/dropped)
            # instead of the merge table
            from minerva_etl_spark.operators.bpe import (
                bpe_encode_ids_bf,
                bpe_vocab,
            )

            vocab_ids = bpe_vocab(df, merges)
            out = bpe_encode_ids_bf(df, merges, vocab_ids)
        else:
            out = merges
    elif args.action == "increment":
        from minerva_etl_spark.operators.incremental import ingest_increment

        out = ingest_increment(spark, df, args.state)
    elif args.action == "decontaminate":
        bench = spark.read.parquet(args.benchmark)
        if args.bloom_bits:
            # scale path: bloom prefilter + exact confirm — same
            # answer, benchmark never broadcast as strings
            from minerva_etl_spark.operators.bloom import (
                contamination_check_bloom,
            )

            hits = contamination_check_bloom(
                df, bench, num_bits=args.bloom_bits
            ).select("doc_id")
        else:
            from minerva_etl_spark.operators.dedup import (
                contamination_check,
            )

            hits = contamination_check(df, bench).select("doc_id")
        out = df.join(hits, "doc_id", "left_anti")
    elif args.action == "increment-emb":
        from minerva_etl_spark.operators.incremental import (
            ingest_embedding_increment,
        )

        out = ingest_embedding_increment(spark, df, args.state)
    elif args.action == "ivf-build":
        from minerva_etl_spark.operators.incremental import build_ivf_state

        out = build_ivf_state(
            spark, df, args.state, k=args.n, iters=args.iters
        )
    elif args.action == "ivf-increment":
        from minerva_etl_spark.operators.incremental import (
            ivf_increment,
            ivf_needs_recluster,
        )

        out = ivf_increment(spark, df, args.state)
        if ivf_needs_recluster(spark, args.state):
            print(
                "corpus ivf-increment: corpus grew past the recluster "
                "factor — refit with ivf-build at k ~ sqrt(N)"
            )
    elif args.action == "ivf-query":
        from pyspark.sql import functions as FF

        from minerva_etl_spark.operators.incremental import ivf_state_query

        out = ivf_state_query(
            spark,
            df.select(
                FF.col("vec_id").alias("query_id"),
                FF.col("embedding").alias("query_vec"),
            ),
            args.state,
            k=args.n,
        )
    elif args.action == "ivf-build-q":
        from minerva_etl_spark.operators.quantize import build_ivf_state_q

        out = build_ivf_state_q(
            spark, df, args.state, k=args.n, iters=args.iters
        )
    elif args.action == "ivf-increment-q":
        from minerva_etl_spark.operators.incremental import (
            ivf_needs_recluster,
        )
        from minerva_etl_spark.operators.quantize import ivf_increment_q

        out = ivf_increment_q(spark, df, args.state)
        if ivf_needs_recluster(spark, args.state):
            print(
                "corpus ivf-increment-q: corpus grew past the "
                "recluster factor — refit with ivf-build-q at "
                "k ~ sqrt(N)"
            )
    elif args.action == "ivf-query-pq":
        from pyspark.sql import functions as FF

        from minerva_etl_spark.operators.quantize import ivf_state_query_q

        # --benchmark doubles as the full-precision SOURCE for the
        # exact rescore (defaults to the query parquet itself when the
        # queries are drawn from the indexed corpus)
        source = (
            spark.read.parquet(args.benchmark) if args.benchmark else df
        )
        out = ivf_state_query_q(
            spark,
            df.select(
                FF.col("vec_id").alias("query_id"),
                FF.col("embedding").alias("query_vec"),
            ),
            args.state,
            source=source,
            k=args.n,
        )
    elif args.action == "pq-build":
        from minerva_etl_spark.operators.pq import build_ivf_pq_state

        out = build_ivf_pq_state(
            spark, df, args.state, coarse_k=args.n, coarse_iters=args.iters,
            m=args.pq_m, pq_k=args.pq_k, pq_iters=args.iters,
        )
    elif args.action == "pq-increment":
        from minerva_etl_spark.operators.incremental import (
            ivf_needs_recluster,
        )
        from minerva_etl_spark.operators.pq import ivf_pq_increment

        out = ivf_pq_increment(spark, df, args.state)
        if ivf_needs_recluster(spark, args.state):
            print(
                "corpus pq-increment: corpus grew past the recluster "
                "factor — refit with pq-build at coarse k ~ sqrt(N)"
            )
    elif args.action == "pq-query":
        from pyspark.sql import functions as FF

        from minerva_etl_spark.operators.pq import ivf_pq_state_query

        # --benchmark doubles as the full-precision rescore source
        # (the ivf-query-pq convention)
        source = (
            spark.read.parquet(args.benchmark) if args.benchmark else df
        )
        out = ivf_pq_state_query(
            spark,
            df.select(
                FF.col("vec_id").alias("query_id"),
                FF.col("embedding").alias("query_vec"),
            ),
            args.state,
            source=source,
            k=args.n,
        )
    elif args.action == "unigram":
        from minerva_etl_spark.operators.unigram import (
            unigram_encode,
            unigram_train,
        )

        vocab = unigram_train(
            df, max_vocab=args.vocab_size, max_len=args.max_piece_len,
            iters=args.iters, text_col=args.text_col,
        )
        vocab.write.mode("overwrite").parquet(args.output + "_vocab")
        if getattr(args, "byte_fallback", False):
            from minerva_etl_spark.operators.unigram import (
                unigram_encode_bf,
            )

            out = unigram_encode_bf(
                df, vocab, max_len=args.max_piece_len,
                text_col=args.text_col,
            )
        else:
            out = unigram_encode(
                df, vocab, max_len=args.max_piece_len,
                text_col=args.text_col,
            )
    elif args.action == "weighted-sample":
        from minerva_etl_spark.operators.mixing import weighted_sample

        out = weighted_sample(
            df, n=args.n, weight_col=args.order_col, seed=args.seed
        )
    elif args.action == "sketch":
        from pyspark.sql import functions as FF

        from minerva_etl_spark.operators.sketch import (
            hll_estimate,
            hll_registers,
            kmv_estimate_expr,
            kmv_sketch,
        )

        items = df.select(FF.col(args.text_col).alias("item"))
        kmv = kmv_sketch(items, "item", k=args.n).filter(
            FF.col("pos") == args.n
        ).select(
            FF.lit("kmv").alias("method"),
            kmv_estimate_expr(args.n).alias("estimate"),
        )
        hll = hll_estimate(hll_registers(items, "item"), b=8).select(
            FF.lit("hll").alias("method"), "estimate"
        )
        out = kmv.unionByName(hll)
    elif args.action == "c4-rules":
        from minerva_etl_spark.operators.text import c4_rules

        out = c4_rules(df, text_col=args.text_col)
    elif args.action == "substring-dedup":
        from minerva_etl_spark.operators.substring import substring_dedup

        out = substring_dedup(
            df, w=args.window, text_col=args.text_col
        )
    elif args.action == "substring-increment":
        from minerva_etl_spark.operators.substring import (
            build_substring_state,
            substring_increment,
        )
        from minerva_etl_spark.fsutil import parquet_exists

        if parquet_exists(spark, args.state.rstrip("/")):
            out = substring_increment(
                spark, df, args.state, w=args.window,
                text_col=args.text_col,
            )
        else:
            out = build_substring_state(
                spark, df, args.state, w=args.window,
                text_col=args.text_col,
            )
    elif args.action == "script-profile":
        from minerva_etl_spark.operators.text import with_script_profile

        out = with_script_profile(df, text_col=args.text_col)
    elif args.action == "ppl-buckets":
        from minerva_etl_spark.operators.lm import (
            ngram_lm_score,
            perplexity_buckets,
        )

        scored = ngram_lm_score(
            df, args.ref_filter or "lang = 'en'"
        ).join(df.select("doc_id", "lang"), "doc_id")
        out = perplexity_buckets(scored, n_buckets=args.n)
    elif args.action == "pack-semantic":
        from minerva_etl_spark.operators.shard import pack_semantic

        if not args.benchmark:
            raise SystemExit(
                "minerva-spark corpus pack-semantic: --benchmark is "
                "required (embeddings parquet keyed like the corpus)"
            )
        out = pack_semantic(
            df,
            spark.read.parquet(args.benchmark),
            seq_len=args.seq_len,
            k=args.n,
            iters=args.iters,
        )
    elif args.action == "bitext":
        from pyspark.sql import functions as FF

        from minerva_etl_spark.operators.bitext import (
            bitext_candidates,
            mine_bitext,
        )

        if not args.benchmark:
            raise SystemExit(
                "minerva-spark corpus bitext: --benchmark is required "
                "(target-side embedding parquet)"
            )
        tgt_raw = spark.read.parquet(args.benchmark)
        if args.ann:
            # corpus×corpus: probe-pruned IVF candidates instead of
            # the quadratic broadcast product (the CCMatrix shape)
            from minerva_etl_spark.operators.kmeans import kmeans_fit
            from minerva_etl_spark.operators.similarity import (
                assign_centroids,
                ivf_join,
            )

            src = df.select(
                FF.col("vec_id").alias("query_id"),
                FF.col("embedding").alias("query_vec"),
            )
            _a, cent = kmeans_fit(
                tgt_raw, k=args.ann_clusters, iters=args.iters
            )
            cand = ivf_join(
                src, assign_centroids(tgt_raw, cent), cent,
                k=max(args.n * 2, 8), n_probe=args.n_probe,
            ).select(
                FF.col("query_id").alias("src_id"),
                FF.col("vec_id").alias("tgt_id"),
                "cosine",
            )
        else:
            src = df.select(
                FF.col("vec_id").alias("src_id"), "embedding"
            )
            tgt = tgt_raw.select(
                FF.col("vec_id").alias("tgt_id"), "embedding"
            )
            cand = bitext_candidates(src, tgt)
        out = mine_bitext(
            cand,
            k=args.n,
            threshold=args.min_margin or 1.05,
        )
    elif args.action == "chat-curate":
        from minerva_etl_spark.operators.chat import curate_conversations

        # drop both the parsed array AND the raw JSON: keeping the
        # source string beside the rendered text would double the
        # output parquet of a large SFT delivery
        out = curate_conversations(
            df, min_turns=args.min_turns, max_turns=args.max_turns
        ).drop("messages", "messages_json")
    elif args.action == "preference-pairs":
        from minerva_etl_spark.operators.preference import preference_pairs

        out = preference_pairs(df, min_margin=args.min_margin)
    elif args.action == "code-profile":
        from minerva_etl_spark.operators.code import with_code_profile

        out = with_code_profile(
            df,
            text_col=args.text_col,
            path_col=args.path_col if args.path_col else None,
        )
    elif args.action == "code-dedup":
        from minerva_etl_spark.operators.code import dedup_code_groups

        out = dedup_code_groups(
            df, id_col=args.id_col, text_col=args.text_col
        )
    elif args.action == "fim":
        from minerva_etl_spark.operators.code import fim_transform

        out = fim_transform(
            df, text_col=args.text_col, id_col=args.id_col,
            seed=args.seed, rate=args.rate, spm=args.spm,
        )
    elif args.action == "secrets":
        from minerva_etl_spark.operators.code import (
            redact_secrets,
            with_secret_scan,
        )

        out = redact_secrets(
            with_secret_scan(df, args.text_col), args.text_col
        )
    elif args.action == "budget-select":
        from minerva_etl_spark.operators.mixing import select_token_budget

        if "=" in args.budget:
            budgets: "dict[str, int] | int" = {}
            for part in args.budget.split(","):
                name, _, b = part.partition("=")
                budgets[name.strip()] = int(b)
        else:
            budgets = int(args.budget)
        out = select_token_budget(
            df, budgets,
            token_col=args.token_col,
            priority_col=args.priority_col or None,
            id_col=args.id_col,
        )
    elif args.action == "pack-ids":
        from minerva_etl_spark.operators.bpe import bpe_train
        from minerva_etl_spark.operators.shard import (
            write_packed_token_ids,
            write_token_ids_binary,
        )

        merges, _vocab = bpe_train(df, n_merges=args.n)
        if args.binary:
            manifest = write_token_ids_binary(
                df, merges, args.output, seq_len=args.seq_len,
                shuffle_seed=args.seed,
            )
            rows = manifest.collect()
            n_seqs = sum(r.n_seqs for r in rows)
            print(
                f"corpus pack-ids: {n_seqs} sequences in {len(rows)} "
                f".bin/.idx shards -> {args.output}"
            )
            return
        n_seqs = write_packed_token_ids(
            df, merges, args.output, seq_len=args.seq_len,
            shuffle_seed=args.seed,
        )
        print(f"corpus pack-ids: {n_seqs} sequences -> {args.output}")
        return
    else:  # pragma: no cover - argparse choices guard this
        raise ValueError(args.action)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"corpus {args.action}: {n} rows -> {args.output}")


def cmd_media(args) -> None:
    """`minerva-spark media <action>`: the multimodal operators as CLI
    verbs over a parquet of ``(media_id, payload binary)`` rows —
    `wav-features` (real RIFF/WAVE decode: rate, frames, duration,
    RMS), `png-features` / `jpeg-features` / `image-features` (real
    image decode — `image-features` sniffs magic bytes and routes each
    payload to the right codec: dimensions, channels, per-channel
    means), `png-resize` / `image-resize` (nearest-neighbor resize,
    re-encoded PNG payloads out; `image-resize` accepts a mixed
    PNG/JPEG column and normalizes to PNG), `frames`
    (fixed-stride frame sampling), `pdf-text` (real PDF text
    extraction: object scan, FlateDecode, Tj/TJ operators —
    `--on-error skip` for dirty corpora), `docx-text` (OOXML
    WordprocessingML extraction: stdlib zip + run/tab/br/table walk,
    dc:title metadata, same --on-error contract), `epub-text` (EPUB
    container walk: container.xml -> OPF spine -> XHTML chapters
    through the engine's one HTML extractor), `office-text`
    (mixed-format dispatch: magic-byte sniff routes one binary column
    across the PDF/DOCX/EPUB codecs, unified schema out), `eml-text`
    (RFC 5322/MIME extraction: transfer decoding, plain-over-html
    preference, RFC 2047 subjects), `mbox-split` (mailbox -> one row
    per message, From-unescaped, ready for eml-text), `rtf-text`
    (RTF group-stack tokenizer: destination skips, hex/unicode
    escapes), `image-dhash` /
    `image-dedup` (perceptual near-dup hashing over decoded pixels
    and the pigeonhole hamming pair join), `audio-fingerprint` /
    `audio-dedup` (frame-energy envelope hash over decoded WAV,
    same pair machinery), `video-dhash` / `video-dedup`
    (frame-sampled dHash over decoded AVI; clips pair on ANY
    matching frame), `image-increment` / `audio-increment` /
    `video-increment` (dedup a new media delivery against the
    persisted hash state — history payloads never re-decoded),
    `features` (generic
    extractor — `--decoder pkg.mod:fn` injects a real decoder, e.g. a
    PIL or ffmpeg wrapper, on clusters that have one installed).
    Extends the
    reference surface (media is opaque blobs there; here decode runs
    Arrow-batched inside tasks)."""
    import minerva_etl_spark.operators.multimodal as M

    spark = _spark()
    # wds-import's --input is a shard DIRECTORY, not parquet
    df = (
        spark.read.parquet(args.input)
        if args.action != "wds-import" else None
    )
    if args.action == "wav-features":
        out = M.wav_features(df)
    elif args.action == "wav-spectral":
        out = M.wav_spectral(df)
    elif args.action == "features":
        if args.decoder:
            import importlib

            mod_name, _, fn_name = args.decoder.partition(":")
            if not fn_name:
                raise SystemExit(
                    "minerva-spark media features: --decoder must be "
                    "'pkg.mod:callable'"
                )
            decoder = getattr(importlib.import_module(mod_name), fn_name)
        else:
            decoder = M.deterministic_fake_decode
        out = M.extract_features(df, decoder=decoder)
    elif args.action == "jpeg-features":
        out = M.jpeg_features(df)
    elif args.action == "gif-features":
        from minerva_etl_spark.operators.gif import gif_features

        out = gif_features(df)
    elif args.action == "image-features":
        # routes png/jpeg/gif/tiff/bmp by magic bytes
        out = M.image_features(df)
    elif args.action == "tiff-features":
        from minerva_etl_spark.operators.tiff import tiff_features

        out = tiff_features(df, on_error=args.on_error)
    elif args.action == "image-resize":
        out = M.image_resize(df, args.width, args.height)
    elif args.action == "avi-features":
        out = M.avi_features(df)
    elif args.action == "avi-frames":
        out = M.avi_sample_frames(
            df, every_n=args.frame_stride, max_frames=args.n
        )
    elif args.action == "png-features":
        out = M.png_features(df)
    elif args.action == "png-resize":
        out = M.png_resize(df, args.width, args.height)
    elif args.action == "frames":
        out = M.sample_frames(
            df, every_n_bytes=args.stride, max_frames=args.n
        )
    elif args.action == "pdf-text":
        from minerva_etl_spark.operators.pdf import pdf_extract

        out = pdf_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "docx-text":
        from minerva_etl_spark.operators.docx import docx_extract

        out = docx_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "epub-text":
        from minerva_etl_spark.operators.epub import epub_extract

        out = epub_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "office-meta":
        from minerva_etl_spark.operators.office import office_metadata

        out = office_metadata(
            df, id_col="media_id", on_error=args.on_error
        )
    elif args.action == "office-text":
        from minerva_etl_spark.operators.office import office_extract

        out = office_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "xlsb-text":
        from minerva_etl_spark.operators.xlsb import xlsb_extract

        out = xlsb_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "odf-text":
        from minerva_etl_spark.operators.odf import odf_extract

        out = odf_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "office-decrypt":
        from minerva_etl_spark.operators.office import (
            office_decrypt_extract,
        )

        out = office_decrypt_extract(
            df, id_col="media_id", password=args.password,
            on_error=args.on_error,
        )
    elif args.action == "eml-text":
        from minerva_etl_spark.operators.email_ingest import eml_extract

        out = eml_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "eml-attachments":
        from minerva_etl_spark.operators.email_ingest import (
            eml_attachments,
        )

        out = eml_attachments(df, id_col="media_id")
    elif args.action == "mbox-split":
        from minerva_etl_spark.operators.email_ingest import mbox_split

        out = mbox_split(df, id_col="media_id")
    elif args.action == "rtf-text":
        from minerva_etl_spark.operators.rtf import rtf_extract

        out = rtf_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "xlsx-text":
        from minerva_etl_spark.operators.xlsx import xlsx_extract

        out = xlsx_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "pptx-text":
        from minerva_etl_spark.operators.pptx import pptx_extract

        out = pptx_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "doc-text":
        from minerva_etl_spark.operators.msdoc import doc_extract

        out = doc_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "xls-text":
        from minerva_etl_spark.operators.xls import xls_extract

        out = xls_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "ppt-text":
        from minerva_etl_spark.operators.ppt import ppt_extract

        out = ppt_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "msg-text":
        from minerva_etl_spark.operators.msg import msg_extract

        out = msg_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "mail-text":
        from minerva_etl_spark.operators.email_ingest import mail_extract

        out = mail_extract(df, id_col="media_id", on_error=args.on_error)
    elif args.action == "exif-scan":
        from minerva_etl_spark.operators.exif import exif_scan

        out = exif_scan(df)
    elif args.action == "exif-strip":
        from minerva_etl_spark.operators.exif import strip_exif

        out = strip_exif(df)
    elif args.action == "image-dhash":
        from minerva_etl_spark.operators.imagehash import image_dhash

        out = image_dhash(df, on_error=args.on_error)
    elif args.action == "image-dedup":
        from minerva_etl_spark.operators.imagehash import (
            dhash_pairs,
            image_dhash,
        )

        out = dhash_pairs(
            image_dhash(df, on_error=args.on_error), radius=args.radius
        )
    elif args.action == "audio-fingerprint":
        from minerva_etl_spark.operators.audiohash import audio_fingerprint

        out = audio_fingerprint(df, on_error=args.on_error)
    elif args.action == "audio-dedup":
        from minerva_etl_spark.operators.audiohash import audio_fingerprint
        from minerva_etl_spark.operators.imagehash import dhash_pairs

        hashes = audio_fingerprint(df, on_error=args.on_error)
        out = dhash_pairs(
            hashes.select("media_id", "d0", "d1", "d2", "d3"),
            radius=args.radius,
        )
    elif args.action == "video-dhash":
        from minerva_etl_spark.operators.imagehash import video_frame_hashes

        out = video_frame_hashes(
            df, every_n=args.frame_stride, max_frames=args.n,
            on_error=args.on_error,
        )
    elif args.action == "image-increment":
        from minerva_etl_spark.operators.imagehash import (
            ingest_image_increment,
        )

        if not args.state:
            raise SystemExit(
                "minerva-spark media image-increment: --state is "
                "required (path of the persisted hash state)"
            )
        out = ingest_image_increment(
            spark, df, args.state, radius=args.radius,
            on_error=args.on_error,
        )
    elif args.action == "audio-increment":
        from minerva_etl_spark.operators.audiohash import (
            ingest_audio_increment,
        )

        if not args.state:
            raise SystemExit(
                "minerva-spark media audio-increment: --state is "
                "required (path of the persisted hash state)"
            )
        out = ingest_audio_increment(
            spark, df, args.state, radius=args.radius,
            on_error=args.on_error,
        )
    elif args.action == "video-increment":
        from minerva_etl_spark.operators.imagehash import (
            ingest_video_increment,
        )

        if not args.state:
            raise SystemExit(
                "minerva-spark media video-increment: --state is "
                "required (path of the persisted hash state)"
            )
        out = ingest_video_increment(
            spark, df, args.state, every_n=args.frame_stride,
            max_frames=args.n, radius=args.radius,
            on_error=args.on_error,
        )
    elif args.action == "video-dedup":
        from minerva_etl_spark.operators.imagehash import (
            video_dedup_pairs,
            video_frame_hashes,
        )

        out = video_dedup_pairs(
            video_frame_hashes(
                df, every_n=args.frame_stride, max_frames=args.n,
                on_error=args.on_error,
            ),
            radius=args.radius,
        )
    elif args.action == "wds-export":
        from minerva_etl_spark.operators.wds import wds_export

        if not args.exts:
            raise SystemExit(
                "minerva-spark media wds-export: --exts is required "
                "(column=extension comma list, e.g. "
                "payload=jpg,caption=txt)"
            )
        exts = {}
        for part in args.exts.split(","):
            col, _, ext = part.partition("=")
            exts[col.strip()] = ext.strip()
        out = wds_export(
            df, args.wds_dir or args.output + "_shards", exts,
            key_col=args.id_col, n_shards=args.n_shards,
        )
    elif args.action == "wds-import":
        from minerva_etl_spark.operators.wds import wds_import

        out = wds_import(spark, args.input)
    else:  # pragma: no cover - argparse choices guard this
        raise ValueError(args.action)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"media {args.action}: {n} rows -> {args.output}")


def cmd_archive(args) -> None:
    """`minerva-spark archive <action>`: tar/zip corpus ingest —
    `read` explodes archives into one row per member (archive,
    member, size, content, text), one task per archive (the WARC
    scale unit; see `sources/archive.py`); `export` writes
    (archive, member, content) rows back out as one archive per
    distinct name, written by the owning task.  Archives also load
    through the harvest-plugin path (`load-data --file-type tar|zip`)."""
    from minerva_etl_spark.sources.archive import (
        read_archives,
        write_archives,
    )

    spark = _spark()
    if args.action == "read":
        out = read_archives(
            spark, args.input,
            members_glob=args.members, on_error=args.on_error,
        )
    else:
        df = spark.read.parquet(args.input)
        out_dir = args.output_dir or (args.output + ".archives")
        out = write_archives(df, out_dir)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"archive {args.action}: {n} rows -> {args.output}")


def cmd_crawl(args) -> None:
    """`minerva-spark crawl <action>`: the web-crawl ingest edge of
    the pipeline — `warc-read` parses WARC files (plain or Common
    Crawl record-gzipped) into a records parquet; `warc-export` writes
    (warc_file, record_id, target_uri, warc_date, body) rows back out
    as real WARC files (one per group, written by the owning task);
    `html-extract` turns an (doc_id, html) parquet into (doc_id,
    title, text, n_links); `feed-entries` parses RSS 2.0/RSS 1.0/Atom feeds into one row
    per entry (title, link, published, guid — the incremental
    frontier signal beside `sitemap-urls`); `warc-to-text` is the fused end-to-end
    harvest: WARC dir → HTTP response records → HTML extraction → a
    documents-shaped parquet ready for every text operator;
    `url-profile` / `domain-report` add the parse_url-based URL parts
    (scheme/host/depth/TLD/registrable domain) and the per-domain
    crawl report — pure Catalyst expressions, no UDF."""
    from minerva_etl_spark.operators.html import html_extract
    from minerva_etl_spark.sources.warc import read_warc, write_warc_files

    spark = _spark()
    if args.action == "warc-read":
        out = read_warc(spark, args.input)
        if args.types:
            out = out.where(
                F.col("warc_type").isin(args.types.split(","))
            )
    elif args.action == "wat-links":
        from minerva_etl_spark.sources.wet import wat_links

        out = wat_links(spark, args.input)
    elif args.action == "warc-export":
        df = spark.read.parquet(args.input)
        out = write_warc_files(df, args.output_dir or args.output)
        n = out.agg(F.sum("n_records")).collect()[0][0]
        print(f"crawl warc-export: {n} records -> "
              f"{args.output_dir or args.output}")
        return
    elif args.action == "html-extract":
        out = html_extract(
            spark.read.parquet(args.input), html_col=args.html_col
        )
    elif args.action == "url-profile":
        from minerva_etl_spark.operators.urlops import with_url_parts

        out = with_url_parts(
            spark.read.parquet(args.input), url_col=args.url_col
        )
    elif args.action == "domain-report":
        from minerva_etl_spark.operators.urlops import domain_report

        out = domain_report(
            spark.read.parquet(args.input), url_col=args.url_col
        )
    elif args.action == "sitemap-urls":
        from minerva_etl_spark.operators.sitemap import sitemap_urls

        out = sitemap_urls(
            spark.read.parquet(args.input), xml_col=args.xml_col
        )
    elif args.action == "markup-extract":
        from minerva_etl_spark.operators.markup import markup_to_text

        out = markup_to_text(spark.read.parquet(args.input))
    elif args.action == "feed-entries":
        from minerva_etl_spark.operators.feeds import feed_entries

        out = feed_entries(
            spark.read.parquet(args.input), xml_col=args.xml_col
        )
    elif args.action == "fetch-schedule":
        from minerva_etl_spark.operators.robots import (
            crawl_delays,
            schedule_fetches,
        )

        if not args.robots:
            raise SystemExit(
                "minerva-spark crawl fetch-schedule: --robots required"
            )
        out = schedule_fetches(
            spark.read.parquet(args.input),
            crawl_delays(spark.read.parquet(args.robots),
                         agent=args.agent),
            url_col=args.url_col,
        )
    elif args.action == "robots-sitemaps":
        from minerva_etl_spark.operators.robots import (
            sitemaps_from_robots,
        )

        out = sitemaps_from_robots(spark.read.parquet(args.input))
    elif args.action == "frontier-ingest":
        from minerva_etl_spark.operators.frontier import (
            ingest_frontier_increment,
        )

        if not args.state:
            raise SystemExit(
                "minerva-spark crawl frontier-ingest: --state required"
            )
        out = ingest_frontier_increment(
            spark, spark.read.parquet(args.input), args.state,
            url_col=args.url_col,
        )
    elif args.action == "robots-filter":
        from minerva_etl_spark.operators.robots import filter_allowed
        from minerva_etl_spark.operators.urlops import with_url_parts

        if not args.robots:
            raise SystemExit(
                "minerva-spark crawl robots-filter requires --robots"
            )
        urls = spark.read.parquet(args.input)
        if "host" not in urls.columns:
            urls = with_url_parts(urls, url_col=args.url_col).select(
                *urls.columns, "host"
            )
        out = filter_allowed(
            urls,
            spark.read.parquet(args.robots),
            agent=args.agent,
            url_col=args.url_col,
        )
    elif args.action == "warc-to-text":
        from minerva_etl_spark.operators.charset import decode_text

        records = read_warc(spark, args.input).where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
        # deterministic ids: a re-run over the same WARCs yields the
        # same doc_ids regardless of partition layout
        docs = records.select(
            F.xxhash64("record_id", "target_uri").alias("doc_id"),
            F.col("target_uri"),
            F.col("http_content_type"),
            F.col("body"),
        )
        # browser charset resolution (BOM > header > meta > utf-8)
        # before parsing — a real crawl's bodies are a charset mess
        decoded = decode_text(
            docs, body_col="body", content_type_col="http_content_type"
        )
        out = html_extract(
            decoded.withColumnRenamed("text", "html")
        ).join(
            decoded.select("doc_id", "charset", "charset_source"),
            "doc_id",
        ).join(docs.select("doc_id", "target_uri"), "doc_id")
    else:  # pragma: no cover - argparse choices guard this
        raise ValueError(args.action)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"crawl {args.action}: {n} rows -> {args.output}")


def cmd_curate(args) -> None:
    """`minerva-spark curate`: run the full corpus-curation pipeline
    (`operators/pipeline.py::curate_corpus` — quality filter → near-dup
    canonical dedup → benchmark decontamination → mix/shuffle/pack) over
    a documents parquet and write the shard-assignment table.  Extends
    the reference surface: the LLM-corpus side of the engine, operable
    like any other subcommand."""
    from minerva_etl_spark.operators.pipeline import curate_corpus

    spark = _spark()
    docs = spark.read.parquet(args.documents)
    bench = (
        spark.read.parquet(args.benchmark)
        if args.benchmark
        else docs.limit(0)
    )
    out = curate_corpus(
        docs,
        bench,
        alpha=args.alpha,
        shard_tokens=args.shard_tokens,
        shuffle_seed=args.seed,
        source_col=args.source_col,
        boilerplate_max_docs=args.boilerplate_max_docs,
        cap_per_source=args.cap_per_source,
    )
    out.write.mode("overwrite").parquet(args.output)
    row = (
        spark.read.parquet(args.output)
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("shard_id").alias("s"),
        )
        .collect()[0]
    )
    print(f"curated {row['n']} units into {row['s']} shards -> {args.output}")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="minerva-spark")
    p.add_argument("--instance", default="instance", help="instance YAML dir")
    p.add_argument("--data-dir", default="data", help="table storage root")
    sub = p.add_subparsers(dest="cmd", required=True)

    ld = sub.add_parser("load-data")
    ld.add_argument("--data-source", required=True)
    ld.add_argument("--entity-type", required=True)
    ld.add_argument("--granularity", default=None,
                    help="required for trend loads")
    ld.add_argument("--target", choices=["trend", "attribute"],
                    default="trend",
                    help="store flavor the harvest file feeds "
                         "(reference: trend vs attribute plugin API)")
    ld.add_argument("--file-type", default="csv")
    ld.add_argument("--identifier-column", default="entity")
    ld.add_argument("--timestamp-column", default="timestamp")
    ld.add_argument("--delimiter", default=",")
    ld.add_argument("files", nargs="+")
    ld.set_defaults(fn=cmd_load_data)

    rp = sub.add_parser("report")
    rp.add_argument("--data-source", help="omit for the instance-wide report")
    rp.add_argument("--entity-type")
    rp.add_argument("--granularity")
    rp.set_defaults(fn=cmd_report)

    rt = sub.add_parser("retention")
    rt.add_argument("--data-source", required=True)
    rt.add_argument("--entity-type", required=True)
    rt.add_argument("--granularity", required=True)
    rt.set_defaults(fn=cmd_retention)

    ag = sub.add_parser("aggregation-generate")
    ag.add_argument("--raw-only", action="store_true")
    ag.add_argument("--with-relations", action="store_true",
                    help="also generate entity aggregations per relation")
    ag.add_argument("--definitions", action="store_true",
                    help="emit aggregation/*.yaml definition files "
                         "instead of compiled trend/materialization "
                         "files (two-step reference workflow)")
    ag.set_defaults(fn=cmd_aggregation_generate)

    agc = sub.add_parser("aggregation-compile")
    agc.add_argument("--format", choices=["yaml", "json"], default="yaml")
    agc.add_argument("definition", nargs="+",
                     help="aggregation definition file(s)")
    agc.set_defaults(fn=cmd_aggregation_compile)

    agca = sub.add_parser("aggregation-compile-all")
    agca.set_defaults(fn=cmd_aggregation_compile_all)

    mt = sub.add_parser("materialize")
    mt.add_argument("--max-num", type=int, default=None)
    mt.add_argument("--now", default=None,
                    help="ISO timestamp to schedule against (backfills)")
    mt.set_defaults(fn=cmd_materialize)

    lm = sub.add_parser("live-monitor")
    lm.add_argument("--poll-seconds", type=float, default=2.0)
    lm.add_argument("--cycles", type=int, default=None,
                    help="stop after N cycles (default: run forever)")
    lm.add_argument("--batch", type=int, default=50)
    lm.set_defaults(fn=cmd_live_monitor)

    at = sub.add_parser("attribute")
    at.add_argument("action", choices=["compact", "curr"])
    at.add_argument("--data-source", required=True)
    at.add_argument("--entity-type", required=True)
    at.set_defaults(fn=cmd_attribute)

    ats = sub.add_parser("attribute-store")
    ats.add_argument(
        "action",
        choices=[
            "compact", "materialize-curr-ptr", "delete",
            "materialization-list", "materialization-run",
            "create", "add-attribute", "remove-attribute", "show",
            "list", "list-config",
        ],
    )
    ats.add_argument("store", nargs="?",
                     help="store key (data_source_entity_type), or the "
                          "definition YAML for 'create'")
    ats.add_argument("--attribute-name",
                     help="attribute to add/remove")
    ats.add_argument("--data-type", help="data type (add-attribute)")
    ats.add_argument("--all", action="store_true",
                     help="apply to every attribute store of the instance")
    ats.add_argument("--materialize-curr", action="store_true",
                     help="refresh the curr pointer after sampling "
                          "(materialization-run)")
    ats.set_defaults(fn=cmd_attribute_store)

    ini = sub.add_parser("initialize")
    ini.set_defaults(fn=cmd_initialize)

    st = sub.add_parser("structure")
    st.add_argument("action", choices=["dump"], nargs="?", default="dump")
    st.set_defaults(fn=cmd_structure)

    dc = sub.add_parser("deduce-config")
    dc.add_argument("file")
    dc.add_argument("--identifier-column", default="entity")
    dc.add_argument("--timestamp-column", default="timestamp")
    dc.add_argument("--delimiter", default=",")
    dc.add_argument("--granularity", default="15m")
    dc.add_argument("--data-source", default="DATASOURCE")
    dc.add_argument("--entity-type", default="ENTITYTYPE")
    dc.add_argument("--part-name", default="PART")
    dc.add_argument("--out", default=None)
    dc.set_defaults(fn=cmd_deduce_config)

    alt = sub.add_parser("alter-trends")
    alt.add_argument("--data-source", required=True)
    alt.add_argument("--entity-type", required=True)
    alt.add_argument("--granularity", required=True)
    alt.add_argument("--part", required=True)
    alt.add_argument("columns", nargs="+")
    alt.set_defaults(fn=cmd_alter_trends)

    ls = sub.add_parser("load-sample-data")
    ls.add_argument("--data-source", required=True)
    ls.add_argument("--entity-type", required=True)
    ls.add_argument("--granularity", required=True)
    ls.add_argument("--entities", type=int, default=10)
    ls.add_argument("--periods", type=int, default=96)
    ls.add_argument("--start", default="2023-01-01T00:15:00")
    ls.set_defaults(fn=cmd_load_sample_data)

    gs = sub.add_parser("generate-sample-data")
    gs.add_argument("-t", "--target-directory", default=None)
    gs.add_argument("--timestamp", default=None,
                    help="ISO timestamp the generators anchor to")
    gs.add_argument("dataset", nargs="?",
                    help="only generate the named dataset")
    gs.set_defaults(fn=cmd_generate_sample_data)

    for kind in ("data-source", "entity-type"):
        dp = sub.add_parser(kind)
        dp.add_argument("action", choices=["create", "delete", "list"])
        dp.add_argument("name", nargs="?")
        dp.set_defaults(fn=cmd_directory, kind=kind)

    al = sub.add_parser("alias")
    al.add_argument("action", choices=["create", "delete", "list"])
    al.add_argument("--file", help="CSV with (alias, name) columns")
    al.add_argument("--entity-type", default="entity")
    al.add_argument("--alias-type", default="name")
    al.set_defaults(fn=cmd_alias)

    tr = sub.add_parser("trigger")
    tr.add_argument(
        "action",
        choices=[
            "create", "list", "enable", "disable", "delete",
            "update-weight", "set-thresholds", "create-notifications",
            "update-kpi-function", "update-data-function",
        ],
    )
    tr.add_argument("name", nargs="?")
    tr.add_argument("--file", help="trigger YAML (create / update-*-function)")
    tr.add_argument("--value", help="weight / k=v,k=v thresholds")
    tr.add_argument("--timestamp", default=None)
    tr.add_argument("--notification-store", default=None)
    tr.set_defaults(fn=cmd_trigger)

    rel = sub.add_parser("relation")
    rel.add_argument("action", choices=["create", "materialize", "remove"])
    rel.add_argument("name", nargs="?", help="relation name (remove)")
    rel.add_argument("--file", help="relation YAML (create)")
    rel.add_argument("--names", nargs="*", default=None,
                     help="restrict materialize to these relations")
    rel.set_defaults(fn=cmd_relation)

    ve = sub.add_parser("virtual-entity")
    ve.add_argument("action", choices=["create", "materialize"])
    ve.add_argument("--file", help="virtual entity YAML (create)")
    ve.add_argument("--names", nargs="*", default=None)
    ve.set_defaults(fn=cmd_virtual_entity)

    ns = sub.add_parser("notification-store")
    ns.add_argument("action", choices=["create", "delete", "list"])
    ns.add_argument("name", nargs="?")
    ns.add_argument("--file", help="notification store YAML (create)")
    ns.set_defaults(fn=cmd_notification_store)

    pt = sub.add_parser("partition")
    pt.add_argument(
        "action", choices=["create", "create-for-timestamp", "remove-old"]
    )
    pt.add_argument("timestamp", nargs="?",
                    help="target timestamp (create-for-timestamp)")
    pt.add_argument("--ahead-interval", default="3d")
    pt.add_argument("--now", default=None, help="pinned now (ISO)")
    pt.set_defaults(fn=cmd_partition)

    tsg = sub.add_parser("trend-store")
    tsg.add_argument(
        "action",
        choices=[
            "create", "add-parts", "add-trends", "remove-trends",
            "change", "delete", "show", "list", "list-config",
            "check-config", "process-modified-log",
        ],
    )
    tsg.add_argument("definition", nargs="?",
                     help="trend store definition YAML")
    tsg.add_argument("--data-source")
    tsg.add_argument("--entity-type")
    tsg.add_argument("--granularity")
    tsg.add_argument(
        "--force", action="store_true",
        help="change: apply data-type narrowing too",
    )
    tsg.set_defaults(fn=cmd_trend_store)

    tm = sub.add_parser("trend-materialization")
    tm.add_argument(
        "action",
        choices=["create", "update", "drop", "list", "enable", "disable"],
    )
    tm.add_argument("name", nargs="?")
    tm.add_argument("--file", help="materialization YAML (create/update)")
    tm.set_defaults(fn=cmd_trend_materialization)

    cu = sub.add_parser("curate")
    cu.add_argument("--documents", required=True,
                    help="input documents parquet (doc_id, text, <source>)")
    cu.add_argument("--benchmark", default=None,
                    help="held-out eval parquet for decontamination")
    cu.add_argument("--output", required=True,
                    help="output parquet for the shard assignment")
    cu.add_argument("--alpha", type=float, default=0.5)
    cu.add_argument("--shard-tokens", type=int, default=100_000)
    cu.add_argument("--seed", type=int, default=0)
    cu.add_argument("--source-col", default="source")
    cu.add_argument("--boilerplate-max-docs", type=int, default=None,
                    help="strip segments repeated across >= N docs "
                         "before dedup (off when unset)")
    cu.add_argument("--cap-per-source", type=int, default=None,
                    help="keep at most N docs per source after "
                         "cleaning, best quality first (off when unset)")
    cu.set_defaults(fn=cmd_curate)

    co = sub.add_parser("corpus")
    co.add_argument(
        "action",
        choices=[
            "split", "cap", "tfidf", "kmeans", "bpe", "pack-ids",
            "increment", "increment-emb", "decontaminate",
            "ivf-build", "ivf-increment", "ivf-query",
            "ivf-build-q", "ivf-increment-q", "ivf-query-pq",
            "pq-build", "pq-increment", "pq-query", "substring-dedup",
            "substring-increment",
            "c4-rules", "unigram", "sketch", "weighted-sample",
            "bitext", "pack-semantic", "ppl-buckets", "script-profile",
            "chat-curate", "preference-pairs", "code-profile",
            "code-dedup", "fim", "budget-select", "secrets",
        ],
    )
    co.add_argument("--input", required=True, help="input parquet")
    co.add_argument("--output", required=True, help="output parquet")
    co.add_argument("--fractions", default="train=0.9,val=0.05,test=0.05",
                    help="split fractions, name=frac comma list")
    co.add_argument("--seed", type=int, default=0)
    co.add_argument("--keys", default="source",
                    help="cap: comma-separated key columns")
    co.add_argument("--order-col", default="n_chars",
                    help="cap: keep the top-n by this column DESC")
    co.add_argument("--n", type=int, default=5,
                    help="cap/tfidf: per-key/per-doc N; kmeans: k; "
                         "bpe: merge count")
    co.add_argument("--iters", type=int, default=2,
                    help="kmeans: Lloyd's rounds")
    co.add_argument("--seq-len", type=int, default=2048,
                    help="pack-ids: tokens per packed sequence")
    co.add_argument("--state", default=None,
                    help="increment: path of the persisted dedup "
                         "signature state (created on first delivery)")
    co.add_argument("--pq-m", type=int, default=4, dest="pq_m",
                    help="pq-build: subspace count (dim must divide)")
    co.add_argument("--pq-k", type=int, default=8, dest="pq_k",
                    help="pq-build: codewords per subspace (2..128 — "
                         "codes persist as signed tinyint)")
    co.add_argument("--max-piece-len", type=int, default=5,
                    dest="max_piece_len",
                    help="unigram: longest candidate piece (module "
                         "default 5 — NOT --window, whose 50 default "
                         "is substring-dedup semantics)")
    co.add_argument("--vocab-size", type=int, default=512,
                    dest="vocab_size",
                    help="unigram: target vocabulary size")
    co.add_argument("--byte-fallback", action="store_true",
                    dest="byte_fallback",
                    help="unigram/bpe: encode OOV as <0xNN> byte "
                         "pieces/tokens with </w> word markers "
                         "(decodable stream — the SentencePiece "
                         "byte_fallback contract; for bpe, emits "
                         "token-id arrays through the persisted "
                         "vocab instead of the merge table)")
    co.add_argument("--ref-filter", default=None, dest="ref_filter",
                    help="ppl-buckets: SQL predicate selecting the LM "
                         "reference slice (default lang = 'en')")
    co.add_argument("--benchmark", default=None,
                    help="decontaminate: held-out eval parquet whose "
                         "4-gram shingle matches are dropped")
    co.add_argument("--binary", action="store_true",
                    help="pack-ids: write loader-ready .bin/.idx "
                         "shards + manifest instead of parquet")
    co.add_argument("--min-turns", type=int, default=2,
                    dest="min_turns",
                    help="chat-curate: minimum non-system turns")
    co.add_argument("--max-turns", type=int, default=64,
                    dest="max_turns",
                    help="chat-curate: maximum non-system turns")
    co.add_argument("--min-margin", type=float, default=0.0,
                    dest="min_margin",
                    help="preference-pairs: minimum strict "
                         "chosen-rejected score margin")
    co.add_argument("--ann", action="store_true",
                    help="bitext: corpus×corpus mode — probe-pruned "
                         "IVF candidates instead of broadcasting the "
                         "target side")
    co.add_argument("--n-probe", type=int, default=2, dest="n_probe",
                    help="bitext --ann: probed centroids per source")
    co.add_argument("--ann-clusters", type=int, default=16,
                    dest="ann_clusters",
                    help="bitext --ann: IVF centroid count for the "
                         "target side (√N at scale)")
    co.add_argument("--text-col", default="content", dest="text_col",
                    help="code-profile: source-text column")
    co.add_argument("--window", type=int, default=50,
                    help="substring-dedup: duplicated-span token "
                         "window w (50 per Lee et al.)")
    co.add_argument("--path-col", default="path", dest="path_col",
                    help="code-profile: file-path column for the "
                         "extension language map ('' = no path)")
    co.add_argument("--id-col", default="file_id", dest="id_col",
                    help="code-dedup/fim/budget-select: id column "
                         "(canonical pick / seeded draws / tiebreak)")
    co.add_argument("--rate", type=float, default=0.5,
                    help="fim: fraction of docs to transform")
    co.add_argument("--spm", action="store_true",
                    help="fim: render suffix-before-prefix order")
    co.add_argument("--budget", default="1000000",
                    help="budget-select: tokens per source — one int, "
                         "or per-source 'name=tokens' comma list "
                         "(absent sources drop)")
    co.add_argument("--priority-col", default="", dest="priority_col",
                    help="budget-select: rank column (default: the "
                         "deterministic md5 doc draw)")
    co.add_argument("--token-col", default="n_tokens", dest="token_col",
                    help="budget-select: per-doc token-count column")
    co.add_argument("--bloom-bits", type=int, default=0,
                    dest="bloom_bits",
                    help="decontaminate: route through the Bloom "
                         "prefilter with this bitmap size in bits "
                         "(0 = exact broadcast path)")
    co.set_defaults(fn=cmd_corpus)

    md = sub.add_parser("media")
    md.add_argument(
        "action",
        choices=["wav-features", "wav-spectral", "png-features",
                 "jpeg-features", "gif-features", "image-features",
                 "tiff-features",
                 "png-resize", "image-resize", "frames", "avi-features",
                 "avi-frames", "features", "pdf-text", "docx-text",
                 "epub-text", "office-text", "odf-text", "xlsb-text",
                 "office-decrypt",
                 "office-meta",
                 "eml-text", "eml-attachments", "mbox-split",
                 "rtf-text", "xlsx-text", "pptx-text", "doc-text",
                 "xls-text", "ppt-text", "msg-text", "mail-text",
                 "exif-scan", "exif-strip",
                 "image-dhash",
                 "image-dedup", "audio-fingerprint", "audio-dedup",
                 "video-dhash", "video-dedup", "image-increment",
                 "audio-increment", "video-increment",
                 "wds-export", "wds-import"],
    )
    md.add_argument("--exts", default=None,
                    help="wds-export: column=extension comma list "
                         "(one member per column per sample)")
    md.add_argument("--wds-dir", default=None, dest="wds_dir",
                    help="wds-export: shard output directory "
                         "(default <output>_shards)")
    md.add_argument("--n-shards", type=int, default=8, dest="n_shards",
                    help="wds-export: tar shard count (md5-draw "
                         "assignment; size shards 100MB-1GB)")
    md.add_argument("--password", default=None, action="append",
                    help="office-decrypt: candidate password; repeat "
                         "the flag for a wordlist tried in order "
                         "(default: the VelvetSweatshop convention)")
    md.add_argument("--id-col", default="media_id", dest="id_col",
                    help="wds-export: sample key column")
    md.add_argument("--input", required=True, help="input parquet")
    md.add_argument("--output", required=True, help="output parquet")
    md.add_argument("--decoder", default=None,
                    help="features: inject a decoder as 'pkg.mod:fn' "
                         "(e.g. a PIL/ffmpeg wrapper on a real "
                         "cluster); default is the deterministic "
                         "byte-histogram fake")
    md.add_argument("--width", type=int, default=64,
                    help="png-resize: output width")
    md.add_argument("--height", type=int, default=64,
                    help="png-resize: output height")
    md.add_argument("--stride", type=int, default=1024,
                    help="frames: bytes per sampled frame")
    md.add_argument("--frame-stride", type=int, default=1,
                    help="avi-frames: keep every Nth frame (1 = all; "
                         "its own flag — --stride is a BYTE count)")
    md.add_argument("--n", type=int, default=8,
                    help="frames: max frames per payload")
    md.add_argument("--on-error", default="fail",
                    choices=["fail", "skip"], dest="on_error",
                    help="pdf-text/image-dhash/image-dedup: skip "
                         "undecodable payloads instead of failing the "
                         "job (dirty-corpus mode)")
    md.add_argument("--radius", type=int, default=3,
                    help="image/audio/video-dedup, image-increment: "
                         "max hamming distance (<= 3 for guaranteed "
                         "recall with 4 bands)")
    md.add_argument("--state", default=None,
                    help="image/audio/video-increment: path of the "
                         "persisted hash state (created on first "
                         "delivery)")
    md.set_defaults(fn=cmd_media)

    cw = sub.add_parser("crawl")
    cw.add_argument(
        "action",
        choices=["warc-read", "warc-export", "html-extract",
                 "warc-to-text", "url-profile", "domain-report",
                 "robots-filter", "robots-sitemaps", "sitemap-urls",
                 "feed-entries", "frontier-ingest", "fetch-schedule",
                 "markup-extract", "wat-links"],
    )
    cw.add_argument("--input", required=True,
                    help="WARC dir/glob, or input parquet")
    cw.add_argument("--output", required=True,
                    help="output parquet (warc-export: ignored if "
                         "--output-dir given)")
    cw.add_argument("--output-dir", default=None,
                    help="warc-export: directory for the WARC files")
    cw.add_argument("--types", default=None,
                    help="warc-read: comma-separated WARC-Type filter "
                         "(e.g. response,warcinfo)")
    cw.add_argument("--html-col", default="html",
                    help="html-extract: column holding the HTML")
    cw.add_argument("--url-col", default="url",
                    help="url-profile/domain-report: URL column")
    cw.add_argument("--state", default=None,
                    help="frontier-ingest: persisted seen-URL state "
                         "directory (created on first poll)")
    cw.add_argument("--robots", default=None,
                    help="robots-filter: parquet of (host, robots_txt)")
    cw.add_argument("--agent", default="*",
                    help="robots-filter: user-agent to evaluate")
    cw.add_argument("--xml-col", default="xml",
                    help="sitemap-urls: column holding the XML")
    cw.set_defaults(fn=cmd_crawl)

    ar = sub.add_parser("archive")
    ar.add_argument("action", choices=["read", "export"])
    ar.add_argument("--input", required=True,
                    help="read: archive dir/glob (tar/tgz/tar.gz/"
                         "tar.bz2/tar.xz/zip); export: input parquet "
                         "of (archive, member, content) rows")
    ar.add_argument("--output", required=True,
                    help="read: output parquet; export: report "
                         "parquet (archives land in --output-dir)")
    ar.add_argument("--output-dir", default=None,
                    help="export: directory for the archive files")
    ar.add_argument("--members", default=None,
                    help="read: member-name glob filter (e.g. "
                         "'*.txt'), applied inside the task")
    ar.add_argument("--on-error", default="fail",
                    choices=["fail", "skip"], dest="on_error",
                    help="read: skip unreadable archives")
    ar.set_defaults(fn=cmd_archive)

    qs = sub.add_parser("quick-start")
    qs.add_argument("instance_root", nargs="?", default=None)
    qs.add_argument("--instance-name", default="default")
    qs.set_defaults(fn=cmd_quick_start)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
