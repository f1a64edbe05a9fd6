"""CLI: mirror of the reference ``minerva`` command surface
(`/root/reference/src/minerva/commands/minerva_cli.py:42-60`) on the
Spark engine.

Subcommands (reference analog):
  load-data         ← `minerva load-data`
  materialize       ← `minerva trend-store materialize`
  report            ← `minerva report`
  attribute compact / attribute curr ← `minerva attribute-store ...`
  retention         ← `minerva trend-store partition remove-old`
  live-monitor      ← `minerva live-monitor`

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
    from minerva_etl_spark.sources.loader import JobLog, Loader

    spark = _spark()
    store = _build_store(args)
    cfg = CsvParserConfig(
        identifier_column=args.identifier_column,
        timestamp_column=args.timestamp_column,
        entity_type=args.entity_type,
        granularity=args.granularity,
        delimiter=args.delimiter,
    )
    loader = Loader(store=store, job_log=JobLog(args.data_dir))
    for path in args.files:
        job = loader.load_file(spark, args.file_type, path, cfg)
        print(f"loaded {path} as job {job}")


def cmd_report(args) -> None:
    """A6 report aggregates per part."""
    spark = _spark()
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


def cmd_retention(args) -> None:
    spark = _spark()
    store = _build_store(args)
    now = _utcnow()
    for part in store.parts:
        expired = store.expired_partitions(spark, part.name, now)
        print(f"{part.name}: {len(expired)} expired partitions {expired}")


def cmd_aggregation_generate(args) -> None:
    """`minerva aggregation generate`: emit the standard ladder YAML for
    every raw trend store of the instance."""
    import yaml
    from pathlib import Path

    from minerva_etl_spark.catalog.aggregation_compile import (
        generate_entity_aggregation,
        write_generated,
    )
    from minerva_etl_spark.catalog.instance import MinervaInstance

    inst = MinervaInstance.load(args.instance)
    relations = [
        (r.name, getattr(r, "target_entity_type", None)) for r in inst.relations
    ]
    for store in inst.trend_stores:
        if args.raw_only and "raw" not in (store.title or "").lower():
            continue
        for path in write_generated(args.instance, store):
            print(f"generated {path}")
        if args.with_relations:
            root = Path(args.instance)
            for rel_name, target_type in relations:
                pairs = generate_entity_aggregation(
                    store, rel_name, target_type or rel_name.split("->")[-1]
                )
                for store_yaml, mat_yaml in pairs:
                    part = mat_yaml["target_trend_store_part"]
                    sp = root / "trend" / f"{part}_store.yaml"
                    mp = root / "materialization" / f"{part}.yaml"
                    sp.write_text(yaml.safe_dump(store_yaml, sort_keys=False))
                    mp.write_text(yaml.safe_dump(mat_yaml, sort_keys=False))
                    print(f"generated {sp}")
                    print(f"generated {mp}")


def cmd_materialize(args) -> None:
    """`minerva trend-store materialize`: run all stale chunks."""
    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import MinervaInstance

    spark = _spark()
    ctx = initialize(spark, MinervaInstance.load(args.instance), args.data_dir)
    done = ctx.materialize_stale(_utcnow(), max_num=args.max_num)
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
            target.store(spark, df, job_id=0)

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


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="minerva-spark")
    p.add_argument("--instance", default="instance", help="instance YAML dir")
    p.add_argument("--data-dir", default="data", help="table storage root")
    sub = p.add_subparsers(dest="cmd", required=True)

    ld = sub.add_parser("load-data")
    ld.add_argument("--data-source", required=True)
    ld.add_argument("--entity-type", required=True)
    ld.add_argument("--granularity", required=True)
    ld.add_argument("--file-type", default="csv")
    ld.add_argument("--identifier-column", default="entity")
    ld.add_argument("--timestamp-column", default="timestamp")
    ld.add_argument("--delimiter", default=",")
    ld.add_argument("files", nargs="+")
    ld.set_defaults(fn=cmd_load_data)

    rp = sub.add_parser("report")
    rp.add_argument("--data-source", required=True)
    rp.add_argument("--entity-type", required=True)
    rp.add_argument("--granularity", required=True)
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
    ag.set_defaults(fn=cmd_aggregation_generate)

    mt = sub.add_parser("materialize")
    mt.add_argument("--max-num", type=int, default=None)
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

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
