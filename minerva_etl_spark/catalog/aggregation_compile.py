"""Aggregation generation/compilation: raw stores → generated ladder
YAML (the `minerva aggregation generate` + `compile` path, §3.3).

Reference (`/root/reference/src/minerva/instance/
aggregation_generation.py:27-123` + `aggregation_compilation.py`):
for every "raw" trend store, emit per ladder rung a derived trend-store
definition (promoted types, samples column, mapped partition size) and
a materialization definition whose view SQL is the generated
aggregation query.  The reference emits plpgsql; we emit Spark SQL that
`catalog.initialize` registers directly.
"""

from __future__ import annotations

from pathlib import Path

from minerva_etl_spark.catalog.granularity import DEFAULT_PARTITION_SIZE, Granularity
from minerva_etl_spark.catalog.instance import TrendStoreDef
from minerva_etl_spark.operators.aggregation import (
    TrendAggSpec,
    time_aggregate_spark_sql,
)
from minerva_etl_spark.operators.ladder import promoted_trend


def _trend_yaml(t) -> dict:
    return {
        "name": t.name,
        "data_type": t.data_type,
        "time_aggregation": t.time_aggregation,
        "entity_aggregation": t.entity_aggregation,
    }


def generate_time_aggregations(
    store: TrendStoreDef,
) -> list[tuple[dict, dict]]:
    """Per ladder rung × part: (derived trend-store YAML dict,
    materialization YAML dict).  Rung layout, chaining, type promotion
    and samples handling come from
    :func:`minerva_etl_spark.operators.ladder.generate_time_ladder` —
    chained rungs (1d→1w/1month) read the generated 1d part and roll
    ``samples`` up with SUM instead of re-counting raw rows."""
    from minerva_etl_spark.operators.ladder import generate_time_ladder

    out: list[tuple[dict, dict]] = []
    for plan, tstore in generate_time_ladder(store):
        target_part = (
            f"{plan.source_part.rsplit('_', 1)[0]}_{plan.target_granularity}"
        )
        pdef = next(p for p in tstore.parts if p.name == target_part)
        view = time_aggregate_spark_sql(
            f'trend."{plan.source_part}"',
            plan.target_granularity,
            plan.specs,
            samples_mode=plan.samples_mode,
        )
        store_yaml = {
            "data_source": tstore.data_source,
            "entity_type": tstore.entity_type,
            "granularity": tstore.granularity,
            "partition_size": tstore.partition_size,
            "retention_period": tstore.retention_period,
            "parts": [
                {"name": pdef.name,
                 "trends": [_trend_yaml(t) for t in pdef.trends]}
            ],
        }
        # delays per the reference's generated defaults
        # (`aggregation_compilation.py:655-659`)
        mat_yaml = {
            "target_trend_store_part": target_part,
            "enabled": True,
            "processing_delay": "30m",
            "stability_delay": "5m",
            "reprocessing_period": "3d",
            "sources": [{"trend_store_part": plan.source_part}],
            "view": view,
            # generated views read only their target bucket: keep source
            # range pruning on even though month-rung bucket expressions
            # contain `interval` (the lookback auto-detect trigger)
            "unbounded_sources": False,
        }
        out.append((store_yaml, mat_yaml))
    return out


def generate_entity_aggregation(
    store: TrendStoreDef,
    relation: str,
    target_entity_type: str,
) -> list[tuple[dict, dict]]:
    """Entity aggregation across a relation at the store's own
    granularity (`aggregation_generation.py:125-220`,
    `aggregation_compilation.py:332-365`): per part, a view
    ``SELECT r.target_id AS entity_id, timestamp, sum(samples)?,
    <entity_agg(c)...> FROM part t JOIN relation r ON t.entity_id =
    r.source_id GROUP BY timestamp, r.target_id``."""
    from minerva_etl_spark.operators.aggregation import _spark_agg_sql

    out: list[tuple[dict, dict]] = []
    gran = Granularity.parse(store.granularity).name
    rel_slug = relation.replace("->", "__").replace("-", "_")
    for part in store.parts:
        has_samples = any(t.name == "samples" for t in part.trends)
        samples_sql = (
            "CAST(SUM(samples) AS BIGINT) AS samples"
            if has_samples
            else "CAST(count(*) AS BIGINT) AS samples"
        )
        aggs = ",\n       ".join(
            [samples_sql]
            + [
                _spark_agg_sql(
                    t.entity_aggregation, t.name, t.name,
                    promoted_trend(t, which="entity").data_type,
                )
                for t in part.trends
                if t.name != "samples"
            ]
        )
        target_part = f"{rel_slug}_{part.name}"
        view = (
            f"SELECT r.target_id AS entity_id, t.timestamp,\n"
            f"       {aggs}\n"
            f'FROM trend."{part.name}" t\n'
            f'JOIN relation."{rel_slug}" r ON t.entity_id = r.source_id\n'
            f"GROUP BY t.timestamp, r.target_id"
        )
        store_yaml = {
            "data_source": store.data_source,
            "entity_type": target_entity_type,
            "granularity": gran,
            "partition_size": store.partition_size,
            "parts": [
                {
                    "name": target_part,
                    "trends": (
                        [{
                            "name": "samples", "data_type": "bigint",
                            "time_aggregation": "sum",
                            "entity_aggregation": "sum",
                        }]
                        + [
                            {
                                "name": t.name,
                                "data_type": promoted_trend(
                                    t, which="entity"
                                ).data_type,
                                "time_aggregation": t.time_aggregation,
                                "entity_aggregation": t.entity_aggregation,
                            }
                            for t in part.trends
                            if t.name != "samples"
                        ]
                    ),
                }
            ],
        }
        mat_yaml = {
            "target_trend_store_part": target_part,
            "enabled": True,
            "processing_delay": "30m",
            "stability_delay": "5m",
            "reprocessing_period": "3d",
            "sources": [
                {"trend_store_part": part.name},
                {"relation": relation},
            ],
            "view": view,
            "unbounded_sources": False,
        }
        out.append((store_yaml, mat_yaml))
    return out


# --------------------------------------------------- definition compiler
def _load_store_by_name(root: Path, source: str) -> TrendStoreDef:
    """Resolve an aggregation definition's ``source`` to a trend-store
    YAML in the instance (the reference resolves by file basename:
    `instance/__init__.py` ``load_trend_store_by_name``)."""
    import yaml

    name = Path(source).stem
    path = root / "trend" / f"{name}.yaml"
    if not path.exists():
        raise FileNotFoundError(
            f"aggregation source trend store not found: {path}"
        )
    return TrendStoreDef.from_dict(yaml.safe_load(path.read_text()))


def _agg_sort_key(definition: dict) -> tuple:
    """compile-all compiles time aggregations lowest granularity first
    (reference `commands/aggregation.py:106` sorts by granularity), so a
    1d rung that reads the 1h rung sees its source store file already
    written."""
    d = definition.get("time_aggregation")
    if not d:
        return (1, 0)  # entity aggregations after all time aggregations
    g = Granularity.parse(str(d["granularity"]))
    return (0, g.seconds + g.months * 2635200)


def compile_aggregation_definition(
    instance_dir: str | Path, definition: dict
) -> list[str]:
    """Compile ONE aggregation definition (the reference's
    ``minerva aggregation compile``, `commands/aggregation.py:49-65` +
    `instance/aggregation_compilation.py:562-660`): a dict holding either
    ``time_aggregation`` or ``entity_aggregation`` is expanded into a
    derived trend-store YAML (promoted types + samples column) and one
    materialization YAML per part, written into the instance directory.
    Returns written paths.

    Definition shape (mirrors the reference)::

        time_aggregation:
          name: node_main_1d          # aggregate trend-store file name
          source: node_main_1h        # source trend-store file basename
          granularity: 1d
          parts:
            - name: node_kpi_1d       # target part / materialization
              source: node_kpi_1h     # part of the source store

        entity_aggregation:
          name: nation_node_main_1h
          source: node_main_1h
          relation: node->nation
          entity_type: nation
          parts: [{name: ..., source: ...}]

    ``mapping_function`` is accepted and ignored — Spark buckets
    timestamps natively (`granularity.bucket_end_spark_sql`), where the
    reference needs a plpgsql mapping function per rung.
    """
    import yaml

    root = Path(instance_dir)
    (root / "trend").mkdir(parents=True, exist_ok=True)
    (root / "materialization").mkdir(parents=True, exist_ok=True)
    written: list[str] = []

    if "time_aggregation" in definition:
        d = definition["time_aggregation"]
        store = _load_store_by_name(root, d["source"])
        target_gran = Granularity.parse(str(d["granularity"])).name
        out_parts: list[dict] = []
        for agg_part in d["parts"]:
            src = next(
                (p for p in store.parts if p.name == agg_part.get("source")),
                None,
            )
            if src is None:
                raise ValueError(
                    f"no source part {agg_part.get('source')!r} in "
                    f"{d['source']!r} for aggregation part "
                    f"{agg_part.get('name')!r}"
                )
            # a chained source (a generated rung) already carries a
            # samples column: roll it up with SUM instead of re-counting
            chained = any(t.name == "samples" for t in src.trends)
            specs = [
                TrendAggSpec(
                    t.name, t.time_aggregation, t.entity_aggregation,
                    result_type=promoted_trend(t).data_type,
                )
                for t in src.trends
                if t.name != "samples"
            ]
            view = time_aggregate_spark_sql(
                f'trend."{src.name}"', target_gran, specs,
                samples_mode="rollup" if chained else "inject",
            )
            mat_yaml = {
                "target_trend_store_part": agg_part["name"],
                "enabled": True,
                # reference defaults; the authored definition may tune
                "processing_delay": d.get("processing_delay", "30m"),
                "stability_delay": d.get("stability_delay", "5m"),
                "reprocessing_period": d.get("reprocessing_period", "3d"),
                "sources": [{"trend_store_part": src.name}],
                "view": view,
                "unbounded_sources": False,
            }
            mp = root / "materialization" / f"{agg_part['name']}.yaml"
            mp.write_text(yaml.safe_dump(mat_yaml, sort_keys=False))
            written.append(str(mp))
            out_parts.append(
                {
                    "name": agg_part["name"],
                    "trends": (
                        [{
                            "name": "samples", "data_type": "bigint",
                            "time_aggregation": "sum",
                            "entity_aggregation": "sum",
                        }]
                        + [
                            {
                                "name": t.name,
                                "data_type": promoted_trend(t).data_type,
                                "time_aggregation": t.time_aggregation,
                                "entity_aggregation": t.entity_aggregation,
                            }
                            for t in src.trends
                            if t.name != "samples"
                        ]
                    ),
                }
            )
        store_yaml = {
            "data_source": store.data_source,
            "entity_type": store.entity_type,
            "granularity": target_gran,
            "partition_size": DEFAULT_PARTITION_SIZE.get(target_gran, "1d"),
            "retention_period": store.retention_period,
            "parts": out_parts,
        }
        sp = root / "trend" / f"{d['name']}.yaml"
        sp.write_text(yaml.safe_dump(store_yaml, sort_keys=False))
        written.append(str(sp))
        return written

    if "entity_aggregation" in definition:
        from minerva_etl_spark.operators.aggregation import _spark_agg_sql

        d = definition["entity_aggregation"]
        store = _load_store_by_name(root, d["source"])
        relation = d["relation"]
        rel_slug = relation.replace("->", "__").replace("-", "_")
        gran = Granularity.parse(store.granularity).name
        out_parts = []
        for agg_part in d["parts"]:
            src = next(
                (p for p in store.parts if p.name == agg_part.get("source")),
                None,
            )
            if src is None:
                raise ValueError(
                    f"no source part {agg_part.get('source')!r} in "
                    f"{d['source']!r}"
                )
            has_samples = any(t.name == "samples" for t in src.trends)
            samples_sql = (
                "CAST(SUM(samples) AS BIGINT) AS samples"
                if has_samples
                else "CAST(count(*) AS BIGINT) AS samples"
            )
            aggs = ",\n       ".join(
                [samples_sql]
                + [
                    _spark_agg_sql(
                        t.entity_aggregation, t.name, t.name,
                        promoted_trend(t, which="entity").data_type,
                    )
                    for t in src.trends
                    if t.name != "samples"
                ]
            )
            view = (
                f"SELECT r.target_id AS entity_id, t.timestamp,\n"
                f"       {aggs}\n"
                f'FROM trend."{src.name}" t\n'
                f'JOIN relation."{rel_slug}" r ON t.entity_id = r.source_id\n'
                f"GROUP BY t.timestamp, r.target_id"
            )
            mat_yaml = {
                "target_trend_store_part": agg_part["name"],
                "enabled": True,
                "processing_delay": d.get("processing_delay", "30m"),
                "stability_delay": d.get("stability_delay", "5m"),
                "reprocessing_period": d.get("reprocessing_period", "3d"),
                "sources": [
                    {"trend_store_part": src.name},
                    {"relation": relation},
                ],
                "view": view,
                "unbounded_sources": False,
            }
            mp = root / "materialization" / f"{agg_part['name']}.yaml"
            mp.write_text(yaml.safe_dump(mat_yaml, sort_keys=False))
            written.append(str(mp))
            out_parts.append(
                {
                    "name": agg_part["name"],
                    "trends": (
                        [{
                            "name": "samples", "data_type": "bigint",
                            "time_aggregation": "sum",
                            "entity_aggregation": "sum",
                        }]
                        + [
                            {
                                "name": t.name,
                                "data_type": promoted_trend(
                                    t, which="entity"
                                ).data_type,
                                "time_aggregation": t.time_aggregation,
                                "entity_aggregation": t.entity_aggregation,
                            }
                            for t in src.trends
                            if t.name != "samples"
                        ]
                    ),
                }
            )
        store_yaml = {
            "data_source": store.data_source,
            "entity_type": d["entity_type"],
            "granularity": gran,
            "partition_size": store.partition_size,
            "parts": out_parts,
        }
        sp = root / "trend" / f"{d['name']}.yaml"
        sp.write_text(yaml.safe_dump(store_yaml, sort_keys=False))
        written.append(str(sp))
        return written

    raise ValueError(
        "aggregation definition needs a time_aggregation or "
        "entity_aggregation key"
    )


def compile_all_aggregations(instance_dir: str | Path) -> list[str]:
    """``minerva aggregation compile-all``
    (`commands/aggregation.py:84-117`): compile every
    ``aggregation/*.yaml`` of the instance, time aggregations first in
    granularity order, then entity aggregations."""
    import yaml

    root = Path(instance_dir)
    defs = [
        (p, yaml.safe_load(p.read_text()))
        for p in sorted((root / "aggregation").glob("*.yaml"))
    ]
    # skip non-definition files (e.g. aggregation_hints.yaml)
    defs = [
        (p, d)
        for p, d in defs
        if isinstance(d, dict)
        and ("time_aggregation" in d or "entity_aggregation" in d)
    ]
    written: list[str] = []
    for _, d in sorted(defs, key=lambda pd: _agg_sort_key(pd[1])):
        written.extend(compile_aggregation_definition(root, d))
    return written


def write_generated_definitions(
    instance_dir: str | Path,
    store: TrendStoreDef,
    source_file: str,
    relations: list[tuple[str, str, str]] | None = None,
) -> list[str]:
    """Emit aggregation DEFINITION files into ``aggregation/`` for the
    standard ladder (the reference's two-step workflow:
    ``aggregation generate`` writes definitions,
    ``aggregation compile``/``compile-all`` expands them —
    `aggregation_generation.py:27-123`).  ``source_file`` is the raw
    store's YAML basename, which ``compile`` resolves back.
    Compiling these yields byte-identical output to the fused
    :func:`write_generated` path.

    ``relations`` — ``(name, target_entity_type, aggregation_type)``
    tuples — additionally emits one entity-aggregation definition per
    relation PER RUNG, mirroring the reference's
    ``generate_aggregations`` which entity-aggregates each
    time-aggregated target store too (`aggregation_generation.py:
    104-122`).  Rung entity definitions reference the rung store file
    by name; ``compile-all`` orders time aggregations first so the
    file exists by then."""
    import yaml

    from minerva_etl_spark.operators.ladder import generate_time_ladder

    root = Path(instance_dir)
    (root / "aggregation").mkdir(parents=True, exist_ok=True)
    raw_gran = Granularity.parse(store.granularity).name
    defs: dict[str, dict] = {}
    for plan, tstore in generate_time_ladder(store):
        name = (
            f"{tstore.data_source}_{tstore.entity_type}_{tstore.granularity}"
        )
        # chained rungs point at the generated store file compile-all
        # writes for the lower rung (compiled in granularity order)
        source_name = (
            Path(source_file).stem
            if plan.source_granularity == raw_gran
            else (
                f"{store.data_source}_{store.entity_type}_"
                f"{plan.source_granularity}"
            )
        )
        d = defs.setdefault(
            name,
            {
                "time_aggregation": {
                    "name": name,
                    "source": source_name,
                    "granularity": tstore.granularity,
                    # reference rungs need a plpgsql timestamp-mapping
                    # function; recorded for parity, unused on Spark
                    "mapping_function": (
                        f"mapping_{plan.source_granularity}_to_"
                        f"{tstore.granularity}"
                    ),
                    "parts": [],
                }
            },
        )
        d["time_aggregation"]["parts"].append(
            {
                "name": (
                    f"{plan.source_part.rsplit('_', 1)[0]}_"
                    f"{tstore.granularity}"
                ),
                "source": plan.source_part,
            }
        )
    written: list[str] = []
    for name, d in defs.items():
        ap = root / "aggregation" / f"{name}.yaml"
        ap.write_text(yaml.safe_dump(d, sort_keys=False))
        written.append(str(ap))
    for name, d in defs.items() if relations else ():
        ta = d["time_aggregation"]
        for rel_name, target_type, agg_type in relations:
            rel_slug = rel_name.replace("->", "__").replace("-", "_")
            edef = {
                "entity_aggregation": {
                    "name": f"{rel_slug}_{name}",
                    "source": name,
                    "relation": rel_name,
                    "entity_type": target_type,
                    "aggregation_type": agg_type,
                    "parts": [
                        {"name": f"{rel_slug}_{p['name']}",
                         "source": p["name"]}
                        for p in ta["parts"]
                    ],
                }
            }
            ap = root / "aggregation" / f"{rel_slug}_{name}.yaml"
            ap.write_text(yaml.safe_dump(edef, sort_keys=False))
            written.append(str(ap))
    return written


def load_aggregation_hints(instance_dir: str | Path) -> dict[str, str]:
    """``aggregation_hints.yaml`` at the instance root: relation name →
    aggregation flavor (reference ``load_aggregation_hints``;
    `examples/tiny_instance/aggregation/aggregation_hints.yaml`).  On
    Spark both flavors persist to parquet and stay fresh through the
    fingerprint engine, so the hint is recorded in the generated
    definition for parity rather than changing the plan."""
    import yaml

    for sub in ("aggregation_hints.yaml", "aggregation/aggregation_hints.yaml"):
        p = Path(instance_dir) / sub
        if p.exists():
            d = yaml.safe_load(p.read_text()) or {}
            return {str(k): str(v) for k, v in d.items()}
    return {}


def write_generated_entity_definitions(
    instance_dir: str | Path,
    store: TrendStoreDef,
    source_file: str,
    relation: str,
    target_entity_type: str,
    aggregation_type: str = "VIEW",
) -> list[str]:
    """Emit an entity-aggregation DEFINITION file for one relation
    (reference `aggregation_generation.py:125-220`): compiled by
    ``aggregation compile``/``compile-all`` into the same trend-store +
    materialization YAML the fused :func:`generate_entity_aggregation`
    path writes."""
    import yaml

    root = Path(instance_dir)
    (root / "aggregation").mkdir(parents=True, exist_ok=True)
    rel_slug = relation.replace("->", "__").replace("-", "_")
    gran = Granularity.parse(store.granularity).name
    name = f"{rel_slug}_{store.data_source}_{store.entity_type}_{gran}"
    d = {
        "entity_aggregation": {
            "name": name,
            "source": Path(source_file).stem,
            "relation": relation,
            "entity_type": target_entity_type,
            # flavor from aggregation_hints.yaml when present
            "aggregation_type": aggregation_type,
            "parts": [
                {"name": f"{rel_slug}_{p.name}", "source": p.name}
                for p in store.parts
            ],
        }
    }
    ap = root / "aggregation" / f"{name}.yaml"
    ap.write_text(yaml.safe_dump(d, sort_keys=False))
    return [str(ap)]


def write_generated(instance_dir: str | Path, store: TrendStoreDef) -> list[str]:
    """Write generated YAML files into the instance directory (what
    `minerva aggregation generate` does).  Returns written paths."""
    import yaml

    root = Path(instance_dir)
    (root / "trend").mkdir(parents=True, exist_ok=True)
    (root / "materialization").mkdir(parents=True, exist_ok=True)
    written: list[str] = []
    merged_stores: dict[str, dict] = {}  # one store file per rung, all parts
    for store_yaml, mat_yaml in generate_time_aggregations(store):
        gran = store_yaml["granularity"]
        key = f"{store_yaml['data_source']}_{store_yaml['entity_type']}_{gran}"
        if key in merged_stores:
            merged_stores[key]["parts"].extend(store_yaml["parts"])
        else:
            merged_stores[key] = store_yaml
        part = mat_yaml["target_trend_store_part"]
        mp = root / "materialization" / f"{part}.yaml"
        mp.write_text(yaml.safe_dump(mat_yaml, sort_keys=False))
        written.append(str(mp))
    for key, store_yaml in merged_stores.items():
        sp = root / "trend" / f"{key}.yaml"
        sp.write_text(yaml.safe_dump(store_yaml, sort_keys=False))
        written.append(str(sp))
    return written
