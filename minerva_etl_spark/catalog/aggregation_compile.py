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
from minerva_etl_spark.operators.ladder import STANDARD_LADDER, promoted_trend


def generate_time_aggregations(
    store: TrendStoreDef,
) -> list[tuple[dict, dict]]:
    """Per ladder rung × part: (derived trend-store YAML dict,
    materialization YAML dict)."""
    out: list[tuple[dict, dict]] = []
    src_gran = Granularity.parse(store.granularity).name
    for target_gran in STANDARD_LADDER.get(src_gran, []):
        for part in store.parts:
            target_part = f"{part.name.rsplit('_', 1)[0]}_{target_gran}"
            specs = [
                TrendAggSpec(
                    t.name, t.time_aggregation, t.entity_aggregation,
                    result_type=promoted_trend(t).data_type,
                )
                for t in part.trends
            ]
            view = time_aggregate_spark_sql(
                f'trend."{part.name}"', target_gran, specs
            )
            store_yaml = {
                "data_source": store.data_source,
                "entity_type": store.entity_type,
                "granularity": target_gran,
                "partition_size": DEFAULT_PARTITION_SIZE.get(target_gran, "1d"),
                "retention_period": store.retention_period,
                "parts": [
                    {
                        "name": target_part,
                        "trends": (
                            [{
                                # bigint: matches the CAST(... AS BIGINT)
                                # the generated view actually writes
                                "name": "samples",
                                "data_type": "bigint",
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
                                for t in part.trends
                            ]
                        ),
                    }
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
                "sources": [{"trend_store_part": part.name}],
                "view": view,
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
        }
        out.append((store_yaml, mat_yaml))
    return out


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
