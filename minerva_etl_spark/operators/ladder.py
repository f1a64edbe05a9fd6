"""Standard aggregation ladder generator (A4).

Reference (`/root/reference/src/minerva/instance/
aggregation_generation.py:27-123`): for every "raw" trend store,
generate the standard time-aggregation rungs
(15m→1h→1d→1w, 1d→1month) and, per entity relation, an entity
aggregation at each rung.  The reference emits YAML + SQL text; here we
emit executable aggregation *plans* (DataFrame builders bound to the
trend metadata) plus the derived target store definitions with the
reference's type promotion (`aggregation_compilation.py:396-423`).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable  # noqa: F401  (public plan type)

from pyspark.sql import DataFrame

from minerva_etl_spark.catalog import datatypes as dt
from minerva_etl_spark.catalog.granularity import DEFAULT_PARTITION_SIZE, Granularity
from minerva_etl_spark.catalog.instance import TrendDef, TrendStoreDef, TrendStorePartDef
from minerva_etl_spark.operators.aggregation import TrendAggSpec, entity_aggregate, time_aggregate

#: the standard rung layout, CHAINED exactly like the reference
#: (`aggregation_generation.py:27-44`): each rung is (source_gran,
#: target_gran), and the 1w/1month rungs aggregate from the GENERATED
#: 1d rung rather than from the raw store — at 100 TB that is the
#: difference between scanning 1d pre-aggregates (24-96× smaller) and
#: re-scanning the raw table for every coarse rung.
STANDARD_LADDER: dict[str, list[tuple[str, str]]] = {
    "15m": [("15m", "1h"), ("15m", "1d"), ("1d", "1w"), ("1d", "1month")],
    "30m": [("30m", "1h"), ("30m", "1d"), ("1d", "1w"), ("1d", "1month")],
    "1h": [("1h", "1d"), ("1d", "1w"), ("1d", "1month")],
    "1d": [("1d", "1w"), ("1d", "1month")],
    "1month": [("1month", "3month")],
}


@dataclass(frozen=True)
class AggregationPlan:
    """One generated rung: source store/part → target granularity."""

    name: str
    source_part: str
    target_granularity: str
    kind: str  # "time" | "entity"
    specs: list[TrendAggSpec]
    relation: str | None = None  # entity aggregations only
    #: granularity of the rung's SOURCE (raw gran for direct rungs, a
    #: generated rung's gran for chained ones)
    source_granularity: str | None = None
    #: "inject" (count(*), raw source) or "rollup" (sum(samples),
    #: chained source that already carries a samples column)
    samples_mode: str = "inject"

    def apply(
        self, source: DataFrame, relation_df: DataFrame | None = None
    ) -> DataFrame:
        if self.kind == "time":
            return time_aggregate(source, self.target_granularity, self.specs)
        assert relation_df is not None, "entity aggregation needs the relation"
        return entity_aggregate(source, relation_df, self.specs)


def promoted_trend(trend: TrendDef, which: str = "time") -> TrendDef:
    """Target-store column type after one aggregation hop (A5).
    ``which`` selects the time- or entity-aggregation function."""
    src = dt.REGISTRY[trend.data_type.lower()]
    agg = (
        trend.time_aggregation if which == "time" else trend.entity_aggregation
    )
    out = dt.promoted_type(agg, src)
    return replace(trend, data_type=out.name)


def generate_time_ladder(
    store: TrendStoreDef,
) -> list[tuple[AggregationPlan, TrendStoreDef]]:
    """All standard time-aggregation rungs for a raw store, each with
    its derived target store definition (samples column injected or
    rolled up, types promoted per hop, partition size mapped).  Chained
    rungs (e.g. 1d→1w) source the previously generated rung's store —
    the reference's `STANDARD_AGGREGATIONS` shape."""
    raw_gran = Granularity.parse(store.granularity).name
    rungs = STANDARD_LADDER.get(raw_gran, [])
    #: gran -> the store definition rungs at that gran read from
    sources: dict[str, TrendStoreDef] = {raw_gran: store}
    out: list[tuple[AggregationPlan, TrendStoreDef]] = []
    for src_gran, target_gran in rungs:
        src_store = sources.get(src_gran)
        if src_store is None:  # defensive: chain rung without its source
            continue
        parts: list[TrendStorePartDef] = []
        plans: list[AggregationPlan] = []
        for part in src_store.parts:
            chained = any(t.name == "samples" for t in part.trends)
            specs = [
                TrendAggSpec(
                    t.name, t.time_aggregation, t.entity_aggregation,
                    result_type=promoted_trend(t).data_type,
                )
                for t in part.trends
                if t.name != "samples"
            ]
            target_part = f"{part.name.rsplit('_', 1)[0]}_{target_gran}"
            plans.append(
                AggregationPlan(
                    name=f"{store.entity_type}_{target_gran}_{part.name}",
                    source_part=part.name,
                    target_granularity=target_gran,
                    kind="time",
                    specs=specs,
                    source_granularity=src_gran,
                    samples_mode="rollup" if chained else "inject",
                )
            )
            target_trends = [
                TrendDef("samples", "bigint", "sum", "sum")
            ] + [
                promoted_trend(t) for t in part.trends if t.name != "samples"
            ]
            parts.append(TrendStorePartDef(target_part, target_trends))
        target_store = TrendStoreDef(
            data_source=store.data_source,
            entity_type=store.entity_type,
            granularity=target_gran,
            partition_size=DEFAULT_PARTITION_SIZE.get(target_gran, "1d"),
            parts=parts,
            retention_period=store.retention_period,
        )
        sources[target_gran] = target_store
        out.extend((plan, target_store) for plan in plans)
    return out


def generate_entity_aggregations(
    store: TrendStoreDef, relations: list[str]
) -> list[AggregationPlan]:
    """Per relation, an entity-aggregation plan at the store's
    granularity (`aggregation_generation.py:125-220`)."""
    plans: list[AggregationPlan] = []
    for rel in relations:
        for part in store.parts:
            specs = [
                TrendAggSpec(t.name, t.time_aggregation, t.entity_aggregation)
                for t in part.trends
            ]
            plans.append(
                AggregationPlan(
                    name=f"{rel}_{store.granularity}_{part.name}",
                    source_part=part.name,
                    target_granularity=store.granularity,
                    kind="entity",
                    specs=specs,
                    relation=rel,
                )
            )
    return plans
