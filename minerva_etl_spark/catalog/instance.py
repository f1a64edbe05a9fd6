"""Instance model: the YAML-defined catalog of a deployment.

Reference (`/root/reference/src/minerva/instance/__init__.py:217-695`):
an *instance* directory declares trend stores, attribute stores,
notification stores, relations, materializations and triggers as YAML;
``minerva initialize`` compiles them into database objects in a fixed
order (`commands/initialize.py:111-155`).

Here the same YAML surface loads into dataclasses and compiles into
engine objects (TrendStore/AttributeStore/NotificationStore +
registered materializations).  YAML parsing is stdlib-free-optional:
files are loaded with pyyaml when available, else from pre-parsed
dicts (the tests feed dicts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from minerva_etl_spark.catalog import datatypes as dt
from minerva_etl_spark.catalog.granularity import Granularity

try:  # pyyaml is present in most Spark images, but stay import-safe
    import yaml

    def _load_yaml(path: Path) -> dict:
        with open(path) as f:
            return yaml.safe_load(f)

except ImportError:  # pragma: no cover
    yaml = None

    def _load_yaml(path: Path) -> dict:
        raise NotImplementedError("pyyaml unavailable; pass dicts directly")


@dataclass
class TrendDef:
    """One metric column (`instance/__init__.py:43-69`; defaults SUM/SUM)."""

    name: str
    data_type: str = "numeric"
    time_aggregation: str = "sum"
    entity_aggregation: str = "sum"
    extra_data: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "TrendDef":
        return cls(
            name=d["name"],
            data_type=d.get("data_type", "numeric"),
            time_aggregation=d.get("time_aggregation", "sum"),
            entity_aggregation=d.get("entity_aggregation", "sum"),
            extra_data=d.get("extra_data", {}),
        )

    @property
    def spark_type(self):
        return dt.REGISTRY[self.data_type.lower()].spark_type


@dataclass
class GeneratedTrendDef:
    """Computed column from a SQL expression (`instance/__init__.py:102-140`)."""

    name: str
    data_type: str
    expression: str

    @classmethod
    def from_dict(cls, d: dict) -> "GeneratedTrendDef":
        return cls(d["name"], d.get("data_type", "numeric"), d["expression"])


@dataclass
class TrendStorePartDef:
    name: str
    trends: list[TrendDef]
    generated_trends: list[GeneratedTrendDef] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "TrendStorePartDef":
        return cls(
            name=d["name"],
            trends=[TrendDef.from_dict(t) for t in d.get("trends", [])],
            generated_trends=[
                GeneratedTrendDef.from_dict(t)
                for t in d.get("generated_trends", [])
            ],
        )


@dataclass
class TrendStoreDef:
    """(`instance/__init__.py:217-287`)"""

    data_source: str
    entity_type: str
    granularity: str
    partition_size: str | None
    parts: list[TrendStorePartDef]
    retention_period: str | None = None
    title: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "TrendStoreDef":
        return cls(
            data_source=d["data_source"],
            entity_type=d["entity_type"],
            granularity=str(d["granularity"]),
            partition_size=str(d.get("partition_size")) if d.get("partition_size") else None,
            parts=[TrendStorePartDef.from_dict(p) for p in d.get("parts", [])],
            retention_period=d.get("retention_period"),
            title=d.get("title"),
        )


@dataclass
class RelationDef:
    """Entity-graph edge table defined by a query
    (`instance/__init__.py:421-453`)."""

    name: str
    query: str
    source_entity_type: str | None = None
    target_entity_type: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "RelationDef":
        return cls(
            d["name"],
            d["query"],
            d.get("source_entity_type"),
            d.get("target_entity_type"),
        )


@dataclass
class MaterializationDef:
    """(`storage/trend/materialization.py:12-126`)"""

    target_trend_store_part: str
    enabled: bool = True
    processing_delay: str = "30m"
    stability_delay: str = "5m"
    reprocessing_period: str = "3d"
    sources: list[dict] = field(default_factory=list)
    view: str | None = None
    function: dict | None = None
    fingerprint_function: str | None = None
    # None = auto-detect lookback views; True = source views always see
    # the full part (views reading rows outside their target bucket);
    # False = force range pruning even if the view looks lookback-style
    unbounded_sources: bool | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "MaterializationDef":
        return cls(
            target_trend_store_part=d["target_trend_store_part"],
            enabled=d.get("enabled", True),
            processing_delay=d.get("processing_delay", "30m"),
            stability_delay=d.get("stability_delay", "5m"),
            reprocessing_period=d.get("reprocessing_period", "3d"),
            sources=d.get("sources", []),
            view=d.get("view"),
            function=d.get("function"),
            fingerprint_function=d.get("fingerprint_function"),
            unbounded_sources=d.get("unbounded_sources"),
        )


@dataclass
class MinervaInstance:
    """The whole declared deployment (mirrors the instance directory
    layout: trend/, attribute/, notification/, relation/,
    materialization/, trigger/)."""

    trend_stores: list[TrendStoreDef] = field(default_factory=list)
    relations: list[RelationDef] = field(default_factory=list)
    materializations: list[MaterializationDef] = field(default_factory=list)
    attribute_stores: list[dict] = field(default_factory=list)
    notification_stores: list[dict] = field(default_factory=list)
    triggers: list[dict] = field(default_factory=list)
    virtual_entities: list[dict] = field(default_factory=list)
    #: SampledViewMaterialization defs from attribute/materialization/
    #: (reference `commands/initialize.py:343-361`): dicts with
    #: ``attribute_store: {data_source, entity_type}`` and ``query``
    attribute_materializations: list[dict] = field(default_factory=list)
    #: custom init SQL scripts per phase (reference
    #: `commands/initialize.py:201-211,284-303`): phase name →
    #: file contents, path-sorted, from custom/<phase>/**/*.sql
    custom_sql: dict = field(default_factory=dict)

    @classmethod
    def load(cls, root: str | Path) -> "MinervaInstance":
        """Load an instance directory (reference layout)."""
        root = Path(root)
        inst = cls()
        for p in sorted((root / "trend").glob("*.yaml")):
            inst.trend_stores.append(TrendStoreDef.from_dict(_load_yaml(p)))
        for p in sorted((root / "relation").glob("*.yaml")):
            inst.relations.append(RelationDef.from_dict(_load_yaml(p)))
        for p in sorted((root / "materialization").glob("*.yaml")):
            inst.materializations.append(
                MaterializationDef.from_dict(_load_yaml(p))
            )
        for sub, bucket in (
            ("attribute", inst.attribute_stores),
            ("notification", inst.notification_stores),
            ("trigger", inst.triggers),
            ("virtual-entity", inst.virtual_entities),
        ):
            for p in sorted((root / sub).glob("*.yaml")):
                bucket.append(_load_yaml(p))
        for p in sorted(
            (root / "attribute" / "materialization").glob("*.yaml")
        ):
            inst.attribute_materializations.append(_load_yaml(p))
        for phase in ("pre-init", "pre-materialization-init", "post-init"):
            files = sorted((root / "custom" / phase).rglob("*.sql"))
            if files:
                inst.custom_sql[phase] = [p.read_text() for p in files]
        return inst

    def find_trend_store(
        self, data_source: str, entity_type: str, granularity: str
    ) -> TrendStoreDef | None:
        gran = Granularity.parse(granularity)
        for ts in self.trend_stores:
            if (
                ts.data_source == data_source
                and ts.entity_type == entity_type
                and Granularity.parse(ts.granularity) == gran
            ):
                return ts
        return None
