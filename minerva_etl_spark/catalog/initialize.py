"""Instance initialization: compile a YAML instance into engine objects.

Reference (`/root/reference/src/minerva/commands/initialize.py:111-155`):
``minerva initialize`` loads the instance into the database in fixed
order — trend stores, attribute/notification stores, virtual entities,
relations, materializations, triggers — and materializes relations.

Here the same pass builds `TrendStore` / `AttributeStore` /
`NotificationStore` objects over a data directory, registers every
materialization (view SQL goes through the PG→Spark translator) with
one shared `MaterializationEngine`, and builds `Trigger` objects.  The
result is an `EngineContext` a caller can load into / materialize /
query — the Spark equivalent of an initialized Minerva database.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.catalog.datatypes import spark_ddl
from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.catalog.instance import MinervaInstance, TrendStoreDef
from minerva_etl_spark.materialize.fingerprint import (
    Materialization,
    MaterializationEngine,
)
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.store.attribute_store import AttributeStore
from minerva_etl_spark.store.notification import NotificationStore
from minerva_etl_spark.store.relation import RelationStore
from minerva_etl_spark.store.trendstore import TrendStore, TrendStorePart
from minerva_etl_spark.trigger.trigger import Trigger


def _parse_delay(spec: str) -> "timedelta | Granularity":
    """Delay specs with month units stay calendar-aware (the reference
    passes intervals through to PostgreSQL; a 30-day approximation
    drifts the deadline by up to 2 days per month hop) — the engine
    applies them via ``Granularity.before``."""
    g = Granularity.parse(spec)
    if g.months:
        return g
    return timedelta(seconds=g.seconds)


def _looks_lookback(view_sql: str) -> bool:
    """Heuristic: does this view read source rows OUTSIDE its target
    bucket?  Generated aggregation views are plain GROUP BYs over the
    bucket; window functions (lag/lead/rolling frames) and interval
    arithmetic reach backward, so range-pruning their sources would
    silently truncate their input.  The reference filters the view's
    OUTPUT per timestamp while its views see full source tables
    (`aggregation_compilation.py:726-745` bounds only generated
    functions), so unpruned is the parity-safe default for such views;
    `unbounded_sources: false` forces pruning back on."""
    import re

    return bool(re.search(r"\bover\s*\(|\binterval\b", view_sql, re.I))


@dataclass
class EngineContext:
    spark: SparkSession
    data_dir: str
    trend_stores: dict[str, TrendStore] = field(default_factory=dict)
    parts_index: dict[str, TrendStore] = field(default_factory=dict)
    attribute_stores: dict[str, AttributeStore] = field(default_factory=dict)
    notification_stores: dict[str, NotificationStore] = field(default_factory=dict)
    relations: RelationStore | None = None
    engine: MaterializationEngine | None = None
    triggers: dict[str, Trigger] = field(default_factory=dict)
    _relation_defs: list = field(default_factory=list)
    _virtual_entity_defs: list = field(default_factory=list)
    _attribute_materialization_defs: list = field(default_factory=list)
    _custom_sql: dict = field(default_factory=dict)
    #: part name → Spark DDL of the DECLARED schema, for empty-view
    #: fallbacks before any data lands (PG tables exist-with-schema
    #: from CREATE; parquet dirs only exist after the first write)
    part_schemas: dict[str, str] = field(default_factory=dict)

    def store_key(self, d: TrendStoreDef) -> str:
        return f"{d.data_source}_{d.entity_type}_{Granularity.parse(d.granularity).name}"

    # ------------------------------------------------------------ helpers
    def read_part(self, part_name: str) -> DataFrame | None:
        store = self.parts_index[part_name]
        return store.read_part(self.spark, part_name)

    def register_part_view(
        self,
        part_name: str,
        time_range: tuple | None = None,
        empty_fallback: bool = False,
    ) -> None:
        """Register ``trend."part"`` as a temp view; ``time_range``
        ``(lo_exclusive, hi_inclusive)`` restricts it with a PLAIN
        timestamp predicate — unlike the bucket-expression IN-filter the
        materialization applies on its target, a plain range reaches the
        parquet scan (PushedFilters + row-group stats + partition
        pruning), so a pass over k stale buckets scans ~k buckets of
        source instead of the whole part."""
        df = self.read_part(part_name)
        if df is None and empty_fallback:
            schema = self.part_schemas.get(part_name)
            if schema is not None:
                df = self.spark.createDataFrame([], schema)
        if df is not None:
            if time_range is not None:
                lo, hi = time_range
                df = df.filter(
                    (F.col("timestamp") > F.lit(lo))
                    & (F.col("timestamp") <= F.lit(hi))
                )
            df.createOrReplaceTempView(part_name.replace("-", "_"))

    def register_relation_view(self, relation_name: str) -> None:
        if self.relations is None:
            return
        df = self.relations.read(self.spark, relation_name)
        if df is not None:
            slug = relation_name.replace("->", "__").replace("-", "_")
            df.createOrReplaceTempView(slug)

    def register_entity_view(self, entity_type: str) -> None:
        """Register the entity dimension table as ``entity_<type>``
        (slugged), for relation/virtual-entity defining queries."""
        import os

        from minerva_etl_spark.fsutil import parquet_exists as path_exists

        path = os.path.join(self.data_dir, "entity", entity_type)
        if not path_exists(self.spark, path):
            return
        df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(f"entity_{entity_type}".replace("-", "_"))

    def trigger_factory(self, t: dict) -> Trigger:
        """Compile one trigger definition dict (instance YAML shape) to
        an executable Trigger — also the factory for the file-backed
        admin registry (:meth:`trigger_set`)."""
        kpi_sql = translate(t.get("kpi_query", "")) if t.get("kpi_query") else None
        # declared KPI granularity bounds the source scan per evaluation
        # (the reference's kpi_function is `WHERE t.timestamp = $1`
        # time-bounded, tiny_instance trigger yaml); without it the
        # output-timestamp filter only prunes 1:1 (non-aggregating) KPIs
        gran = (
            Granularity.parse(str(t["granularity"]))
            if t.get("granularity")
            else None
        )

        def make_kpi(
            kpi_sql=kpi_sql, sources=t.get("kpi_sources", []), gran=gran
        ):
            def kpi(spark_, timestamps):
                rng = (
                    (gran.decr(min(timestamps)), max(timestamps))
                    if gran is not None and timestamps
                    else None
                )
                for src in sources:
                    self.register_part_view(src, time_range=rng)
                return spark_.sql(kpi_sql)

            return kpi

        thresholds = {
            th["name"]: float(th["value"]) for th in t.get("thresholds", [])
        }
        return Trigger(
            name=t["name"],
            kpi=make_kpi(),
            thresholds=thresholds,
            condition=translate(t.get("condition", "true")),
            weight=str(t.get("weight", "1")),
            notification_message=translate(t.get("notification", "''")),
            notification_data=(
                translate(t["data"]) if t.get("data") else None
            ),
            enabled=bool(t.get("enabled", True)),
            tags=list(t.get("tags", [])),
        )

    def trigger_set(self):
        """File-backed trigger admin registry over this context's data
        dir (`trigger/lifecycle.py` — the `minerva trigger ...` surface)."""
        from minerva_etl_spark.trigger.lifecycle import TriggerSet

        return TriggerSet(self.data_dir, self.trigger_factory)

    def materialize_virtual_entities(
        self, defs: list[dict] | None = None
    ) -> list[str]:
        """Virtual entities (`commands/virtual_entity.py:30-57`): each is
        a name-producing query; new names anti-insert into the entity
        dimension (``ON CONFLICT DO NOTHING`` ≡ left-anti append)."""
        import os
        import re

        from minerva_etl_spark.catalog.directory import register_entities

        done: list[str] = []
        for d in (defs if defs is not None else self._virtual_entity_defs):
            name, query = d["name"], d["query"]
            for etype in re.findall(r'entity\."?([A-Za-z0-9_><-]+)"?', query):
                self.register_entity_view(etype)

            def resolver(schema: str, nm: str) -> str:
                slug = nm.replace("->", "__").replace("-", "_")
                return f"entity_{slug}" if schema == "entity" else slug

            names = self.spark.sql(translate(query, table_resolver=resolver))
            register_entities(
                self.spark,
                os.path.join(self.data_dir, "entity", name),
                names,
                name,
            )
            done.append(name)
        return done

    def run_custom_sql(
        self, phase: str, scripts: list[str] | None = None
    ) -> int:
        """Custom init SQL hooks (reference `commands/initialize.py`
        runs ``custom/{pre-init,pre-materialization-init,post-init}/
        **/*.sql`` at three fixed points, `:201-211,284-303`): each
        statement is translated and executed against the engine's
        registered views.  ``CREATE [OR REPLACE] VIEW`` becomes a Spark
        temp view (the session-lifetime equivalent of the reference's
        database views); referenced ``trend.""/entity.""`` tables are
        view-registered first.  Returns the statement count executed.

        Divergence from the reference, by substrate: a PostgreSQL view
        is live; a Spark temp view snapshots the source file listing at
        creation.  After loading data, re-invoke the phase (e.g.
        ``ctx.run_custom_sql("post-init")``) to refresh custom views —
        statements are idempotent (``CREATE OR REPLACE``)."""
        import re

        def resolver(schema: str, name: str) -> str:
            slug = name.replace("->", "__").replace("-", "_")
            return f"entity_{slug}" if schema == "entity" else slug

        n = 0
        for text in (
            scripts if scripts is not None
            else self._custom_sql.get(phase, [])
        ):
            text = re.sub(r"--[^\n]*", "", text)  # line comments
            for stmt in text.split(";"):
                stmt = stmt.strip()
                if not stmt:
                    continue
                for part in re.findall(
                    r'trend\."?([A-Za-z0-9_-]+)"?', stmt
                ):
                    if part in self.parts_index:
                        # declared-schema empty view before data lands:
                        # pre-init scripts legitimately reference parts
                        # that exist (as CREATEd tables) but hold no rows
                        self.register_part_view(part, empty_fallback=True)
                for etype in re.findall(
                    r'entity\."?([A-Za-z0-9_><-]+)"?', stmt
                ):
                    self.register_entity_view(etype)
                sql = translate(stmt, table_resolver=resolver)
                sql = re.sub(
                    r"(?is)^\s*create\s+(or\s+replace\s+)?view\b",
                    "CREATE OR REPLACE TEMPORARY VIEW",
                    sql,
                )
                self.spark.sql(sql)
                n += 1
        return n

    def materialize_attributes(
        self, defs: list[dict] | None = None, materialize_curr: bool = False
    ) -> list[str]:
        """Attribute materializations (``SampledViewMaterialization``,
        reference `commands/attribute_store.py:352-391`, loaded by
        `commands/initialize.py:343-361`): each definition registers a
        view query over trend/entity tables whose output is SAMPLED
        into the target attribute store — running one is the
        ``attribute_directory.materialize(svm)`` call
        (`commands/attribute_store.py:490-520`): insert the view's rows
        into staging and transfer to history, here ``store_batch``.
        The view must produce ``entity_id``, ``timestamp`` and the
        attribute columns; ``materialize_curr`` mirrors the CLI's
        ``--materialize-curr`` flag."""
        import re

        def resolver(schema: str, name: str) -> str:
            slug = name.replace("->", "__").replace("-", "_")
            return f"entity_{slug}" if schema == "entity" else slug

        done: list[str] = []
        for d in (
            defs
            if defs is not None
            else self._attribute_materialization_defs
        ):
            spec = d["attribute_store"]
            key = f"{spec['data_source']}_{spec['entity_type']}"
            store = self.attribute_stores.get(key)
            if store is None:
                raise KeyError(
                    f"attribute materialization target store unknown: {key}"
                )
            query = d["query"]
            for part in re.findall(r'trend\."?([A-Za-z0-9_-]+)"?', query):
                if part in self.parts_index:
                    self.register_part_view(part)
            for etype in re.findall(
                r'entity\."?([A-Za-z0-9_><-]+)"?', query
            ):
                self.register_entity_view(etype)
            df = self.spark.sql(translate(query, table_resolver=resolver))
            store.store_batch(self.spark, df)
            if materialize_curr:
                store.materialize_curr(self.spark)
            done.append(key)
        return done

    def materialize_relations(
        self, relation_defs: list | None = None
    ) -> list[str]:
        """§3.3 final initialize step: rebuild every relation from its
        defining query (TRUNCATE+INSERT ≡ overwrite,
        `commands/relation.py:63-129`).  Queries may reference
        ``entity."<type>"`` views (registered from the data dir) and
        other relations."""
        import re

        def resolver(schema: str, name: str) -> str:
            slug = name.replace("->", "__").replace("-", "_")
            return f"entity_{slug}" if schema == "entity" else slug

        done: list[str] = []
        for rel in (relation_defs if relation_defs is not None
                    else self._relation_defs):
            for etype in re.findall(r'entity\."?([A-Za-z0-9_><-]+)"?', rel.query):
                self.register_entity_view(etype)
            df = self.spark.sql(translate(rel.query, table_resolver=resolver))
            self.relations.materialize(self.spark, rel.name, df)
            done.append(rel.name)
        return done

    def modified_log(self) -> DataFrame | None:
        # all stores share one modified log under data_dir
        store = next(iter(self.trend_stores.values()), None)
        return store.read_modified_log(self.spark) if store else None

    def materialize_stale(self, now: datetime, max_num: int | None = None) -> list:
        log = self.modified_log()
        if log is None or self.engine is None:
            return []

        def sink(name: str, df: DataFrame, timestamps: list) -> None:
            target = self.parts_index.get(name)
            if target is None:
                raise KeyError(f"materialization target part unknown: {name}")
            target.store(self.spark, df, job_id=0)

        return self.engine.run(log, now, sink, max_num=max_num)


def initialize(
    spark: SparkSession, instance: MinervaInstance, data_dir: str
) -> EngineContext:
    """The fixed-order initialize pass (reference
    `initialize.py:111-155`), minus DDL — objects instead of tables."""
    ctx = EngineContext(spark=spark, data_dir=data_dir)
    ctx._custom_sql = dict(instance.custom_sql)

    # 0. custom pre-init SQL (reference `initialize.py:112-113`)
    ctx.run_custom_sql("pre-init")

    # 1. trend stores
    for d in instance.trend_stores:
        store = TrendStore(
            data_source=d.data_source,
            entity_type=d.entity_type,
            granularity=d.granularity,
            parts=[
                TrendStorePart(p.name, [t.name for t in p.trends])
                for p in d.parts
            ],
            base_path=data_dir,
            partition_size=d.partition_size,
            retention_period=d.retention_period,
        )
        ctx.trend_stores[ctx.store_key(d)] = store
        for p in d.parts:
            ctx.parts_index[p.name] = store
            ctx.part_schemas[p.name] = ", ".join(
                ["entity_id bigint", "timestamp timestamp_ntz",
                 "created timestamp_ntz", "job_id bigint"]
                + [
                    f"`{t.name}` {spark_ddl(t.data_type)}"
                    for t in p.trends
                ]
            )

    # 2. attribute stores
    for a in instance.attribute_stores:
        st = AttributeStore(
            a["data_source"], a["entity_type"],
            [attr["name"] for attr in a.get("attributes", [])],
            data_dir,
        )
        ctx.attribute_stores[f"{st.data_source}_{st.entity_type}"] = st

    # 3. notification stores
    for n in instance.notification_stores:
        st = NotificationStore(
            n["data_source"],
            # dicts carry the declared data_type (incl. json payloads)
            n.get("attributes", []),
            data_dir,
        )
        ctx.notification_stores[st.data_source] = st

    # 4. relations (materialized on demand via ctx.materialize_relations,
    #    mirroring initialize's "materialize ... relations" final step)
    ctx.relations = RelationStore(data_dir)
    ctx._relation_defs = list(instance.relations)
    ctx._virtual_entity_defs = list(instance.virtual_entities)

    # 4b. custom pre-materialization-init SQL (reference
    #     `initialize.py:130-131`)
    ctx.run_custom_sql("pre-materialization-init")

    # 5. materializations (view SQL through the dialect translator)
    ctx.engine = MaterializationEngine(spark, f"{data_dir}/materialization_state")
    for m in instance.materializations:
        target = m.target_trend_store_part
        target_store = ctx.parts_index.get(target)
        if target_store is None:
            continue
        sources = [
            s["trend_store_part"]
            for s in m.sources
            if (isinstance(s, dict) and "trend_store_part" in s)
        ] + [s for s in m.sources if isinstance(s, str)]
        relation_sources = [
            s["relation"]
            for s in m.sources
            if isinstance(s, dict) and "relation" in s
        ]
        view_sql = translate(m.view) if m.view else None
        unbounded = m.unbounded_sources
        if unbounded is None and m.view:
            unbounded = _looks_lookback(m.view)
            if unbounded:
                import warnings

                warnings.warn(
                    f"materialization {target}: view looks lookback-style "
                    "(window function / interval arithmetic) — source "
                    "scans left unpruned; set unbounded_sources: false "
                    "to force range pruning",
                    stacklevel=2,
                )

        def make_transform(
            view_sql=view_sql,
            sources=sources,
            relations=relation_sources,
            gran=Granularity.parse(target_store.granularity.name),
            unbounded=bool(unbounded),
        ):
            def transform(spark_, timestamps):
                # source rows feeding end-labeled bucket T lie in
                # (T - gran, T]; over the batch: (decr(min), max].  The
                # plain range prunes the source scan (the reference's
                # generated functions are likewise per-timestamp
                # time-bounded, `aggregation_compilation.py:726-745`);
                # views reading rows outside their target bucket opt out
                # via `unbounded_sources: true` (lookback shapes are
                # also auto-detected, see _looks_lookback).
                rng = (
                    (gran.decr(min(timestamps)), max(timestamps))
                    if timestamps and not unbounded
                    else None
                )
                for src in sources:
                    ctx.register_part_view(src, time_range=rng)
                for rel in relations:
                    ctx.register_relation_view(rel)
                df = spark_.sql(view_sql)
                return df.filter(F.col("timestamp").isin(timestamps))

            return transform

        ctx.engine.register(
            Materialization(
                name=target,
                target_gran=Granularity.parse(target_store.granularity.name),
                sources=sources,
                transform=make_transform(),
                processing_delay=_parse_delay(m.processing_delay),
                stability_delay=_parse_delay(m.stability_delay),
                reprocessing_period=_parse_delay(m.reprocessing_period),
                enabled=m.enabled,
            )
        )

    # 5b. attribute materializations (reference initialize step
    #     "Initializing attribute materializations",
    #     `commands/initialize.py:136-137` — run via
    #     ctx.materialize_attributes, the `attribute-store
    #     materialization run` surface)
    ctx._attribute_materialization_defs = list(
        instance.attribute_materializations
    )

    # 6. triggers
    for t in instance.triggers:
        ctx.triggers[t["name"]] = ctx.trigger_factory(t)

    # 7. custom post-init SQL (reference `initialize.py:145-146`)
    ctx.run_custom_sql("post-init")

    return ctx
