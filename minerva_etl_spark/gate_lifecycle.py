"""Load-then-read correctness-gate queries for the engine's write paths.

Round-1 gate queries proved the *read/transform* operators; these prove
the *lifecycle*: CSV harvest → Loader → TrendStore upsert → modified
log → fingerprint materialization → attribute/notification sinks →
retention — each query EXECUTES the engine against a throwaway temp
directory and returns the stored result for hashing against a DuckDB
oracle that recomputes the same final table from the fixture data
(mirroring the reference's integration tests,
`/root/reference/integration_tests/storage/trend/test_store.py:28-689`).

Determinism rules: every write uses a pinned ``created``/``job_id``;
entity ids use the md5 method; generated sample data is hash-based
(`sources/sample_data.py`), so both engines compute bit-identical
values with no shared state.
"""

from __future__ import annotations

import tempfile
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.catalog.directory import (
    entity_id_duck_sql,
    names_to_entity_ids,
    register_entities,
)
from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.materialize.fingerprint import (
    Materialization,
    MaterializationEngine,
)
from minerva_etl_spark.operators.aggregation import TrendAggSpec, time_aggregate
from minerva_etl_spark.sources.csv_harvest import CsvParserConfig
from minerva_etl_spark.sources.loader import JobLog, Loader
from minerva_etl_spark.sources.sample_data import (
    generate_trend_sample,
    metric_ansi_sql,
)
from minerva_etl_spark.store.attribute_store import AttributeStore
from minerva_etl_spark.store.notification import NotificationStore
from minerva_etl_spark.store.trendstore import TrendStore, TrendStorePart
from minerva_etl_spark.gate import _prep
from minerva_etl_spark.sources.tables import load_table


def _tmp(name: str) -> str:
    return tempfile.mkdtemp(prefix=f"minerva_gate_{name}_")


def _finish(result: DataFrame, base: str) -> DataFrame:
    """Detach the result from the throwaway working directory, then
    delete it.  These queries run inside bench's HEADLINE — without
    cleanup, repeated bench/gate runs accumulate sf-dependent temp data
    on disk.  ``localCheckpoint`` pins the (small) result in block
    storage so the lazy DataFrame survives the rmtree."""
    import shutil

    result = result.localCheckpoint(eager=True)
    shutil.rmtree(base, ignore_errors=True)
    return result


# =====================================================================
# S1/S2/S4/S5/P6/P7/P8/T7/T9/U3/X1/X6/J2: full load → store → read
# =====================================================================
_C1 = datetime(2023, 6, 1, 10, 0)
_C2 = datetime(2023, 6, 1, 11, 0)


def _events_csv_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → harvest-file shape, pre-aggregated so (entity, ts) is a
    unique key (CSV packages may not carry duplicate keys)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "ts")
        .agg(
            F.max("value").alias("value"),
            F.count(F.lit(1)).alias("score"),
            F.max("event_type").alias("junk"),
        )
        .select(
            F.concat(F.lit("node-"), F.col("user_id")).alias("node"),
            F.col("ts").cast("string").alias("ts"),
            "value",
            "score",
            "junk",
            F.lit(1).alias("noise"),
        )
    )


def q_lifecycle_load_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S4+S5+P6+P7+P8+U3: two CSV loads through the harvest plugin →
    Loader (row/column regex filters) → TrendStore upsert split across
    two parts → multi-part wide read-back.

    Load 1 = full feed (job 1001); load 2 = re-delivery of the
    user_id%5==0 slice with doubled values (job 1002) — the read-back
    must show last-write-wins rows with ``created = greatest``.
    """
    _prep(spark)
    base = _tmp("loadstore")
    # checkpoint the fixture agg once: both CSV writes (full feed +
    # re-delivery slice) read the same blocks instead of re-running the
    # events aggregation
    frame = _events_csv_frame(spark, sf_dir).localCheckpoint(eager=True)
    # a harvest DELIVERY is a directory of files — write it as one
    # (8-way, not coalesce(1): a single-task CSV serialization was the
    # second-largest warm cost of this row)
    frame.repartition(8).write.mode("overwrite").option(
        "header", True
    ).csv(base + "/in1")
    (
        frame.filter(F.expr("cast(substr(node, 6) as bigint) % 5 = 0"))
        .withColumn("value", F.col("value") * 2)
        .repartition(4)
        .write.mode("overwrite")
        .option("header", True)
        .csv(base + "/in2")
    )
    store = TrendStore(
        data_source="gate",
        entity_type="node",
        granularity="15m",
        parts=[
            TrendStorePart("main_15m", ["value"]),
            TrendStorePart("aux_15m", ["score"]),
        ],
        base_path=base,
    )
    cfg = CsvParserConfig(
        identifier_column="node",
        timestamp_column="ts",
        column_types={"value": "double precision"},  # X6 explicit type
        entity_type="node",
        id_method="md5",
    )
    loader = Loader(
        store,
        job_log=JobLog(base),
        entity_filter="[02468]$",          # P8 row filter: even user ids
        column_filter=r"^(value|score|junk)$",  # P8 column filter: drop noise
        id_method="md5",
    )
    # fused batch load: ONE entity-dim registration + ONE upsert cycle
    # per part for the whole delivery (vs one per file sequentially)
    loader.load_files(
        spark,
        [
            ("csv", base + "/in1", cfg, 1001, _C1),
            ("csv", base + "/in2", cfg, 1002, _C2),
        ],
    )
    wide = store.read_store(spark)  # U3: parts joined back on the key
    main = store.read_part(spark, "main_15m").select(
        "entity_id", "timestamp", "created", "job_id"
    )
    out = wide.join(main, ["entity_id", "timestamp"]).select(
        "entity_id", "timestamp", "value", "score", "created", "job_id"
    )
    return _finish(out, base)


def _oracle_lifecycle_load_store() -> str:
    eid = entity_id_duck_sql("node", "'node-' || user_id")
    return f"""
WITH agg AS (
  SELECT user_id, ts,
         max(value) AS value,
         CAST(count(*) AS SMALLINT) AS score
  FROM events
  GROUP BY user_id, ts
),
flt AS (SELECT * FROM agg WHERE user_id % 2 = 0)
SELECT {eid} AS entity_id,
       ts AS timestamp,
       CASE WHEN user_id % 10 = 0 THEN value * 2 ELSE value END AS value,
       score,
       CASE WHEN user_id % 10 = 0 THEN TIMESTAMP '{_C2:%Y-%m-%d %H:%M:%S}'
            ELSE TIMESTAMP '{_C1:%Y-%m-%d %H:%M:%S}' END AS created,
       CAST(CASE WHEN user_id % 10 = 0 THEN 1002 ELSE 1001 END AS BIGINT)
           AS job_id
FROM flt
"""


# =====================================================================
# T7: job logging (finished + failed states)
# =====================================================================
def q_lifecycle_job_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: every load is wrapped in a logged job; a failing load (stop
    policy on an undeclared column) logs state='failed'."""
    _prep(spark)
    base = _tmp("joblog")
    grid = generate_trend_sample(
        spark, "dev", 5, "15m", datetime(2023, 4, 1, 0, 15), 4,
        {"value": (0.0, 10.0), "extra": (0.0, 1.0)}, seed=7,
    )
    grid.select(
        "entity_ref", F.col("timestamp").cast("string").alias("ts"),
        "value", "extra",
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(
        base + "/in"
    )
    store = TrendStore(
        data_source="gate", entity_type="dev", granularity="15m",
        parts=[TrendStorePart("dev_15m", ["value"])], base_path=base,
    )
    cfg = CsvParserConfig(
        identifier_column="entity_ref", timestamp_column="ts",
        entity_type="dev", id_method="md5",
    )
    log = JobLog(base)
    ok = Loader(store, job_log=log, id_method="md5")
    ok.load_file(spark, "csv", base + "/in", cfg, job_id=2001)
    ok.load_file(spark, "csv", base + "/in", cfg, job_id=2002)
    strict = Loader(store, job_log=log, on_unknown_column="stop", id_method="md5")
    try:
        strict.load_file(spark, "csv", base + "/in", cfg, job_id=2003)
    except ValueError:
        pass  # expected: 'extra' is not a declared trend column
    return _finish(
        log.read(spark).select("job_id", "description", "state"), base
    )


_ORACLE_JOB_LOG = """
SELECT CAST(job_id AS BIGINT) AS job_id, description, state
FROM (VALUES (2001, 'in', 'finished'),
             (2002, 'in', 'finished'),
             (2003, 'in', 'failed')) AS t(job_id, description, state)
"""


# =====================================================================
# T1/T2/T3/J5/J7/X5: modified log → fingerprints → materialization
# =====================================================================
_M1 = datetime(2023, 5, 1, 13, 0)
_M2 = datetime(2023, 5, 1, 13, 30)
_MAT_UPDATE_FROM = datetime(2023, 5, 1, 6, 0)


def q_lifecycle_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T3: store twice (second write re-delivers the tail with
    +1000), fold the modified log, compute per-bucket source
    fingerprints, run the engine (15m → 1h roll-up), run it AGAIN (must
    be a no-op: fingerprints now match), and read back the target part
    joined with its processed fingerprints."""
    _prep(spark)
    base = _tmp("materialize")
    grid = generate_trend_sample(
        spark, "cell", 20, "15m", datetime(2023, 5, 1, 0, 15), 48,
        {"value": (0.0, 100.0)}, seed=11,
    )
    frame = names_to_entity_ids(grid, "cell", "entity_ref", method="md5").select(
        "entity_id", "timestamp", "value"
    )
    raw = TrendStore(
        data_source="gate", entity_type="cell", granularity="15m",
        parts=[TrendStorePart("cell_15m", ["value"])], base_path=base,
    )
    raw.store(spark, frame, job_id=1, created=_M1)
    update = frame.filter(F.col("timestamp") >= F.lit(_MAT_UPDATE_FROM))
    raw.store(
        spark, update.withColumn("value", F.col("value") + 1000.0),
        job_id=2, created=_M2,
    )

    target = TrendStore(
        data_source="gate", entity_type="cell", granularity="1h",
        parts=[TrendStorePart("cell_1h", ["samples", "sum_value", "max_value"])],
        base_path=base,
    )

    def transform(sp: SparkSession, timestamps: list[datetime]) -> DataFrame:
        src = raw.read_part(sp, "cell_15m")
        agg = time_aggregate(
            src, "1h",
            [
                TrendAggSpec("value", "sum", alias="sum_value"),
                TrendAggSpec("value", "max", alias="max_value"),
            ],
        )
        return agg.filter(F.col("timestamp").isin(timestamps))

    engine = MaterializationEngine(spark, base + "/state")
    engine.register(
        Materialization(
            name="cell_1h",
            target_gran=Granularity.parse("1h"),
            sources=["cell_15m"],
            transform=transform,
            source_gran=Granularity.parse("15m"),
            processing_delay=timedelta(minutes=30),
            stability_delay=timedelta(minutes=5),
            reprocessing_period=timedelta(days=3),
        )
    )

    def sink(name: str, df: DataFrame, timestamps: list[datetime]) -> None:
        # the roll-up emits exactly the scheduled bucket timestamps —
        # pass them so store() skips the timestamp pre-pass job (r17)
        target.store(
            spark, df, job_id=9, created=_M2,
            known_timestamps=timestamps,
        )

    now = datetime(2023, 5, 1, 14, 0)
    engine.run(raw.read_modified_log(spark), now, sink)
    # idempotency (T2): fingerprints match → second run materializes 0
    rerun = engine.run(raw.read_modified_log(spark), now, sink)
    assert rerun == [], f"second run must be a no-op, got {rerun}"

    tgt = target.read_part(spark, "cell_1h")
    state = spark.read.parquet(base + "/state").select(
        "timestamp", "processed_fingerprint"
    )
    out = tgt.join(state, "timestamp").select(
        "entity_id", "timestamp", "samples", "sum_value", "max_value",
        "processed_fingerprint",
    )
    return _finish(out, base)


def _oracle_lifecycle_materialize() -> str:
    metric = metric_ansi_sql("value", 0.0, 100.0, 11, "entity_ref", "ts")
    bucket = Granularity.parse("1h").bucket_end_ansi_sql("ts")
    upd = f"TIMESTAMP '{_MAT_UPDATE_FROM:%Y-%m-%d %H:%M:%S}'"
    m1 = f"{_M1:%Y-%m-%d %H:%M:%S}"
    m2 = f"{_M2:%Y-%m-%d %H:%M:%S}"
    eid = entity_id_duck_sql("cell", "entity_ref")
    fp_entry = (
        "'\"cell_15m|' || CAST(ts AS VARCHAR) || '\":\"' || "
        f"CASE WHEN ts >= {upd} THEN '{m2}' ELSE '{m1}' END || '\"'"
    )
    return f"""
WITH grid AS (
  SELECT 'cell-' || printf('%04d', e) AS entity_ref,
         TIMESTAMP '2023-05-01 00:15:00' + INTERVAL 15 MINUTE * s AS ts
  FROM range(20) t1(e), range(48) t2(s)
),
merged AS (
  SELECT {eid} AS entity_id, ts,
         CASE WHEN ts >= {upd} THEN {metric} + 1000.0 ELSE {metric} END AS value
  FROM grid
),
agg AS (
  SELECT entity_id, {bucket} AS timestamp,
         CAST(count(*) AS BIGINT) AS samples,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value,
         MAX(value) AS max_value
  FROM merged GROUP BY 1, 2
),
fp AS (
  SELECT {bucket} AS timestamp,
         '{{' || string_agg({fp_entry}, ',' ORDER BY CAST(ts AS VARCHAR))
             || '}}' AS processed_fingerprint
  FROM (SELECT DISTINCT ts FROM grid) GROUP BY 1
)
SELECT a.entity_id, a.timestamp, a.samples, a.sum_value, a.max_value,
       f.processed_fingerprint
FROM agg a JOIN fp f USING (timestamp)
"""


# =====================================================================
# T6: the live-monitor poll loop, availableNow-style
# =====================================================================
_LM_START = datetime(2023, 5, 1, 0, 15)
_LM_UPDATE_FROM = datetime(2023, 5, 1, 3, 30)


def q_live_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: three ``run_loop`` poll cycles over a modified log that grows
    between cycles (`streaming/live_monitor.py:44-62`; reference
    `commands/live_monitor.py:13-45`).  Cycle 1 sees the initial load
    (every 1h bucket stale), cycle 2 sees a re-delivery of the
    ``>= 03:30`` tail (+1000) so exactly the covering buckets go stale,
    cycle 3 sees no change (asserted no-op).  Returns one row per
    (cycle, materialized bucket)."""
    _prep(spark)
    from minerva_etl_spark.streaming.live_monitor import run_loop

    base = _tmp("livemon")
    grid = generate_trend_sample(
        spark, "cell", 10, "15m", _LM_START, 24, {"value": (0.0, 100.0)},
        seed=13,
    )
    frame = names_to_entity_ids(grid, "cell", "entity_ref", method="md5").select(
        "entity_id", "timestamp", "value"
    )
    raw = TrendStore(
        data_source="gate", entity_type="cell", granularity="15m",
        parts=[TrendStorePart("cell_15m", ["value"])], base_path=base,
    )
    raw.store(spark, frame, job_id=1, created=_M1)

    target = TrendStore(
        data_source="gate", entity_type="cell", granularity="1h",
        parts=[TrendStorePart("cell_1h", ["samples", "sum_value"])],
        base_path=base + "/target",
    )

    def transform(sp: SparkSession, timestamps: list[datetime]) -> DataFrame:
        src = raw.read_part(sp, "cell_15m")
        agg = time_aggregate(
            src, "1h", [TrendAggSpec("value", "sum", alias="sum_value")],
        )
        return agg.filter(F.col("timestamp").isin(timestamps))

    engine = MaterializationEngine(spark, base + "/state")
    engine.register(
        Materialization(
            name="cell_1h",
            target_gran=Granularity.parse("1h"),
            sources=["cell_15m"],
            transform=transform,
            source_gran=Granularity.parse("15m"),
            processing_delay=timedelta(minutes=30),
            stability_delay=timedelta(minutes=5),
            reprocessing_period=timedelta(days=3),
        )
    )

    cycle = {"i": 0}
    tally: list[tuple[int, datetime]] = []

    def read_log() -> DataFrame | None:
        cycle["i"] += 1
        if cycle["i"] == 2:  # new data lands between poll cycles
            update = frame.filter(
                F.col("timestamp") >= F.lit(_LM_UPDATE_FROM)
            ).withColumn("value", F.col("value") + 1000.0)
            raw.store(spark, update, job_id=2, created=_M2)
        return raw.read_modified_log(spark)

    def sink(name: str, df: DataFrame, timestamps: list[datetime]) -> None:
        target.store(
            spark, df, job_id=9, created=_M2,
            known_timestamps=timestamps,  # r17: no timestamp pre-pass
        )
        tally.extend((cycle["i"], t) for t in timestamps)

    run_loop(
        engine, read_log, sink,
        poll_seconds=0.0, max_cycles=3,
        now=lambda: datetime(2023, 5, 1, 14, 0),
    )
    assert cycle["i"] == 3
    assert all(c != 3 for c, _ in tally), "cycle 3 must be a no-op"
    out = spark.createDataFrame(
        tally, "cycle int, timestamp timestamp_ntz"
    )
    return _finish(out, base)


def _oracle_live_monitor() -> str:
    bucket = Granularity.parse("1h").bucket_end_ansi_sql("ts")
    stale_from = Granularity.parse("1h").bucket_end(_LM_UPDATE_FROM)
    return f"""
WITH grid AS (
  SELECT TIMESTAMP '{_LM_START:%Y-%m-%d %H:%M:%S}'
         + INTERVAL 15 MINUTE * s AS ts
  FROM range(24) t(s)
),
buckets AS (SELECT DISTINCT {bucket} AS timestamp FROM grid)
SELECT CAST(1 AS INTEGER) AS cycle, timestamp FROM buckets
UNION ALL
SELECT CAST(2 AS INTEGER), timestamp FROM buckets
WHERE timestamp >= TIMESTAMP '{stale_from:%Y-%m-%d %H:%M:%S}'
"""


# =====================================================================
# Schema evolution: new column + type widening through the load path
# =====================================================================
_E1 = datetime(2023, 3, 3, 8, 0)
_E2 = datetime(2023, 3, 3, 9, 0)


def q_lifecycle_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two drifting CSV feeds: day 1 declares ``value smallint``; day 2
    delivers ``value`` as double precision plus a NEW ``score`` column.
    The loader (policy 'add') declares the new trend; the store widens
    smallint→double (full-part rewrite, the ALTER COLUMN analog) and
    null-fills ``score`` for day-1 history."""
    _prep(spark)
    base = _tmp("evolve")
    g1 = generate_trend_sample(
        spark, "dev", 10, "1h", datetime(2023, 3, 1, 1, 0), 24,
        {"value": (0.0, 1000.0)}, seed=3,
    )
    g1.select(
        "entity_ref", F.col("timestamp").cast("string").alias("ts"),
        F.floor("value").cast("int").alias("value"),
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(
        base + "/day1"
    )
    g2 = generate_trend_sample(
        spark, "dev", 10, "1h", datetime(2023, 3, 2, 1, 0), 24,
        {"value": (0.0, 1000.0), "score": (0.0, 10.0)}, seed=3,
    )
    g2.select(
        "entity_ref", F.col("timestamp").cast("string").alias("ts"),
        "value", "score",
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(
        base + "/day2"
    )
    store = TrendStore(
        data_source="gate", entity_type="dev", granularity="1h",
        parts=[TrendStorePart("dev_1h", ["value"])], base_path=base,
    )
    loader = Loader(store, on_unknown_column="add", id_method="md5")
    cfg1 = CsvParserConfig(
        identifier_column="entity_ref", timestamp_column="ts",
        column_types={"value": "smallint"}, entity_type="dev", id_method="md5",
    )
    cfg2 = CsvParserConfig(
        identifier_column="entity_ref", timestamp_column="ts",
        column_types={"value": "double precision", "score": "double precision"},
        entity_type="dev", id_method="md5",
    )
    loader.load_file(spark, "csv", base + "/day1", cfg1, job_id=3001, created=_E1)
    loader.load_file(spark, "csv", base + "/day2", cfg2, job_id=3002, created=_E2)
    assert store.parts[0].trend_columns == ["value", "score"]
    out = store.read_part(spark, "dev_1h").select(
        "entity_id", "timestamp", "value", "score", "created", "job_id"
    )
    return _finish(out, base)


def _oracle_lifecycle_schema_evolution() -> str:
    eid = entity_id_duck_sql("dev", "entity_ref")
    v1 = metric_ansi_sql("value", 0.0, 1000.0, 3, "entity_ref", "ts")
    v2 = metric_ansi_sql("value", 0.0, 1000.0, 3, "entity_ref", "ts")
    s2 = metric_ansi_sql("score", 0.0, 10.0, 3, "entity_ref", "ts")
    return f"""
WITH g1 AS (
  SELECT 'dev-' || printf('%04d', e) AS entity_ref,
         TIMESTAMP '2023-03-01 01:00:00' + INTERVAL 1 HOUR * s AS ts
  FROM range(10) t1(e), range(24) t2(s)
),
g2 AS (
  SELECT 'dev-' || printf('%04d', e) AS entity_ref,
         TIMESTAMP '2023-03-02 01:00:00' + INTERVAL 1 HOUR * s AS ts
  FROM range(10) t1(e), range(24) t2(s)
)
SELECT {eid} AS entity_id, ts AS timestamp,
       CAST(CAST(FLOOR({v1}) AS INTEGER) AS DOUBLE) AS value,
       CAST(NULL AS DOUBLE) AS score,
       TIMESTAMP '{_E1:%Y-%m-%d %H:%M:%S}' AS created,
       CAST(3001 AS BIGINT) AS job_id
FROM g1
UNION ALL
SELECT {eid}, ts, {v2}, {s2},
       TIMESTAMP '{_E2:%Y-%m-%d %H:%M:%S}', CAST(3002 AS BIGINT)
FROM g2
"""


# =====================================================================
# A4/A5: standard aggregation ladder compile (rungs + promoted types)
# =====================================================================
def q_ladder_compile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5: the generated ladder for a 15m raw store — rung layout,
    samples injection, type promotion, partition-size mapping — as a
    relation, checkable row-by-row."""
    _prep(spark)
    from minerva_etl_spark.catalog.instance import (
        TrendDef,
        TrendStoreDef,
        TrendStorePartDef,
    )
    from minerva_etl_spark.operators.ladder import generate_time_ladder

    store_def = TrendStoreDef(
        data_source="gate", entity_type="node", granularity="15m",
        partition_size="1d",
        parts=[
            TrendStorePartDef(
                "node_15m",
                [
                    TrendDef("power", "integer", "sum", "sum"),
                    TrendDef("temp", "double precision", "avg", "avg"),
                    TrendDef("cnt", "bigint", "sum", "sum"),
                ],
            )
        ],
    )
    rows = []
    for plan, tstore in generate_time_ladder(store_def):
        for part in tstore.parts:
            for t in part.trends:
                rows.append(
                    (
                        plan.target_granularity,
                        part.name,
                        tstore.partition_size,
                        t.name,
                        t.data_type,
                        t.time_aggregation,
                    )
                )
    return spark.createDataFrame(
        rows,
        "granularity string, part string, partition_size string, "
        "trend string, data_type string, time_aggregation string",
    )


_ORACLE_LADDER_COMPILE = """
SELECT * FROM (VALUES
  ('1h', 'node_1h', '4d', 'samples', 'bigint', 'sum'),
  ('1h', 'node_1h', '4d', 'power', 'bigint', 'sum'),
  ('1h', 'node_1h', '4d', 'temp', 'double precision', 'avg'),
  ('1h', 'node_1h', '4d', 'cnt', 'numeric', 'sum'),
  ('1d', 'node_1d', '3month', 'samples', 'bigint', 'sum'),
  ('1d', 'node_1d', '3month', 'power', 'bigint', 'sum'),
  ('1d', 'node_1d', '3month', 'temp', 'double precision', 'avg'),
  ('1d', 'node_1d', '3month', 'cnt', 'numeric', 'sum'),
  -- chained rungs source the generated 1d store (reference
  -- STANDARD_AGGREGATIONS, aggregation_generation.py:27-44): types
  -- promote a second hop (sum bigint -> numeric), samples rolls up
  ('1w', 'node_1w', '1year', 'samples', 'bigint', 'sum'),
  ('1w', 'node_1w', '1year', 'power', 'numeric', 'sum'),
  ('1w', 'node_1w', '1year', 'temp', 'double precision', 'avg'),
  ('1w', 'node_1w', '1year', 'cnt', 'numeric', 'sum'),
  ('1month', 'node_1month', '5year', 'samples', 'bigint', 'sum'),
  ('1month', 'node_1month', '5year', 'power', 'numeric', 'sum'),
  ('1month', 'node_1month', '5year', 'temp', 'double precision', 'avg'),
  ('1month', 'node_1month', '5year', 'cnt', 'numeric', 'sum')
) AS t(granularity, part, partition_size, trend, data_type,
       time_aggregation)
"""


# =====================================================================
# S8/A8/A9: attribute staging → history → curr pointer
# =====================================================================
_T1 = datetime(2023, 1, 1, 0, 0)
_T2 = datetime(2023, 2, 1, 0, 0)


def q_lifecycle_attr_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: two staged attribute batches through the store sink — batch 2
    re-stages some (entity, T1) rows (values replaced, reference update
    test) and adds T2 rows — then the curr pointer is materialized.

    ``tags`` is a REAL ``array<string>`` attribute end-to-end (the
    reference round-trips array attributes,
    `integration_tests/storage/attribute/test_attributestore.py:21-415`);
    only the final SELECT serializes it (``array_join``) because the
    driver hash-compares scalar cells.

    Round 6 adds the SampledViewMaterialization leg: a second attribute
    store whose history is populated by sampling a view over a trend
    part (initialize loads attribute/materialization defs; run =
    ``ctx.materialize_attributes``) — its derived ``bal_class`` column
    rides the same value hash."""
    _prep(spark)
    base = _tmp("attr")
    cust = load_table(spark, sf_dir, "customer")
    ids = names_to_entity_ids(cust, "customer", "c_name", method="md5")
    b1 = ids.select(
        "entity_id",
        F.lit(_T1).cast("timestamp_ntz").alias("timestamp"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.array(F.concat(F.lit("seg:"), F.col("c_mktsegment"))).alias("tags"),
    )
    b2 = (
        ids.filter(F.col("c_custkey") % 7 == 0)
        .select(
            "entity_id",
            F.lit(_T1).cast("timestamp_ntz").alias("timestamp"),
            F.col("c_mktsegment").alias("segment"),
            (F.col("c_acctbal") - 1000.0).alias("acctbal"),
            F.array(
                F.concat(F.lit("seg:"), F.col("c_mktsegment")), F.lit("adj")
            ).alias("tags"),
        )
        .unionByName(
            ids.filter(F.col("c_custkey") % 3 == 0).select(
                "entity_id",
                F.lit(_T2).cast("timestamp_ntz").alias("timestamp"),
                F.lit("MOVED").alias("segment"),
                (F.col("c_acctbal") + 500.0).alias("acctbal"),
                F.array(F.lit("seg:MOVED"), F.lit("moved")).alias("tags"),
            )
        )
    )
    store = AttributeStore(
        "gate", "customer", ["segment", "acctbal", "tags"], base
    )
    store.store_batch(spark, b1)
    store.store_batch(spark, b2)
    store.materialize_curr(spark)

    # SampledViewMaterialization leg (reference initialize step
    # "Initializing attribute materializations",
    # `commands/initialize.py:136-137,343-361` + view creation
    # `commands/attribute_store.py:352-391`): a trend part holding the
    # same balances is written through the store sink, then a view over
    # it is SAMPLED into a second attribute store via the full
    # initialize() + translate path; its derived attribute joins the
    # output below.
    from minerva_etl_spark.catalog.initialize import initialize
    from minerva_etl_spark.catalog.instance import (
        MinervaInstance,
        TrendStoreDef,
    )

    inst = MinervaInstance(
        trend_stores=[
            TrendStoreDef.from_dict(
                {
                    "data_source": "gate-bal",
                    "entity_type": "customer",
                    "granularity": "1month",
                    "parts": [
                        {
                            "name": "cust_bal_1month",
                            "trends": [
                                {"name": "bal", "data_type": "double precision"}
                            ],
                        }
                    ],
                }
            )
        ],
        attribute_stores=[
            {
                "data_source": "gate-sampled",
                "entity_type": "customer",
                "attributes": [{"name": "bal_class"}],
            }
        ],
        attribute_materializations=[
            {
                "attribute_store": {
                    "data_source": "gate-sampled",
                    "entity_type": "customer",
                },
                "query": (
                    'SELECT entity_id, timestamp, CASE WHEN bal >= 0 '
                    "THEN 'pos' ELSE 'neg' END AS bal_class "
                    'FROM trend."cust_bal_1month"'
                ),
            }
        ],
    )
    ctx = initialize(spark, inst, base)
    trend_rows = ids.select(
        "entity_id",
        F.lit(_T1).cast("timestamp_ntz").alias("timestamp"),
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") - 1000.0
        ).otherwise(F.col("c_acctbal")).alias("bal"),
    ).unionByName(
        ids.filter(F.col("c_custkey") % 3 == 0).select(
            "entity_id",
            F.lit(_T2).cast("timestamp_ntz").alias("timestamp"),
            (F.col("c_acctbal") + 500.0).alias("bal"),
        )
    )
    ctx.trend_stores["gate-bal_customer_1month"].store(
        spark, trend_rows, job_id=3, created=_T2
    )
    assert ctx.materialize_attributes() == ["gate-sampled_customer"]
    sampled = ctx.attribute_stores["gate-sampled_customer"].read_history(
        spark
    )

    hist = store.read_history(spark)
    curr = (
        spark.read.parquet(store.curr_path)
        .select("entity_id", "timestamp")
        .withColumn("is_curr", F.lit(True))
    )
    out = (
        hist.join(curr, ["entity_id", "timestamp"], "left")
        .join(sampled, ["entity_id", "timestamp"])
        .select(
            "entity_id", "timestamp", "segment", "acctbal",
            F.array_join("tags", "|").alias("tags"),
            F.coalesce("is_curr", F.lit(False)).alias("is_curr"),
            "bal_class",
        )
    )
    return _finish(out, base)


def _oracle_lifecycle_attr_store() -> str:
    eid = entity_id_duck_sql("customer", "c_name")
    return f"""
WITH base AS (
  SELECT {eid} AS entity_id, c_custkey, c_mktsegment, c_acctbal
  FROM customer
),
hist AS (
  SELECT entity_id, TIMESTAMP '{_T1:%Y-%m-%d %H:%M:%S}' AS timestamp,
         c_mktsegment AS segment,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal - 1000.0
              ELSE c_acctbal END AS acctbal,
         CASE WHEN c_custkey % 7 = 0 THEN 'seg:' || c_mktsegment || '|adj'
              ELSE 'seg:' || c_mktsegment END AS tags
  FROM base
  UNION ALL
  SELECT entity_id, TIMESTAMP '{_T2:%Y-%m-%d %H:%M:%S}', 'MOVED',
         c_acctbal + 500.0, 'seg:MOVED|moved'
  FROM base WHERE c_custkey % 3 = 0
)
SELECT entity_id, timestamp, segment, acctbal, tags,
       timestamp = max(timestamp) OVER (PARTITION BY entity_id) AS is_curr,
       CASE WHEN acctbal >= 0 THEN 'pos' ELSE 'neg' END AS bal_class
FROM hist
"""


# =====================================================================
# S9/T5: trigger notifications through the notification sink
# =====================================================================
def q_lifecycle_notification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: two trigger evaluations appended through the notification
    store sink (day-partitioned parquet), read back as one table."""
    _prep(spark)
    from minerva_etl_spark.trigger.trigger import Trigger

    base = _tmp("notif")

    def kpi(sp: SparkSession, _timestamps: list[datetime]) -> DataFrame:
        ev = load_table(sp, sf_dir, "events")
        return time_aggregate(
            ev, "1h", [TrendAggSpec("value", "sum", alias="sum_value")],
            entity_col="user_id", timestamp_col="ts",
        ).select(
            F.col("user_id").alias("entity_id"),
            F.col("ts").alias("timestamp"),
            "samples", "sum_value",
        )

    high = Trigger(
        name="HighHourlyValue", kpi=kpi,
        thresholds={"max_value": 400.0},
        condition="sum_value > max_value", weight="100",
        notification_message="concat('hourly value ', sum_value)",
        # structured payload: the typed store serializes it to JSON
        notification_data="map('sum_value', cast(round(sum_value, 6)"
                          " as string))",
    )
    busy = Trigger(
        name="BusyHour", kpi=kpi,
        thresholds={"max_samples": 4.0},
        condition="samples > max_samples", weight="10",
        notification_message="concat('samples ', samples)",
        notification_data="map('samples', cast(samples as string))",
    )
    # typed attribute declarations incl. a json payload (reference
    # notificationstore.py:17-97 + trigger-notification.yaml)
    sink = NotificationStore(
        "gate",
        [
            {"name": "rule", "data_type": "text"},
            {"name": "weight", "data_type": "integer"},
            {"name": "details", "data_type": "text"},
            {"name": "data", "data_type": "json"},
        ],
        base,
    )
    sink.store(high.evaluate(spark, []))
    sink.store(busy.evaluate(spark, []))
    out = sink.read(spark)
    if out is None:  # nothing fired at this scale: typed empty relation
        out = spark.createDataFrame(
            [],
            "entity_id bigint, timestamp timestamp_ntz, rule string, "
            "weight int, details string, data string",
        )
    return _finish(out, base)


def _oracle_lifecycle_notification() -> str:
    bucket = Granularity.parse("1h").bucket_end_ansi_sql("ts")
    return f"""
WITH kpi AS (
  SELECT user_id AS entity_id, {bucket} AS timestamp,
         CAST(count(*) AS BIGINT) AS samples,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT entity_id, timestamp, 'HighHourlyValue' AS rule,
       CAST(100 AS INTEGER) AS weight,
       'hourly value ' || CAST(sum_value AS VARCHAR) AS details,
       '{{"sum_value":"' || CAST(round(sum_value, 6) AS VARCHAR) || '"}}'
           AS data
FROM kpi WHERE sum_value > 400.0
UNION ALL
SELECT entity_id, timestamp, 'BusyHour', CAST(10 AS INTEGER),
       'samples ' || CAST(samples AS VARCHAR),
       '{{"samples":"' || CAST(samples AS VARCHAR) || '"}}'
FROM kpi WHERE samples > 4.0
"""


# =====================================================================
# T8/T9: retention — whole-partition drops
# =====================================================================
_RET_START = datetime(2023, 1, 1, 1, 0)
_RET_NOW = datetime(2023, 1, 12, 0, 0)


def _retention_cutoff_idx() -> int:
    """Same arithmetic TrendStore.expired_partitions applies, evaluated
    driver-side for the oracle text (retention 1d, partition 4d)."""
    cutoff = _RET_NOW - timedelta(days=1) - timedelta(days=8)  # 2×4d slack
    return int(cutoff.replace(tzinfo=None).timestamp() // 345600)


def q_lifecycle_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: store 10 days of hourly data (partition_size 4d), enforce a
    1d retention at a pinned now — expired partitions are deleted as
    whole directories; the survivors read back exactly."""
    _prep(spark)
    base = _tmp("retention")
    grid = generate_trend_sample(
        spark, "sensor", 8, "1h", _RET_START, 240, {"value": (0.0, 50.0)},
        seed=5,
    )
    frame = names_to_entity_ids(grid, "sensor", "entity_ref", method="md5").select(
        "entity_id", "timestamp", "value"
    )
    store = TrendStore(
        data_source="gate", entity_type="sensor", granularity="1h",
        parts=[TrendStorePart("sensor_1h", ["value"])], base_path=base,
        retention_period="1d",
    )
    store.store(spark, frame, job_id=1, created=_RET_NOW)
    dropped = store.drop_expired(spark, "sensor_1h", _RET_NOW)
    assert dropped, "retention must drop at least one partition"
    out = store.read_part(spark, "sensor_1h", with_partition_col=True)
    out = out.select(
        "entity_id", "timestamp", "value",
        F.col("__part_idx").cast("bigint").alias("part_idx"),
    )
    return _finish(out, base)


def _oracle_lifecycle_retention() -> str:
    eid = entity_id_duck_sql("sensor", "entity_ref")
    metric = metric_ansi_sql("value", 0.0, 50.0, 5, "entity_ref", "ts")
    cutoff = _retention_cutoff_idx()
    return f"""
WITH grid AS (
  SELECT 'sensor-' || printf('%04d', e) AS entity_ref,
         TIMESTAMP '{_RET_START:%Y-%m-%d %H:%M:%S}' + INTERVAL 1 HOUR * s AS ts
  FROM range(8) t1(e), range(240) t2(s)
)
SELECT {eid} AS entity_id, ts AS timestamp, {metric} AS value,
       CAST(epoch_us(ts) // 1000000 // 345600 AS BIGINT) AS part_idx
FROM grid
WHERE epoch_us(ts) // 1000000 // 345600 >= {cutoff}
"""


# =====================================================================
# P1-P4: the composable Select builder
# =====================================================================
def q_select_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3+P4: build a query with the Select AST (comparison,
    boolean combinators, IN) and execute it as a DataFrame."""
    _prep(spark)
    from minerva_etl_spark.plans.builder import col, select

    cust = load_table(spark, sf_dir, "customer")
    sel = (
        select(
            [
                "c_mktsegment",
                "CAST(count(*) AS BIGINT) AS n",
                "CAST(SUM(CAST(c_acctbal AS DECIMAL(32,6))) AS DOUBLE)"
                " AS total_bal",
            ],
            "customer",
        )
        .where(
            (col("c_acctbal") > 1000.0)
            & (col("c_nationkey").isin([1, 2, 3]) | (col("c_mktsegment") == "BUILDING"))
        )
        .group_by("c_mktsegment")
    )
    return sel.to_df(spark, cust)


def _oracle_select_builder() -> str:
    # the builder's own SQL rendering IS the oracle (P1's point: one AST,
    # two identical-semantics renderings)
    from minerva_etl_spark.plans.builder import col, select

    sel = (
        select(
            [
                "c_mktsegment",
                "CAST(count(*) AS BIGINT) AS n",
                "CAST(SUM(CAST(c_acctbal AS DECIMAL(32,6))) AS DOUBLE)"
                " AS total_bal",
            ],
            "customer",
        )
        .where(
            (col("c_acctbal") > 1000.0)
            & (col("c_nationkey").isin([1, 2, 3]) | (col("c_mktsegment") == "BUILDING"))
        )
        .group_by("c_mktsegment")
    )
    return sel.to_sql()


# =====================================================================
# X4/W4/T9: timestamp mapping functions
# =====================================================================
def q_timestamp_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: the granularity function surface — bucket ends across the
    ladder, bucket start, and timestamp_to_index partition mapping."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    g15, g1h, g1d, g1w, g1mo = (
        Granularity.parse(s) for s in ("15m", "1h", "1d", "1w", "1month")
    )
    p1d, p3mo = Granularity.parse("1d"), Granularity.parse("3month")
    return ev.select(
        "event_id",
        "ts",
        F.expr(g15.bucket_end_spark_sql("ts")).alias("end_15m"),
        F.expr(g1h.bucket_end_spark_sql("ts")).alias("end_1h"),
        F.expr(g1d.bucket_end_spark_sql("ts")).alias("end_1d"),
        F.expr(g1w.bucket_end_spark_sql("ts")).alias("end_1w"),
        F.expr(g1mo.bucket_end_spark_sql("ts")).alias("end_1month"),
        F.expr(g1h.bucket_start_spark_sql("ts")).alias("start_1h"),
        F.expr(g15.partition_index_spark_sql("ts", p1d)).cast("bigint").alias("idx_1d"),
        F.expr(g1d.partition_index_spark_sql("ts", p3mo)).cast("bigint").alias("idx_3month"),
    )


def _oracle_timestamp_mapping() -> str:
    g15, g1h, g1d, g1w, g1mo = (
        Granularity.parse(s) for s in ("15m", "1h", "1d", "1w", "1month")
    )
    return f"""
SELECT event_id, ts,
       {g15.bucket_end_ansi_sql('ts')} AS end_15m,
       {g1h.bucket_end_ansi_sql('ts')} AS end_1h,
       {g1d.bucket_end_ansi_sql('ts')} AS end_1d,
       {g1w.bucket_end_ansi_sql('ts')} AS end_1w,
       {g1mo.bucket_end_ansi_sql('ts')} AS end_1month,
       make_timestamp(((epoch_us(ts) // 3600000000) * 3600000000)) AS start_1h,
       CAST(epoch_us(ts) // 1000000 // 86400 AS BIGINT) AS idx_1d,
       CAST((year(ts) * 12 + month(ts) - 1) // 3 AS BIGINT) AS idx_3month
FROM events
"""


# =====================================================================
# J2/J9: entity dimension create-on-miss (anti-insert)
# =====================================================================
def q_entity_dim_register(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J9: register half the customers, then all of them — the second
    call must insert ONLY the missing names (anti-insert); duplicates
    would double the row count and break the hash."""
    _prep(spark)
    base = _tmp("dim")
    cust = load_table(spark, sf_dir, "customer")
    dim_path = base + "/entity/customer"
    register_entities(
        spark, dim_path,
        cust.filter(F.col("c_custkey") % 2 == 0).select(
            F.col("c_name").alias("name")
        ),
        "customer", method="md5",
    )
    dim = register_entities(
        spark, dim_path, cust.select(F.col("c_name").alias("name")),
        "customer", method="md5",
    )
    return _finish(dim.select("id", "name", "entity_type"), base)


def _oracle_entity_dim_register() -> str:
    eid = entity_id_duck_sql("customer", "c_name")
    return f"""
SELECT {eid} AS id, c_name AS name, 'customer' AS entity_type
FROM customer
"""


# =====================================================================
# array trend columns (reference datatype registry `T[]` variants,
# `/root/reference/src/minerva/storage/datatype.py:889-898`; string
# syntax `[a,b,c]`, `:781-787`)
# =====================================================================
def q_lifecycle_array_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array trend columns end to end: a declared ``bigint[]`` trend
    parses from the reference's ``[a,b,c]`` CSV syntax, stores next to
    a scalar trend, and a re-delivery REPLACES the whole array (upsert
    on the key, ``created = greatest``) — including a length change,
    which a positional merge would get wrong.  The read-back emits the
    array both as a joined string and as a length so the hash pins
    content and cardinality without depending on either engine's
    list-to-CSV formatting."""
    _prep(spark)
    base = _tmp("arraytrend")
    ev = load_table(spark, sf_dir, "events")
    # floor() on both engines: Spark's double->bigint cast truncates
    # while DuckDB's rounds, so the raw cast would diverge
    # checkpoint the fixture agg once: both CSV writes (full feed +
    # re-delivery slice) read the same blocks instead of re-running
    # the events aggregation (the lifecycle_load_store rule, applied
    # here r16)
    agg = ev.groupBy("user_id", "ts").agg(
        F.min(F.floor("value").cast("bigint")).alias("lo"),
        F.max(F.floor("value").cast("bigint")).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).localCheckpoint(eager=True)
    frame1 = agg.select(
        F.concat(F.lit("node-"), F.col("user_id")).alias("node"),
        F.col("ts").cast("string").alias("ts"),
        F.concat(
            F.lit("["), F.col("lo"), F.lit(","), F.col("hi"),
            F.lit(","), F.col("n"), F.lit("]"),
        ).alias("readings"),
        F.col("n").alias("level"),
    )
    # a harvest DELIVERY is a directory of files — write it 8-way, not
    # coalesce(1): single-task CSV serialization was the second-largest
    # warm cost of the load_store row (same rule here, r16)
    frame1.repartition(8).write.mode("overwrite").option(
        "header", True
    ).csv(base + "/in1")
    # re-delivery: user_id%3==0 slice shrinks to a 2-element array
    (
        agg.filter(F.col("user_id") % 3 == 0)
        .select(
            F.concat(F.lit("node-"), F.col("user_id")).alias("node"),
            F.col("ts").cast("string").alias("ts"),
            F.concat(
                F.lit("["), F.col("hi") * 2, F.lit(","), F.col("n"),
                F.lit("]"),
            ).alias("readings"),
            F.col("n").alias("level"),
        )
        .repartition(4)
        .write.mode("overwrite")
        .option("header", True)
        .csv(base + "/in2")
    )
    store = TrendStore(
        data_source="gate",
        entity_type="node",
        granularity="15m",
        parts=[TrendStorePart("arr_15m", ["readings", "level"])],
        base_path=base,
    )
    cfg = CsvParserConfig(
        identifier_column="node",
        timestamp_column="ts",
        column_types={"readings": "bigint[]"},
        entity_type="node",
        id_method="md5",
    )
    loader = Loader(store, id_method="md5")
    loader.load_files(
        spark,
        [
            ("csv", base + "/in1", cfg, 3001, _C1),
            ("csv", base + "/in2", cfg, 3002, _C2),
        ],
    )
    part = store.read_part(spark, "arr_15m")
    assert dict(part.dtypes)["readings"] == "array<bigint>"
    out = part.select(
        "entity_id",
        "timestamp",
        F.array_join("readings", ",").alias("readings_csv"),
        F.size("readings").cast("bigint").alias("n_readings"),
        F.col("level").cast("bigint").alias("level"),
        "created",
        "job_id",
    )
    return _finish(out, base)


def _oracle_lifecycle_array_trend() -> str:
    eid = entity_id_duck_sql("node", "'node-' || user_id")
    return f"""
WITH agg AS (
  SELECT user_id, ts,
         min(CAST(floor(value) AS BIGINT)) AS lo,
         max(CAST(floor(value) AS BIGINT)) AS hi,
         count(*) AS n
  FROM events
  GROUP BY user_id, ts
)
SELECT {eid} AS entity_id,
       ts AS timestamp,
       CASE WHEN user_id % 3 = 0
            THEN (hi * 2) || ',' || n
            ELSE lo || ',' || hi || ',' || n END AS readings_csv,
       CAST(CASE WHEN user_id % 3 = 0 THEN 2 ELSE 3 END AS BIGINT)
           AS n_readings,
       CAST(n AS BIGINT) AS level,
       CASE WHEN user_id % 3 = 0 THEN TIMESTAMP '{_C2:%Y-%m-%d %H:%M:%S}'
            ELSE TIMESTAMP '{_C1:%Y-%m-%d %H:%M:%S}' END AS created,
       CAST(CASE WHEN user_id % 3 = 0 THEN 3002 ELSE 3001 END AS BIGINT)
           AS job_id
FROM agg
"""


# =====================================================================
# registry
# =====================================================================
def lifecycle_queries() -> dict:
    return {
        "lifecycle_load_store": q_lifecycle_load_store,
        "lifecycle_job_log": q_lifecycle_job_log,
        "lifecycle_materialize": q_lifecycle_materialize,
        "lifecycle_schema_evolution": q_lifecycle_schema_evolution,
        "ladder_compile": q_ladder_compile,
        "lifecycle_attr_store": q_lifecycle_attr_store,
        "lifecycle_notification": q_lifecycle_notification,
        "lifecycle_retention": q_lifecycle_retention,
        "select_builder": q_select_builder,
        "timestamp_mapping": q_timestamp_mapping,
        "entity_dim_register": q_entity_dim_register,
        "live_monitor": q_live_monitor,
        "lifecycle_array_trend": q_lifecycle_array_trend,
    }


def lifecycle_oracles() -> dict[str, str]:
    return {
        "lifecycle_load_store": _oracle_lifecycle_load_store(),
        "lifecycle_job_log": _ORACLE_JOB_LOG,
        "lifecycle_materialize": _oracle_lifecycle_materialize(),
        "lifecycle_schema_evolution": _oracle_lifecycle_schema_evolution(),
        "ladder_compile": _ORACLE_LADDER_COMPILE,
        "lifecycle_attr_store": _oracle_lifecycle_attr_store(),
        "lifecycle_notification": _oracle_lifecycle_notification(),
        "lifecycle_retention": _oracle_lifecycle_retention(),
        "select_builder": _oracle_select_builder(),
        "timestamp_mapping": _oracle_timestamp_mapping(),
        "entity_dim_register": _oracle_entity_dim_register(),
        "live_monitor": _oracle_live_monitor(),
        "lifecycle_array_trend": _oracle_lifecycle_array_trend(),
    }
