"""Gate rows: trend/attribute/KPI engine lifecycle + TPC-H-ish reporting arc.

Mechanically split out of gate.py (r14); see gate.py for the registry.
"""
from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from minerva_etl_spark.catalog import directory
from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.operators import asof
from minerva_etl_spark.operators import dedup as D
from minerva_etl_spark.operators import multimodal as M
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.trigger import trigger as trigger_mod
from minerva_etl_spark.operators import kmeans as KM
from minerva_etl_spark.operators import similarity as S
from minerva_etl_spark.operators import skew as SK
from minerva_etl_spark.operators import split as SPL
from minerva_etl_spark.operators import text as X
from minerva_etl_spark.operators.aggregation import (
    TrendAggSpec,
    entity_aggregate,
    time_aggregate,
    time_aggregate_oracle_sql,
    _oracle_agg_sql,
)
from minerva_etl_spark.operators.attribute import compact_history, latest_per_entity
from minerva_etl_spark.operators.upsert import dedup_last_wins, insert_missing, merge_packages
from minerva_etl_spark.sources.tables import load_table

from minerva_etl_spark.gate_common import (
    _EV_SPECS,
    _prep,
)



def q_trend_time_agg_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 time aggregation: events rolled to 1h, (start, end] windows."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return time_aggregate(ev, "1h", _EV_SPECS, entity_col="user_id", timestamp_col="ts")


def _oracle_time_agg_1h() -> str:
    return time_aggregate_oracle_sql(
        "events", "1h", _EV_SPECS, entity_col="user_id", timestamp_col="ts"
    )


_ROLLUP_SPECS = [
    TrendAggSpec("sum_value", "sum", alias="sum_value"),
    TrendAggSpec("max_value", "max", alias="max_value"),
]


def q_trend_time_agg_1d_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A3: second-rung roll-up 1h→1d; samples columns sum up."""
    _prep(spark)
    hourly = q_trend_time_agg_1h(spark, sf_dir)
    return time_aggregate(
        hourly, "1d", _ROLLUP_SPECS, entity_col="user_id", timestamp_col="ts"
    )


def _oracle_time_agg_1d_rollup() -> str:
    hourly = _oracle_time_agg_1h()
    daily = time_aggregate_oracle_sql(
        "hourly", "1d", _ROLLUP_SPECS, entity_col="user_id", timestamp_col="ts",
        samples_mode="rollup",
    )
    return f"WITH hourly AS (\n{hourly}\n)\n{daily}"


_ORD_SPECS = [TrendAggSpec("o_totalprice", "sum", alias="sum_total")]


def q_trend_time_agg_1month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W4 calendar granularity: orders per customer per month-end."""
    _prep(spark)
    orders = load_table(spark, sf_dir, "orders")
    return time_aggregate(
        orders, "1month", _ORD_SPECS, entity_col="o_custkey", timestamp_col="o_orderdate"
    )


def _oracle_time_agg_1month() -> str:
    return time_aggregate_oracle_sql(
        "orders", "1month", _ORD_SPECS,
        entity_col="o_custkey", timestamp_col="o_orderdate",
    )


_ORD_SPECS_STAGE2 = [TrendAggSpec("sum_total", "sum", alias="sum_total")]


def q_trend_time_agg_3month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A4/W4 multi-month granularity: the 1month orders trend rolled
    up to quarter-end labels — exercises the >1-month bucket grid SQL
    (the reference accepts any relativedelta granularity,
    `granularity.py:97-152`); samples columns sum up the ladder."""
    _prep(spark)
    monthly = q_trend_time_agg_1month(spark, sf_dir)
    return time_aggregate(
        monthly, "3month", _ORD_SPECS_STAGE2,
        entity_col="o_custkey", timestamp_col="o_orderdate",
    )


def _oracle_time_agg_3month() -> str:
    monthly = _oracle_time_agg_1month()
    quarterly = time_aggregate_oracle_sql(
        "monthly", "3month", _ORD_SPECS_STAGE2,
        entity_col="o_custkey", timestamp_col="o_orderdate",
        samples_mode="rollup",
    )
    return f"WITH monthly AS (\n{monthly}\n)\n{quarterly}"


_LI_SPECS = [
    TrendAggSpec("l_quantity", "sum", "sum", alias="sum_qty"),
    TrendAggSpec("l_extendedprice", "sum", "sum", alias="sum_price"),
]
# second rung operates on the first rung's aliased outputs
_LI_SPECS_STAGE2 = [
    TrendAggSpec("sum_qty", "sum", "sum", alias="sum_qty"),
    TrendAggSpec("sum_price", "sum", "sum", alias="sum_price"),
]


def q_entity_agg_nation_1month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/J1: lineitem per supplier per month, rolled across the entity
    graph supplier→nation (relation join + re-group; relation broadcast)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    monthly = time_aggregate(
        li, "1month", _LI_SPECS, entity_col="l_suppkey", timestamp_col="l_shipdate"
    )
    relation = supplier.select(
        F.col("s_suppkey").alias("source_id"),
        F.col("s_nationkey").cast("bigint").alias("target_id"),
    )
    out = entity_aggregate(
        monthly, relation, _LI_SPECS_STAGE2,
        entity_col="l_suppkey", timestamp_col="l_shipdate",
    )
    return out.select(
        F.col("l_suppkey").alias("nation_id"),
        F.col("l_shipdate").alias("month_end"),
        "samples", "sum_qty", "sum_price",
    )


def _oracle_entity_agg_nation_1month() -> str:
    monthly = time_aggregate_oracle_sql(
        "lineitem", "1month", _LI_SPECS,
        entity_col="l_suppkey", timestamp_col="l_shipdate",
    )
    inner_aggs = ",\n       ".join(
        _oracle_agg_sql(t.entity_aggregation, f"m.{t.column}", t.out_name)
        for t in _LI_SPECS_STAGE2
    )
    return f"""
WITH monthly AS (
{monthly}
)
SELECT CAST(s.s_nationkey AS BIGINT) AS nation_id,
       m.l_shipdate AS month_end,
       CAST(SUM(m.samples) AS BIGINT) AS samples,
       {inner_aggs}
FROM monthly m JOIN supplier s ON m.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


def q_kpi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 generated-trend projection: arithmetic KPI expressions
    (reference `hub-kpi_node_15m.yaml` power_kwh*1000 analog)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (F.lit(1.0) + F.col("l_tax"))).alias("charge"),
    )


_ORACLE_KPI = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS revenue,
       (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge
FROM lineitem
"""


# =====================================================================
# Upsert / SCD / package ops (SURVEY S6-S8, A7-A9, W1-W3, U1-U2)
# =====================================================================
def q_upsert_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/J4 upsert key-match semantics: last write per key wins
    (key = (user_id, event_type), write order = (ts, event_id))."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return dedup_last_wins(
        ev.select("user_id", "event_type", "ts", "event_id", "value"),
        keys=["user_id", "event_type"],
        order_col="ts",
        tiebreak_cols=["event_id"],
    )


_ORACLE_UPSERT = """
SELECT user_id, event_type, ts, event_id, value FROM (
  SELECT user_id, event_type, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_attr_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/W2 SCD compact: keep only change points of event_type per user."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return compact_history(
        ev.select("user_id", "ts", "event_id", "event_type"),
        value_cols=["event_type"],
        entity_col="user_id",
        timestamp_col="ts",
        tiebreak_cols=["event_id"],
    )


_ORACLE_COMPACT = """
SELECT user_id, ts, event_id, event_type FROM (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
"""


def q_attr_curr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W1 curr-ptr: latest attribute row per entity."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return latest_per_entity(
        ev.select("user_id", "ts", "event_id", "event_type", "value"),
        entity_col="user_id",
        timestamp_col="ts",
        tiebreak_cols=["event_id"],
    )


_ORACLE_CURR = """
SELECT user_id, ts, event_id, event_type, value FROM (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_package_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/U1 package merge: two metric packages (clicks, purchases)
    union-merged by (entity, timestamp), nulls filled column-wise."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    click = time_aggregate(
        ev.filter(F.col("event_type") == "click"),
        "1d", [TrendAggSpec("value", "sum", alias="click_value")],
        entity_col="user_id", timestamp_col="ts", inject_samples=False,
    )
    purchase = time_aggregate(
        ev.filter(F.col("event_type") == "purchase"),
        "1d", [TrendAggSpec("value", "sum", alias="purchase_value")],
        entity_col="user_id", timestamp_col="ts", inject_samples=False,
    )
    return merge_packages([click, purchase], keys=["user_id", "ts"])


def _oracle_package_merge() -> str:
    gran = Granularity.parse("1d")
    bucket = gran.bucket_end_ansi_sql("ts")
    return f"""
WITH click AS (
  SELECT user_id, {bucket} AS ts,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), purchase AS (
  SELECT user_id, {bucket} AS ts,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       coalesce(c.ts, p.ts) AS ts,
       c.click_value, p.purchase_value
FROM click c FULL OUTER JOIN purchase p
  ON c.user_id = p.user_id AND c.ts = p.ts
"""


def q_anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J9/U2 left-anti 'missing rows': customers with no orders."""
    _prep(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return insert_missing(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        customer.select("c_custkey", "c_name"),
        keys=["c_custkey"],
    )


_ORACLE_ANTI = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_dn_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinguished-name functions (`distinguishedname.py:12-56`):
    build 'region=R,nation=N' strings, parse type/name of last part and
    the parent part back out (entity type = last component)."""
    _prep(spark)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dn = F.concat(
        F.lit("region="), F.col("r_name"), F.lit(",nation="), F.col("n_name")
    )
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_nationkey"),
            dn.alias("dn"),
            F.regexp_extract(dn, r"([^,=]+)=([^,]+)$", 1).alias("entity_type"),
            F.regexp_extract(dn, r"([^,=]+)=([^,]+)$", 2).alias("entity_name"),
            F.regexp_extract(dn, r"^([^,=]+)=([^,]+)", 2).alias("parent_name"),
        )
    )


_ORACLE_DN = r"""
SELECT n_nationkey,
       'region=' || r_name || ',nation=' || n_name AS dn,
       regexp_extract('region=' || r_name || ',nation=' || n_name,
                      '([^,=]+)=([^,]+)$', 1) AS entity_type,
       regexp_extract('region=' || r_name || ',nation=' || n_name,
                      '([^,=]+)=([^,]+)$', 2) AS entity_name,
       regexp_extract('region=' || r_name || ',nation=' || n_name,
                      '^([^,=]+)=([^,]+)', 2) AS parent_name
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_report_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 report aggregates: counts / distinct entities / ts range."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.sum(F.col("value").cast("decimal(32,6)")).cast("double").alias("sum_value"),
    )


_ORACLE_REPORT = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       min(ts) AS min_ts,
       max(ts) AS max_ts,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


def q_series_fill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/J6 timestamp-series left join (fingerprint 'modified' shape):
    dense hour series over the data range, bucket counts, gaps as 0."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    gran = Granularity.parse("1h")
    bucket = F.expr(gran.bucket_end_spark_sql("ts"))
    hourly = ev.groupBy(bucket.alias("ts")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    bounds = hourly.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    series = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("ts")
    )
    return series.join(hourly, "ts", "left").select(
        "ts", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events")
    )


def _oracle_series_fill() -> str:
    gran = Granularity.parse("1h")
    bucket = gran.bucket_end_ansi_sql("ts")
    return f"""
WITH hourly AS (
  SELECT {bucket} AS ts, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), bounds AS (
  SELECT min(ts) AS lo, max(ts) AS hi FROM hourly
), series AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts FROM bounds
)
SELECT s.ts, CAST(coalesce(h.n, 0) AS BIGINT) AS n_events
FROM series s LEFT JOIN hourly h ON s.ts = h.ts
"""


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC lake-format round trip (`sources/plugins.py::_orc_reader`,
    the S2 harvest-plugin family): the documents table is written as
    ORC in-row (Spark's native writer — no extra package) and read
    back through the registered ``orc`` harvest plugin, proving the
    second-most-common columnar lake format flows through the same
    `get_plugin` dispatch the CSV/JSONL/parquet/WARC/archive sources
    use.  Values must survive the format conversion bit-exactly — the
    oracle reads the ORIGINAL parquet, so any ORC writer/reader value
    or type drift hash-mismatches."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.sources.plugins import get_plugin

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_orc_")
    path = root + "/documents_orc"
    docs.write.mode("overwrite").orc(path)
    out = (
        get_plugin("orc")(spark, path, None)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


_ORACLE_ORC_ROUNDTRIP = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


# =====================================================================
# Directory / relations / triggers / translator / deduction / streaming
# =====================================================================
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 name→id lookup: deterministic engine-independent entity ids
    for customer names (md5 method; production default is xxhash64 —
    same plan, faster hash)."""
    _prep(spark)
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        "c_name",
        directory.entity_id_col("customer", "c_name", method="md5").alias(
            "entity_id"
        ),
    )


def _oracle_entity_resolution() -> str:
    eid = directory.entity_id_duck_sql("customer", "c_name")
    return f"SELECT c_custkey, c_name, {eid} AS entity_id FROM customer"


def q_relation_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 relation-by-regex + A2: parts roll up to their last-word
    'virtual entity' (reference node→v-site prefix relation shape);
    lineitem aggregates across that relation."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    relation = part.select(
        F.col("p_partkey").alias("source_id"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("target_id"),
    )
    joined = li.join(
        F.broadcast(relation), li.l_partkey == relation.source_id
    )
    return joined.groupBy(F.col("target_id").alias("part_kind")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(32,6)")).cast("double").alias(
            "sum_qty"
        ),
    )


_ORACLE_RELATION_REGEX = r"""
SELECT regexp_extract(p.p_name, '([a-z]+)$', 1) AS part_kind,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(32,6))) AS DOUBLE) AS sum_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""


def q_trigger_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 trigger: hourly KPI vs threshold → notification rows."""
    _prep(spark)

    def kpi(spark_, _timestamps):
        ev = load_table(spark_, sf_dir, "events")
        return time_aggregate(
            ev, "1h",
            [TrendAggSpec("value", "sum", alias="sum_value")],
            entity_col="user_id", timestamp_col="ts",
        ).select(
            F.col("user_id").alias("entity_id"),
            F.col("ts").alias("timestamp"),
            "sum_value",
        )

    trig = trigger_mod.Trigger(
        name="HighHourlyValue",
        kpi=kpi,
        thresholds={"max_value": 400.0},
        condition="sum_value > max_value",
        weight="100",
        notification_message="concat('hourly value ', sum_value)",
        notification_data="cast(round(sum_value, 6) as string)",
    )
    return trig.evaluate(spark, [])


def _oracle_trigger_eval() -> str:
    gran = Granularity.parse("1h")
    bucket = gran.bucket_end_ansi_sql("ts")
    return f"""
WITH kpi AS (
  SELECT user_id AS entity_id, {bucket} AS timestamp,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT entity_id, timestamp,
       'HighHourlyValue' AS rule,
       CAST(100 AS INTEGER) AS weight,
       'hourly value ' || CAST(sum_value AS VARCHAR) AS details,
       CAST(round(sum_value, 6) AS VARCHAR) AS data
FROM kpi WHERE sum_value > 400.0
"""


def q_kpi_translated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG→Spark translator path (X2/§2.8): a user-supplied PG KPI
    expression executes through translate()."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    pg_expr = "(value * 1000)::double precision"
    spark_expr = translate(pg_expr)
    return ev.select(
        "event_id", F.expr(spark_expr).alias("value_scaled")
    )


_ORACLE_KPI_TRANSLATED = """
SELECT event_id, CAST(value * 1000 AS DOUBLE) AS value_scaled FROM events
"""


def q_type_deduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 type-deduction ladder applied to string values (the JSON
    `props.k` field of events), counting values per deduced type."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    v = F.get_json_object("props", "$.k")
    deduced = (
        F.when(v.isNull() | (v == ""), F.lit(None))
        .when(
            v.rlike(r"^[+-]?\d+$"),
            F.when(F.abs(v.cast("bigint")) <= 32767, "smallint")
            .when(F.abs(v.cast("bigint")) <= 2147483647, "integer")
            .otherwise("bigint"),
        )
        .when(v.rlike(r"^[+-]?(\d+\.\d*|\.\d+)$"), F.lit("real"))
        .otherwise(F.lit("text"))
    )
    return (
        ev.select(deduced.alias("deduced_type"))
        .groupBy("deduced_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


_ORACLE_TYPE_DEDUCTION = r"""
WITH vals AS (
  SELECT json_extract_string(props, '$.k') AS v FROM events
), classed AS (
  SELECT CASE
    WHEN v IS NULL OR v = '' THEN NULL
    WHEN regexp_full_match(v, '[+-]?\d+') THEN
      CASE WHEN abs(CAST(v AS BIGINT)) <= 32767 THEN 'smallint'
           WHEN abs(CAST(v AS BIGINT)) <= 2147483647 THEN 'integer'
           ELSE 'bigint' END
    WHEN regexp_full_match(v, '[+-]?(\d+\.\d*|\.\d+)') THEN 'real'
    ELSE 'text' END AS deduced_type
  FROM vals
)
SELECT deduced_type, CAST(count(*) AS BIGINT) AS n
FROM classed GROUP BY deduced_type
"""


def q_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/T6 Structured Streaming: tumbling-window hourly aggregation of
    the events table driven through a streaming query (availableNow
    semantics via processAllAvailable on a memory sink).

    Window semantics here are Spark's native [start, end) (label =
    window end); the oracle mirrors that — the Minerva (start, end]
    labeling is covered by the batch queries.
    """
    _prep(spark)
    import os
    import uuid

    # FileStreamSource needs a directory; stage a symlink to the fixture
    stage_dir = f"/tmp/minerva_stream_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(stage_dir, exist_ok=True)
    link = os.path.join(stage_dir, "events.parquet")
    target = os.path.abspath(f"{sf_dir}/events.parquet")
    if os.path.islink(link) and os.readlink(link) != target:
        os.unlink(link)  # stale link from a prior fixture
    if not os.path.exists(link):
        os.symlink(target, link)

    # Derive the stream read schema from the actual fixture (a batch
    # read infers it); hardcoding it regressed once when the fixture
    # switched ts from epoch-millis bigint to a parquet TIMESTAMP.
    raw_schema = spark.read.parquet(stage_dir).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(stage_dir)
    )
    ts_type = raw_schema["ts"].dataType.simpleString()
    if ts_type in ("bigint", "long"):
        # legacy fixtures: ts as epoch milliseconds
        stream = stream.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts * 1000) as timestamp)")
        )
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("samples"),
            F.sum(F.col("value").cast("decimal(32,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("user_id"),
            F.col("window.end").cast("timestamp_ntz").alias("ts"),
            "samples",
            "sum_value",
        )
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _oracle_streaming_hourly() -> str:
    # [start, end) tumbling windows labeled by end (Spark F.window)
    return """
SELECT user_id,
       make_timestamp(((epoch_us(ts) // 3600000000) * 3600000000)
                      + 3600000000) AS ts,
       CAST(count(*) AS BIGINT) AS samples,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# =====================================================================
# Time-series extensions: as-of join, sessionization, rollup, arrays
# =====================================================================
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks up the customer's latest
    order at-or-before the event time (window-merge plan, one shuffle —
    see operators/asof.py)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    # dedupe right side to one row per (key, ts): greatest orderkey wins
    # (as-of over duplicate timestamps would be pick-ambiguous)
    o = dedup_last_wins(
        orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        keys=["o_custkey", "o_orderdate"],
        order_col="o_orderkey",
    )
    out = asof.asof_join(
        ev,
        o.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


_ORACLE_ASOF = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey AS last_orderkey,
       o.o_totalprice AS last_totalprice
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) + per-session stats."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    sessions = asof.sessionize(
        ev.select("user_id", "ts", "event_id", "value"),
        key_col="user_id", ts_col="ts", gap_seconds=1800,
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(32,6)")).cast("double").alias(
            "sum_value"
        ),
    )


_ORACLE_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
FROM numbered GROUP BY 1, 2
"""


def q_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (event_type, day) — beyond the reference's
    generated SQL, standard Spark/DuckDB shape."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "day", F.expr("cast(date_trunc('day', ts) as timestamp_ntz)")
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(32,6)")).cast("double").alias(
                "sum_value"
            ),
        )
    )


_ORACLE_ROLLUP = """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP(event_type, date_trunc('day', ts))
"""


def q_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5 membership + array-containment (@>, <@) over per-user
    event-type sets."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    sets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    want = F.array(F.lit("click"), F.lit("purchase"))
    return sets.select(
        "user_id",
        F.array_contains("types", "purchase").alias("has_purchase"),
        # types @> ['click','purchase']
        (F.size(F.array_except(want, F.col("types"))) == 0).alias(
            "covers_click_purchase"
        ),
        # types <@ full set
        (
            F.size(
                F.array_except(
                    F.col("types"),
                    F.array(*[F.lit(x) for x in
                              ["click", "error", "purchase", "signup", "view"]]),
                )
            ) == 0
        ).alias("subset_of_known"),
        F.size("types").cast("bigint").alias("n_types"),
    )


_ORACLE_ARRAY_PRED = """
WITH sets AS (
  SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
  FROM events GROUP BY user_id
)
SELECT user_id,
       list_contains(types, 'purchase') AS has_purchase,
       len(list_filter(['click', 'purchase'],
           x -> NOT list_contains(types, x))) = 0 AS covers_click_purchase,
       len(list_filter(types,
           x -> NOT list_contains(['click','error','purchase','signup','view'], x)))
         = 0 AS subset_of_known,
       CAST(len(types) AS BIGINT) AS n_types
FROM sets
"""


def q_topk_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 ORDER BY ... DESC LIMIT n (newest-first, deterministic
    tiebreak) — TakeOrderedAndProject, no full sort."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(50)
    )


_ORACLE_TOPK = """
SELECT event_id, ts, user_id, event_type
FROM events ORDER BY ts DESC, event_id DESC LIMIT 50
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate groupBy with a pushed
    filter — the classic whole-stage-codegen pipeline."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(32,6)"
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(dec)).cast("double").alias(
                "sum_base_price"
            ),
            F.sum(disc.cast(dec)).cast("double").alias("sum_disc_price"),
            F.sum(
                (disc * (F.lit(1.0) + F.col("l_tax"))).cast(dec)
            ).cast("double").alias("sum_charge"),
            F.sum(F.col("l_discount").cast(dec)).cast("double").alias("sum_disc"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


_ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(32,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(32,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(32,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS DECIMAL(32,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_discount AS DECIMAL(32,6))) AS DOUBLE) AS sum_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filters, two joins (broadcast-able
    dims), aggregate, top-10."""
    _prep(spark)
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    dec = "decimal(32,6)"
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(dec)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_ORACLE_SHIPPING = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(32,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec analytics: running sum + 4-row moving average of event
    values per user (ROWS BETWEEN frames — beyond the reference's
    row_number/lag repertoire)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vdec = F.col("value").cast("decimal(32,6)")
    running = F.sum(vdec).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ).cast("double")
    moving = (
        F.sum(vdec).over(w.rowsBetween(-3, 0)).cast("double")
        / F.count(F.lit(1)).over(w.rowsBetween(-3, 0)).cast("double")
    )
    return ev.select(
        "user_id", "ts", "event_id",
        running.alias("running_sum"),
        moving.alias("moving_avg4"),
    )


_ORACLE_MOVING = """
SELECT user_id, ts, event_id,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(COUNT(*) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg4
FROM events
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user daily value sums, one column per event type."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("cast(date_trunc('day', ts) as timestamp_ntz)")
    return (
        ev.withColumn("day", day)
        .groupBy("user_id", "day")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum(F.col("value").cast("decimal(32,6)")).cast("double"))
    )


_ORACLE_PIVOT = """
SELECT user_id, date_trunc('day', ts) AS day,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) FILTER (event_type = 'click') AS DOUBLE) AS click,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) FILTER (event_type = 'error') AS DOUBLE) AS error,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) FILTER (event_type = 'purchase') AS DOUBLE) AS purchase,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) FILTER (event_type = 'signup') AS DOUBLE) AS signup,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) FILTER (event_type = 'view') AS DOUBLE) AS view
FROM events GROUP BY 1, 2
"""


def q_trend_time_agg_1d_dst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 DST-aware calendar buckets: daily roll-up in Europe/Amsterdam
    local time (reference truncates in local wall clock — day buckets
    are 23/25 h across DST transitions)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    gran = Granularity.parse("1d")
    bucket = F.expr(gran.bucket_end_local_spark_sql("ts", "Europe/Amsterdam"))
    return ev.groupBy("user_id", bucket.alias("ts")).agg(
        F.count(F.lit(1)).cast("bigint").alias("samples"),
        F.sum(F.col("value").cast("decimal(32,6)")).cast("double").alias(
            "sum_value"
        ),
    )


def _oracle_time_agg_1d_dst() -> str:
    gran = Granularity.parse("1d")
    bucket = gran.bucket_end_local_ansi_sql("ts", "Europe/Amsterdam")
    return f"""
SELECT user_id, {bucket} AS ts,
       CAST(count(*) AS BIGINT) AS samples,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 materialization function: per-entity least-squares trend slope
    via the NATIVE ``regr_slope``/``regr_intercept`` aggregates — JVM
    codegen, map-side combine, no Python in the hot path.  The
    applyInPandas mechanism demo lives in
    ``operators/regression.trend_slope_pandas`` (pytest-covered)."""
    _prep(spark)
    from minerva_etl_spark.operators.regression import trend_slope

    ev = load_table(spark, sf_dir, "events")
    return trend_slope(ev.select("user_id", "ts", "value"))


_ORACLE_SLOPE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(value, epoch_us(ts) / 3.6e9), 6) AS slope_per_hour,
       round(regr_intercept(value, epoch_us(ts) / 3.6e9), 6) AS intercept
FROM events GROUP BY user_id
"""


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ↔
    DuckDB `quantile_cont`, both linear; rounded to 6 dp because the
    interpolation arithmetic differs in last-bit order)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


_ORACLE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-way join down the region→nation→
    customer/supplier star with a same-nation predicate, grouped by
    nation.  Dims broadcast; one shuffle for the final group."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    dec = "decimal(32,6)"
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(dec)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


_ORACLE_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(32,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""
