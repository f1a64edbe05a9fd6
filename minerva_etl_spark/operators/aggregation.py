"""Time- and entity-aggregation: the core generated-query semantics.

Reference behavior being reproduced (not its implementation):

- **Time aggregation** (`aggregation_compilation.py:684-745`): roll a
  trend store up to a coarser granularity.  For each entity and each
  target period, aggregate all source rows whose timestamp falls in the
  half-open window ``(end - granularity, end]`` — timestamps label the
  *end* of a period.  A ``samples = count(*)`` column is auto-injected if
  not already present (`:716-718`); further roll-ups of an existing
  ``samples`` column use ``sum`` (`:496-510`).
- **Entity aggregation** (`aggregation_compilation.py:332-365`): roll a
  trend store across the entity graph — join the fact to a relation
  (edge) table on ``entity_id = source_id`` and re-group by
  ``(timestamp, target_id)``.

Spark-first notes: both are single-shuffle groupBys; the relation table
is a small dimension and is broadcast.  Aggregations over floating
columns route through exact decimal sums (order-independent → stable
results under any partitioning / AQE re-plan), then cast back to the
declared result type.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from minerva_etl_spark.catalog.granularity import Granularity

#: decimal type used for exact, order-independent sums of double columns;
#: 18 integer digits / 6 fraction digits covers the fixture value ranges.
SUM_DECIMAL = "decimal(32,6)"


@dataclass(frozen=True)
class TrendAggSpec:
    """Aggregation declaration of one trend column (reference ``Trend``:
    `instance/__init__.py:43-69`, defaults SUM/SUM)."""

    column: str
    time_aggregation: str = "sum"
    entity_aggregation: str = "sum"
    alias: str | None = None
    #: declared result type (reference promoted type, A5); when set the
    #: aggregate is cast to it so catalog and stored data agree
    result_type: str | None = None

    @property
    def out_name(self) -> str:
        return self.alias or self.column


def _result_ddl(result_type: str | None) -> str | None:
    if result_type is None:
        return None
    from minerva_etl_spark.catalog.datatypes import spark_ddl

    return spark_ddl(result_type)


def _agg_column(
    aggregation: str,
    column: str,
    out_name: str,
    result_type: str | None = None,
) -> Column:
    """Build the aggregate expression for one trend column.

    Double-typed sums/avgs go through exact decimal accumulation so the
    result is independent of row order and partitioning (bit-for-bit
    reproducible at any scale/parallelism).  ``result_type`` (declared
    promoted type, `aggregation_compilation.py:396-414`) casts the final
    value so written data matches the generated store definition.
    """
    agg = aggregation.lower()
    col = F.col(column)
    ddl = _result_ddl(result_type)
    if agg == "sum":
        # cast the exact decimal accumulator straight to the declared
        # type (integer sums are exact; no double round-trip)
        out = F.sum(col.cast(SUM_DECIMAL)).cast(ddl or "double")
    elif agg in ("avg", "mean"):
        # exact decimal sum -> double, then one IEEE division: engine-
        # independent result (decimal *division* rules differ per engine)
        out = (
            F.sum(col.cast(SUM_DECIMAL)).cast("double")
            / F.count(F.when(col.isNotNull(), 1)).cast("double")
        )
        if ddl:
            out = out.cast(ddl)
    elif agg == "max":
        out = F.max(col)
    elif agg == "min":
        out = F.min(col)
    elif agg == "count":
        out = F.count(F.when(col.isNotNull(), 1)).cast(ddl or "bigint")
    elif agg == "first":
        out = F.first(col, ignorenulls=True)
    elif agg == "last":
        out = F.last(col, ignorenulls=True)
    else:
        raise ValueError(f"unsupported aggregation: {aggregation!r}")
    return out.alias(out_name)


def time_aggregate(
    source: DataFrame,
    granularity: str | Granularity,
    trends: list[TrendAggSpec],
    entity_col: str = "entity_id",
    timestamp_col: str = "timestamp",
    samples_col: str = "samples",
    inject_samples: bool = True,
) -> DataFrame:
    """Roll ``source`` up to ``granularity``: (start, end]-window groupBy.

    Output schema: ``(entity_col, timestamp_col, samples, <trends...>)``
    with ``timestamp_col`` holding the end-label of the target period.
    Single shuffle on (entity, bucket); map-side partial aggregation is
    automatic.
    """
    gran = Granularity.parse(granularity)
    bucket = F.expr(gran.bucket_end_spark_sql(timestamp_col))
    aggs: list[Column] = []
    if inject_samples and samples_col not in source.columns:
        # reference injects count(*) as samples (`:716-718`)
        aggs.append(F.count(F.lit(1)).cast("bigint").alias(samples_col))
    elif samples_col in source.columns:
        # roll-up of a roll-up: samples add up (`:496-510`)
        aggs.append(F.sum(samples_col).cast("bigint").alias(samples_col))
    aggs.extend(
        _agg_column(t.time_aggregation, t.column, t.out_name, t.result_type)
        for t in trends
    )
    return (
        source.groupBy(F.col(entity_col), bucket.alias(timestamp_col))
        .agg(*aggs)
    )


def entity_aggregate(
    source: DataFrame,
    relation: DataFrame,
    trends: list[TrendAggSpec],
    entity_col: str = "entity_id",
    timestamp_col: str = "timestamp",
    samples_col: str = "samples",
    relation_source_col: str = "source_id",
    relation_target_col: str = "target_id",
    broadcast_relation: bool = True,
) -> DataFrame:
    """Roll ``source`` across the entity graph defined by ``relation``.

    ``SELECT r.target_id AS entity_id, t.timestamp, count(*) AS samples,
    <agg(c)...> FROM t JOIN r ON t.entity_id = r.source_id GROUP BY
    timestamp, r.target_id`` (`aggregation_compilation.py:332-365`).

    The relation is an entity-graph edge list — small relative to the
    fact table — so it is broadcast: no shuffle of the fact for the join,
    one shuffle for the re-group.
    """
    rel = relation.select(
        F.col(relation_source_col).alias("__src_id"),
        F.col(relation_target_col).alias("__tgt_id"),
    )
    if broadcast_relation:
        rel = F.broadcast(rel)
    joined = source.join(rel, source[entity_col] == rel["__src_id"], "inner")
    aggs: list[Column] = []
    if samples_col not in source.columns:
        aggs.append(F.count(F.lit(1)).cast("bigint").alias(samples_col))
    else:
        aggs.append(F.sum(samples_col).cast("bigint").alias(samples_col))
    aggs.extend(
        _agg_column(t.entity_aggregation, t.column, t.out_name, t.result_type)
        for t in trends
    )
    return (
        joined.groupBy(
            F.col("__tgt_id").alias(entity_col), F.col(timestamp_col)
        ).agg(*aggs)
    )


# ---------------------------------------------------------------- SQL text
def time_aggregate_spark_sql(
    source_table: str,
    granularity: str | Granularity,
    trends: list[TrendAggSpec],
    entity_col: str = "entity_id",
    timestamp_col: str = "timestamp",
    samples_mode: str = "inject",
) -> str:
    """Spark SQL text equivalent of :func:`time_aggregate` — what the
    aggregation *compiler* emits into generated materialization YAML
    (the analog of the reference's generated plpgsql,
    `aggregation_compilation.py:684-745`)."""
    gran = Granularity.parse(granularity)
    bucket = gran.bucket_end_spark_sql(timestamp_col)
    parts = []
    if samples_mode == "inject":
        parts.append("CAST(count(*) AS BIGINT) AS samples")
    elif samples_mode == "rollup":
        parts.append("CAST(SUM(samples) AS BIGINT) AS samples")
    for t in trends:
        parts.append(
            _spark_agg_sql(t.time_aggregation, t.column, t.out_name, t.result_type)
        )
    select = ",\n       ".join(parts)
    return (
        f"SELECT {entity_col} AS entity_id, {bucket} AS {timestamp_col},\n"
        f"       {select}\n"
        f"FROM {source_table}\n"
        f"GROUP BY {entity_col}, {bucket}"
    )


def _spark_agg_sql(
    aggregation: str,
    column: str,
    out_name: str,
    result_type: str | None = None,
) -> str:
    agg = aggregation.lower()
    quoted = f"`{column}`"
    ddl = _result_ddl(result_type)
    if agg == "sum":
        return (
            f"CAST(SUM(CAST({quoted} AS {SUM_DECIMAL})) AS {ddl or 'DOUBLE'})"
            f" AS {out_name}"
        )
    if agg in ("avg", "mean"):
        core = (
            f"(CAST(SUM(CAST({quoted} AS {SUM_DECIMAL})) AS DOUBLE) / "
            f"CAST(COUNT({quoted}) AS DOUBLE))"
        )
        return (
            f"CAST({core} AS {ddl}) AS {out_name}" if ddl
            else f"{core} AS {out_name}"
        )
    if agg == "max":
        return f"MAX({quoted}) AS {out_name}"
    if agg == "min":
        return f"MIN({quoted}) AS {out_name}"
    if agg == "count":
        return f"CAST(COUNT({quoted}) AS {ddl or 'BIGINT'}) AS {out_name}"
    raise ValueError(f"unsupported aggregation: {aggregation!r}")
def time_aggregate_oracle_sql(
    source_table: str,
    granularity: str | Granularity,
    trends: list[TrendAggSpec],
    entity_col: str = "entity_id",
    timestamp_col: str = "timestamp",
    samples_mode: str = "inject",
) -> str:
    """ANSI/DuckDB oracle equivalent of :func:`time_aggregate` (used by
    the correctness gate and as documentation of the exact semantics).

    ``samples_mode``: 'inject' = count(*) (first rung), 'rollup' =
    SUM(samples) (second rung), 'none'.
    """
    gran = Granularity.parse(granularity)
    bucket = gran.bucket_end_ansi_sql(timestamp_col)
    parts = []
    if samples_mode == "inject":
        parts.append("CAST(count(*) AS BIGINT) AS samples")
    elif samples_mode == "rollup":
        parts.append("CAST(SUM(samples) AS BIGINT) AS samples")
    for t in trends:
        parts.append(_oracle_agg_sql(t.time_aggregation, t.column, t.out_name))
    select = ",\n       ".join(parts)
    return (
        f"SELECT {entity_col}, {bucket} AS {timestamp_col},\n"
        f"       {select}\n"
        f"FROM {source_table}\n"
        f"GROUP BY {entity_col}, {bucket}"
    )


def _oracle_agg_sql(aggregation: str, column: str, out_name: str) -> str:
    agg = aggregation.lower()
    if agg == "sum":
        return (
            f"CAST(SUM(CAST({column} AS {SUM_DECIMAL.upper()})) AS DOUBLE)"
            f" AS {out_name}"
        )
    if agg in ("avg", "mean"):
        return (
            f"(CAST(SUM(CAST({column} AS {SUM_DECIMAL.upper()})) AS DOUBLE) / "
            f"CAST(COUNT({column}) AS DOUBLE)) AS {out_name}"
        )
    if agg == "max":
        return f"MAX({column}) AS {out_name}"
    if agg == "min":
        return f"MIN({column}) AS {out_name}"
    if agg == "count":
        return f"CAST(COUNT({column}) AS BIGINT) AS {out_name}"
    raise ValueError(f"unsupported aggregation: {aggregation!r}")
