"""CSV/TSV harvest source: parser-config driven ingest to the canonical
trend frame.

Reference behavior (`/root/reference/src/minerva/loading/csv/parser.py:29-100`
+ `harvest/trend_config_deducer.py:9-47`):

- a parser config names the identifier (entity) column, the timestamp
  column and format, the delimiter, and per-column data types;
- unknown column types are *deduced* from sampled values via the type
  ladder;
- the parser emits batches of ``(entity_ref, timestamp, values...)``.

Spark mapping: one ``spark.read.csv`` with explicit schema/casts — the
reference's 5000-row chunking is subsumed by partition parallelism; the
progress thread by the Spark UI.  Deduction samples via a bounded
driver-side read (the sample, not the data).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from minerva_etl_spark.catalog import datatypes as dt
from minerva_etl_spark.catalog.directory import names_to_entity_ids
from minerva_etl_spark.catalog.granularity import Granularity


@dataclass
class CsvParserConfig:
    """Mirror of the harvest parser config surface
    (`loading/csv/parser.py` config keys)."""

    identifier_column: str
    timestamp_column: str
    delimiter: str = ","
    timestamp_format: str | None = None  # None -> ISO / castable
    #: column -> minerva type name; missing columns are deduced
    column_types: dict[str, str] = field(default_factory=dict)
    entity_type: str = "entity"
    granularity: str | Granularity = "15m"
    null_value: str = ""
    #: entity-id hash method: 'xxhash64' (production) or 'md5'
    #: (engine-portable, used by oracle-checked queries)
    id_method: str = "xxhash64"


def deduce_frame_types(
    raw: DataFrame, config: CsvParserConfig, sample_rows: int = 1000
) -> dict[str, dt.DataType]:
    """Type deduction over a bounded sample of an all-strings frame
    (A10 / S1) using the reference ladder — not Spark's inferSchema,
    whose rules differ.  Shared by every harvest flavor that reads
    values as strings (CSV, JSON-lines)."""
    metric_cols = [
        c
        for c in raw.columns
        if c not in (config.identifier_column, config.timestamp_column)
        # declared columns never sample: their type is given, and a
        # declared-array JSONL column holds lists the string ladder
        # cannot fold
        and c not in config.column_types
    ]
    if metric_cols:
        sample = raw.select(metric_cols).limit(sample_rows).collect()
        rows = [[row[c] for c in metric_cols] for row in sample]
        types = (
            dt.deduce_data_types(rows) if rows else [dt.TEXT] * len(metric_cols)
        )
    else:
        types = []
    out = dict(zip(metric_cols, types))
    for col, name in config.column_types.items():
        if col in raw.columns:
            out[col] = dt.REGISTRY[name]
    return out


def deduce_csv_schema(
    spark: SparkSession, path: str, config: CsvParserConfig, sample_rows: int = 1000
) -> dict[str, dt.DataType]:
    raw = (
        spark.read.option("header", True)
        .option("delimiter", config.delimiter)
        .csv(path)
    )
    return deduce_frame_types(raw, config, sample_rows)


def normalize_frame(
    raw: DataFrame, config: CsvParserConfig, types: dict[str, dt.DataType]
) -> DataFrame:
    """All-strings frame → canonical typed trend frame (shared by the
    batch reader and the streaming ingest's foreachBatch)."""
    return _project(raw, config, types)


def read_csv_packages(
    spark: SparkSession, path: str, config: CsvParserConfig
) -> DataFrame:
    """Parse a harvest file into the canonical trend frame
    ``(entity_id, entity_ref, timestamp, <typed metrics...>)``."""
    raw = (
        spark.read.option("header", True)
        .option("delimiter", config.delimiter)
        .option("nullValue", config.null_value)
        .csv(path)
    )
    # deduce over the SAME reader frame — a separate deduce_csv_schema
    # read would re-instantiate the CSV source and pay a second
    # header/listing job per file (measured in the lifecycle job census)
    types = deduce_frame_types(raw, config)
    return _project(raw, config, types)


def read_jsonl_packages(
    spark: SparkSession, path: str, config: CsvParserConfig
) -> DataFrame:
    """JSON-lines harvest flavor: one JSON object per line, same parser
    config surface as CSV (identifier/timestamp columns, declared or
    deduced types).  ``primitivesAsString`` forces an all-strings read
    so the reference's type-ladder deduction applies identically — a
    JSONL file and its CSV twin load to the same typed frame.  The
    reference's plugin API makes formats pluggable
    (`harvest/plugins.py`); this is the second built-in flavor."""
    raw = (
        spark.read.option("primitivesAsString", True)
        .option("allowNonNumericNumbers", True)
        .json(path)
    )
    # primitivesAsString stringifies only primitives: a nested object or
    # array value still loads as a struct/array column, which the
    # string-ladder deduction cannot type.  The trend model is flat
    # (SURVEY §1.2: no maps/structs/nested arrays) — fail with the
    # offending column names instead of an AttributeError mid-sample.
    declared_arrays = {
        c
        for c, name in config.column_types.items()
        if isinstance(dt.REGISTRY[name].spark_type, T.ArrayType)
    }
    complex_cols = [
        f.name
        for f in raw.schema.fields
        if not isinstance(f.dataType, T.StringType)
        # a JSON array of primitives loads as array<string> under
        # primitivesAsString; if the column is DECLARED as an array
        # trend it casts element-wise in _project instead of failing
        and not (
            f.name in declared_arrays
            and isinstance(f.dataType, T.ArrayType)
            and isinstance(f.dataType.elementType, T.StringType)
        )
    ]
    if complex_cols:
        raise ValueError(
            "JSONL harvest requires flat records; non-scalar columns: "
            + ", ".join(sorted(complex_cols))
        )
    types = deduce_frame_types(raw, config)
    return _project(raw, config, types)


def _array_parse_sql(col: str, elem_ddl: str) -> str:
    """Parse the reference's array string syntax ``[a,b,c]``
    (`storage/datatype.py:781-787`: prefix ``[``, postfix ``]``,
    separator ``,``) into a typed Spark array.  ``[]`` is the empty
    array; unparseable elements become null (try_cast, matching the
    scalar null-marker behavior)."""
    body = f"btrim(`{col}`, '[]')"
    return (
        f"CASE WHEN `{col}` IS NULL THEN NULL "
        f"WHEN {body} = '' THEN array() "
        f"ELSE transform(split({body}, ','), "
        f"x -> try_cast(trim(x) AS {elem_ddl})) END"
    )


def _project(
    raw: DataFrame, config: CsvParserConfig, types: dict[str, dt.DataType]
) -> DataFrame:
    # try_* variants: malformed cells become null instead of failing the
    # load under ANSI mode (the COPY-protocol null-marker behavior)
    if config.timestamp_format:
        ts_parsed = F.expr(
            f"try_to_timestamp(`{config.timestamp_column}`, "
            f"'{config.timestamp_format}')"
        )
    else:
        ts_parsed = F.expr(f"try_to_timestamp(`{config.timestamp_column}`)")
    out = raw.select(
        F.col(config.identifier_column).alias("entity_ref"),
        ts_parsed.cast("timestamp_ntz").alias("timestamp"),
        *[
            (
                F.expr(
                    _array_parse_sql(
                        c, types[c].spark_type.elementType.simpleString()
                    )
                ).alias(c)
                if isinstance(types[c].spark_type, T.ArrayType)
                and isinstance(raw.schema[c].dataType, T.StringType)
                else F.expr(
                    f"try_cast(`{c}` AS {types[c].spark_type.simpleString()})"
                ).alias(c)
            )
            for c in raw.columns
            if c not in (config.identifier_column, config.timestamp_column)
        ],
    )
    return names_to_entity_ids(
        out, config.entity_type, "entity_ref", method=config.id_method
    )
