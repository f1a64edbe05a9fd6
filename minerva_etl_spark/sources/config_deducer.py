"""Trend-store config deduction from a sample harvest file.

Reference (`/root/reference/src/minerva/harvest/trend_config_deducer.py:9-47`
+ `commands/trend_store.py deduce`): parse a sample file, collect the
distinct trend descriptors, and emit a trend-store YAML skeleton with
placeholder identity fields for the operator to fill in.

Spark mapping: the column set and data types come from the CSV
deduction ladder (`sources/csv_harvest.deduce_csv_schema` — the same
parser the real ingest uses, so the deduced config always loads)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from minerva_etl_spark.catalog.granularity import DEFAULT_PARTITION_SIZE
from minerva_etl_spark.sources.csv_harvest import CsvParserConfig, deduce_csv_schema


def deduce_config(
    spark: SparkSession,
    file_path: str,
    parser_config: CsvParserConfig,
    data_source: str = "DATASOURCE",
    entity_type: str = "ENTITYTYPE",
    granularity: str | None = None,
    part_name: str | None = None,
) -> dict:
    """Deduce a trend-store definition dict (YAML shape) from a sample
    file.  Placeholder identity fields mirror the reference's output;
    pass real values to emit a load-ready definition."""
    types = deduce_csv_schema(spark, file_path, parser_config)
    gran = granularity or str(parser_config.granularity)
    return {
        "data_source": data_source,
        "entity_type": entity_type,
        "granularity": gran,
        "partition_size": DEFAULT_PARTITION_SIZE.get(gran, "1d"),
        "parts": [
            {
                "name": part_name or "PART",
                "trends": [
                    {
                        "name": name,
                        "data_type": dtype.name,
                        "time_aggregation": "sum",
                        "entity_aggregation": "sum",
                    }
                    for name, dtype in types.items()
                ],
            }
        ],
    }


def write_config(config: dict, out_path: str) -> str:
    import yaml

    with open(out_path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
    return out_path
