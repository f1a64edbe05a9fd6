"""Harvest plugin registry: pluggable file-format parsers.

Reference (`/root/reference/src/minerva/harvest/plugins.py`,
`plugin_api_trend.py`): parsers are discovered by entry point and expose
``create_parser(config)`` / ``load_packages(stream, name)``.

Here a plugin is any callable ``(spark, path, config) -> DataFrame``
returning the canonical trend frame; the registry maps file-type names
to callables.  Entry-point discovery is honored when the environment
provides it, else plugins register directly.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

ReaderFn = Callable[..., DataFrame]

_REGISTRY: dict[str, ReaderFn] = {}


def register_plugin(file_type: str, reader: ReaderFn) -> None:
    _REGISTRY[file_type] = reader


def get_plugin(file_type: str) -> ReaderFn:
    if file_type not in _REGISTRY:
        _load_entry_points()
    try:
        return _REGISTRY[file_type]
    except KeyError:
        raise KeyError(
            f"no harvest plugin for file type {file_type!r}; "
            f"registered: {sorted(_REGISTRY)}"
        ) from None


def list_plugins() -> list[str]:
    _load_entry_points()
    return sorted(_REGISTRY)


def _load_entry_points() -> None:
    # built-in self-registering sources (warc, tar/zip archives) are
    # imported lazily here so `get_plugin('warc'|'tar'|'zip')` works on
    # EVERY code path (load-data CLI included), not only ones that
    # happen to import those modules first
    import importlib

    for mod in (
        "minerva_etl_spark.sources.warc",
        "minerva_etl_spark.sources.archive",
        "minerva_etl_spark.sources.wet",
        "minerva_etl_spark.sources.cdx",
    ):
        try:
            importlib.import_module(mod)
        except Exception:  # surface the root cause: a swallowed
            import logging  # ImportError here turns into a baffling
            # "no harvest plugin for 'tar'" KeyError downstream

            logging.getLogger(__name__).warning(
                "built-in harvest plugin module %s failed to import",
                mod,
                exc_info=True,
            )
    try:  # entry-point discovery, as in the reference
        from importlib.metadata import entry_points

        for ep in entry_points(group="minerva_etl_spark.harvest"):
            _REGISTRY.setdefault(ep.name, ep.load())
    except Exception:
        pass


# ---------------------------------------------------------------- built-ins
def _csv_reader(spark: SparkSession, path: str, config) -> DataFrame:
    from minerva_etl_spark.sources.csv_harvest import (
        CsvParserConfig,
        read_csv_packages,
    )

    if isinstance(config, dict):
        config = CsvParserConfig(**config)
    return read_csv_packages(spark, path, config)


def _parquet_reader(spark: SparkSession, path: str, config) -> DataFrame:
    return spark.read.parquet(path)


def _jsonl_reader(spark: SparkSession, path: str, config) -> DataFrame:
    from minerva_etl_spark.sources.csv_harvest import (
        CsvParserConfig,
        read_jsonl_packages,
    )

    if isinstance(config, dict):
        config = {k: v for k, v in config.items() if k != "delimiter"}
        config = CsvParserConfig(**config)
    return read_jsonl_packages(spark, path, config)


def _orc_reader(spark: SparkSession, path: str, config) -> DataFrame:
    # ORC is Spark-native (no extra package) and the second-most
    # common columnar lake format after parquet — a harvest source,
    # not just an export target.  Predicate pushdown / column pruning
    # reach the ORC scan exactly as they do for parquet.
    return spark.read.orc(path)


register_plugin("csv", _csv_reader)
register_plugin("parquet", _parquet_reader)
register_plugin("jsonl", _jsonl_reader)
register_plugin("json", _jsonl_reader)
register_plugin("orc", _orc_reader)
