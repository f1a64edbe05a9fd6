"""Loader error policy + filters (reference S4/P8: warn-vs-stop on
unknown columns, --dn-filter / --column-filter)."""

import pytest

from minerva_etl_spark.sources.csv_harvest import CsvParserConfig
from minerva_etl_spark.sources.loader import Loader
from minerva_etl_spark.store.trendstore import TrendStore, TrendStorePart


@pytest.fixture()
def store(tmp_path):
    return TrendStore(
        data_source="hub", entity_type="node", granularity="15m",
        parts=[TrendStorePart("main", ["power_kwh"])],
        base_path=str(tmp_path),
    )


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "node,timestamp,power_kwh,rogue_metric\n"
        "alpha-1,2024-01-01 00:15:00,1.5,9\n"
        "beta-2,2024-01-01 00:15:00,2.5,9\n"
    )
    return str(p)


CFG = CsvParserConfig(
    identifier_column="node", timestamp_column="timestamp", entity_type="node"
)


def test_unknown_column_warn_drops(spark, store, csv_path):
    Loader(store=store, on_unknown_column="warn").load_file(
        spark, "csv", csv_path, CFG
    )
    df = store.read_part(spark, "main")
    assert "rogue_metric" not in df.columns
    assert df.count() == 2


def test_unknown_column_stop_raises(spark, store, csv_path):
    with pytest.raises(ValueError, match="rogue_metric"):
        Loader(store=store, on_unknown_column="stop").load_file(
            spark, "csv", csv_path, CFG
        )


def test_entity_filter(spark, store, csv_path):
    Loader(store=store, entity_filter="^alpha-").load_file(
        spark, "csv", csv_path, CFG
    )
    assert store.read_part(spark, "main").count() == 1


def test_bad_rows_parse_to_null(spark, store, tmp_path):
    """Malformed timestamps/values parse to null (COPY-protocol null
    semantics) instead of failing the load."""
    p = tmp_path / "bad.csv"
    p.write_text(
        "node,timestamp,power_kwh\n"
        "good-1,2024-01-01 00:15:00,1.5\n"
        "bad-ts,not-a-timestamp,2.5\n"
        "bad-val,2024-01-01 00:30:00,oops\n"
    )
    from minerva_etl_spark.sources.csv_harvest import read_csv_packages

    cfg = CsvParserConfig(
        identifier_column="node", timestamp_column="timestamp",
        entity_type="node",
        column_types={"power_kwh": "double precision"},
    )
    rows = {r.entity_ref: r for r in read_csv_packages(spark, str(p), cfg).collect()}
    assert rows["good-1"].power_kwh == 1.5
    assert rows["bad-ts"].timestamp is None
    assert rows["bad-val"].power_kwh is None


def test_loader_registers_entity_dim(spark, store, csv_path):
    """The loader maintains the entity dimension create-on-miss, so
    virtual-entity/relation queries can run right after a load."""
    Loader(store=store).load_file(spark, "csv", csv_path, CFG)
    dim = spark.read.parquet(f"{store.base_path}/entity/node")
    assert {r.name for r in dim.collect()} == {"alpha-1", "beta-2"}
    # re-load: no duplicates
    Loader(store=store).load_file(spark, "csv", csv_path, CFG)
    assert spark.read.parquet(f"{store.base_path}/entity/node").count() == 2
