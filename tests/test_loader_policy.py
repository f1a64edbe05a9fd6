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


def _mk_store(base, parts=None):
    return TrendStore(
        data_source="hub", entity_type="node", granularity="15m",
        parts=parts or [TrendStorePart("main", ["power_kwh"])],
        base_path=str(base),
    )


def test_load_files_matches_sequential(spark, tmp_path):
    """Fused batch load == sequential loads: same final rows, same
    last-write-wins resolution, same job log, same modified marks."""
    from datetime import datetime

    from minerva_etl_spark.sources.loader import JobLog

    f1 = tmp_path / "f1.csv"
    f1.write_text(
        "node,timestamp,power_kwh\n"
        "a,2024-01-01 00:15:00,1.0\n"
        "b,2024-01-01 00:15:00,2.0\n"
    )
    f2 = tmp_path / "f2.csv"  # re-delivery of 'a' with a new value
    f2.write_text("node,timestamp,power_kwh\na,2024-01-01 00:15:00,9.0\n")
    t1, t2 = datetime(2024, 1, 2, 10), datetime(2024, 1, 2, 11)

    seq_store = _mk_store(tmp_path / "seq")
    seq = Loader(store=seq_store, job_log=JobLog(str(tmp_path / "seq")))
    seq.load_file(spark, "csv", str(f1), CFG, job_id=1, created=t1)
    seq.load_file(spark, "csv", str(f2), CFG, job_id=2, created=t2)

    bat_store = _mk_store(tmp_path / "bat")
    bat = Loader(store=bat_store, job_log=JobLog(str(tmp_path / "bat")))
    bat.load_files(
        spark,
        [("csv", str(f1), CFG, 1, t1), ("csv", str(f2), CFG, 2, t2)],
    )

    cols = ["entity_id", "timestamp", "power_kwh", "created", "job_id"]
    s = sorted(map(tuple, seq_store.read_part(spark, "main").select(*cols).collect()))
    b = sorted(map(tuple, bat_store.read_part(spark, "main").select(*cols).collect()))
    assert s == b
    # job log: one row per file, both finished
    jl = spark.read.parquet(str(tmp_path / "bat" / "job_log"))
    assert {(r.job_id, r.state) for r in jl.collect()} == {(1, "finished"), (2, "finished")}
    # modified marks agree on max(modified) per timestamp
    sm = spark.read.parquet(seq_store.modified_log_path())
    bm = spark.read.parquet(bat_store.modified_log_path())
    from pyspark.sql import functions as F

    def agg(df):
        return sorted(
            (r.timestamp, r.mx)
            for r in df.groupBy("timestamp")
            .agg(F.max("modified").alias("mx"))
            .collect()
        )

    assert agg(sm) == agg(bm)


def test_load_files_disjoint_columns(spark, tmp_path):
    """A file that never carried a part's column must not null out that
    part's value for a shared key (union-null vs real value)."""
    from datetime import datetime

    parts = [TrendStorePart("p_kwh", ["power_kwh"]), TrendStorePart("p_tmp", ["temp_c"])]
    f1 = tmp_path / "f1.csv"
    f1.write_text("node,timestamp,power_kwh\na,2024-01-01 00:15:00,5.0\n")
    f2 = tmp_path / "f2.csv"  # later file, same key, OTHER metric only
    f2.write_text("node,timestamp,temp_c\na,2024-01-01 00:15:00,21.5\n")
    t1, t2 = datetime(2024, 1, 2, 10), datetime(2024, 1, 2, 11)
    cfg = CsvParserConfig(
        identifier_column="node", timestamp_column="timestamp",
        entity_type="node",
        column_types={"power_kwh": "double precision", "temp_c": "double precision"},
    )
    store = _mk_store(tmp_path / "s", parts)
    Loader(store=store).load_files(
        spark, [("csv", str(f1), cfg, 1, t1), ("csv", str(f2), cfg, 2, t2)]
    )
    kwh = store.read_part(spark, "p_kwh").collect()
    assert len(kwh) == 1 and kwh[0].power_kwh == 5.0 and kwh[0].job_id == 1
    tmp = store.read_part(spark, "p_tmp").collect()
    assert len(tmp) == 1 and tmp[0].temp_c == 21.5 and tmp[0].job_id == 2


def test_load_files_stop_policy_logs_failed(spark, tmp_path):
    """The fused path keeps the stop policy: undeclared metric -> raise,
    with a failed job-log row for the offending file."""
    from minerva_etl_spark.sources.loader import JobLog

    f1 = tmp_path / "f1.csv"
    f1.write_text("node,timestamp,power_kwh,rogue\na,2024-01-01 00:15:00,1.0,9\n")
    store = _mk_store(tmp_path / "s")
    loader = Loader(
        store=store, job_log=JobLog(str(tmp_path / "s")), on_unknown_column="stop"
    )
    with pytest.raises(ValueError, match="rogue"):
        loader.load_files(spark, [("csv", str(f1), CFG, 7, None)])
    jl = spark.read.parquet(str(tmp_path / "s" / "job_log"))
    assert [(r.job_id, r.state) for r in jl.collect()] == [(7, "failed")]


def test_loader_registers_entity_dim(spark, store, csv_path):
    """The loader maintains the entity dimension create-on-miss, so
    virtual-entity/relation queries can run right after a load."""
    Loader(store=store).load_file(spark, "csv", csv_path, CFG)
    dim = spark.read.parquet(f"{store.base_path}/entity/node")
    assert {r.name for r in dim.collect()} == {"alpha-1", "beta-2"}
    # re-load: no duplicates
    Loader(store=store).load_file(spark, "csv", csv_path, CFG)
    assert spark.read.parquet(f"{store.base_path}/entity/node").count() == 2


def test_attribute_loader_csv_to_history(spark, tmp_path):
    """Attribute-flavor harvest (reference plugin_api_attribute): CSV ->
    staging-merge -> SCD history + curr, entity dim maintained, job
    logged."""
    from minerva_etl_spark.sources.loader import AttributeLoader, JobLog
    from minerva_etl_spark.store.attribute_store import AttributeStore

    p1 = tmp_path / "a1.csv"
    p1.write_text(
        "node,timestamp,power_class\n"
        "alpha,2024-01-01 00:00:00,low\n"
        "beta,2024-01-01 00:00:00,high\n"
    )
    p2 = tmp_path / "a2.csv"  # later batch: alpha changes class
    p2.write_text("node,timestamp,power_class\nalpha,2024-01-02 00:00:00,high\n")
    store = AttributeStore("hub", "node", ["power_class"], str(tmp_path / "d"))
    loader = AttributeLoader(
        store=store, job_log=JobLog(str(tmp_path / "d")),
        base_path=str(tmp_path / "d"),
    )
    cfg = CsvParserConfig(
        identifier_column="node", timestamp_column="timestamp",
        entity_type="node",
    )
    loader.load_file(spark, "csv", str(p1), cfg, job_id=1)
    loader.load_file(spark, "csv", str(p2), cfg, job_id=2)

    hist = store.read_history(spark)
    assert hist.count() == 3
    curr = {r.entity_id: r.power_class for r in store.materialize_curr(spark).collect()}
    assert len(curr) == 2 and sorted(curr.values()) == ["high", "high"]
    dim = spark.read.parquet(str(tmp_path / "d" / "entity" / "node"))
    assert {r.name for r in dim.collect()} == {"alpha", "beta"}
    jl = spark.read.parquet(str(tmp_path / "d" / "job_log"))
    assert {(r.job_id, r.state) for r in jl.collect()} == {(1, "finished"), (2, "finished")}

    # stop policy on undeclared attribute
    bad = tmp_path / "bad.csv"
    bad.write_text("node,timestamp,rogue\nx,2024-01-01 00:00:00,1\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rogue"):
        AttributeLoader(
            store=store, on_unknown_column="stop",
            base_path=str(tmp_path / "d"),
        ).load_file(spark, "csv", str(bad), cfg)


def test_load_files_job_count_bounded(spark, tmp_path):
    """Scale lock for the fused ingest path: a two-file delivery into a
    two-part store must run a BOUNDED number of Spark jobs — the r8
    regression guard for per-part duplicate probes, per-part mark jobs,
    and Spark-side metadata appends that this path eliminated.  The
    bound is loose (AQE job splitting varies) but far below the
    pre-fix shape (~2x this count)."""
    from datetime import datetime

    from minerva_etl_spark.sources.loader import JobLog
    from minerva_etl_spark.store.trendstore import TrendStore, TrendStorePart

    f1 = tmp_path / "f1.csv"
    f1.write_text(
        "node,timestamp,power_kwh,temp_c\n"
        "a,2024-01-01 00:15:00,1.0,20.0\n"
        "b,2024-01-01 00:30:00,2.0,21.0\n"
    )
    f2 = tmp_path / "f2.csv"
    f2.write_text(
        "node,timestamp,power_kwh,temp_c\na,2024-01-01 00:15:00,9.0,22.0\n"
    )
    store = TrendStore(
        data_source="hub", entity_type="node", granularity="15m",
        parts=[
            TrendStorePart("p_kwh", ["power_kwh"]),
            TrendStorePart("p_tmp", ["temp_c"]),
        ],
        base_path=str(tmp_path / "store"),
    )
    loader = Loader(store=store, job_log=JobLog(str(tmp_path / "store")))
    t1, t2 = datetime(2024, 1, 2, 10), datetime(2024, 1, 2, 11)

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    loader.load_files(
        spark,
        [("csv", str(f1), CFG, 1, t1), ("csv", str(f2), CFG, 2, t2)],
    )
    after = set(tracker.getJobIdsForGroup(None) or [])
    n_jobs = len(after - before)
    # observed ~14 post-fix (parse/deduce x2, checkpoint, entity dim,
    # marks agg, per-part merge writes); pre-fix shape was ~25+
    assert n_jobs <= 20, f"fused delivery ran {n_jobs} Spark jobs"
