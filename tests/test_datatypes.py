"""Type-deduction ladder — mirrors the reference's
`tests/storage/test_datatype.py` semantics."""

from minerva_etl_spark.catalog import datatypes as dt


def test_deduce_ints_by_range():
    assert dt.deduce_data_type("123") is dt.SMALLINT
    assert dt.deduce_data_type("40000") is dt.INTEGER
    assert dt.deduce_data_type(str(2**40)) is dt.BIGINT
    assert dt.deduce_data_type(str(2**70)) is dt.NUMERIC


def test_deduce_floats_and_ts():
    assert dt.deduce_data_type("34.5") is dt.REAL
    assert dt.deduce_data_type("1e10") is dt.DOUBLE
    assert dt.deduce_data_type("2013-05-28 12:00:00") is dt.TIMESTAMP
    assert dt.deduce_data_type("free text") is dt.TEXT


def test_nulls():
    assert dt.deduce_data_type("") is None
    assert dt.deduce_data_type(None) is None


def test_widening_fold():
    assert dt.max_data_type(dt.SMALLINT, dt.TEXT) is dt.TEXT
    assert dt.max_data_type(dt.INTEGER, dt.REAL) is dt.REAL
    assert dt.max_data_type(None, dt.BIGINT) is dt.BIGINT


def test_deduce_columns():
    rows = [
        ["123", "34.5", "x"],
        ["40000", "2", ""],
        ["7", "1e300", "2013-05-28 12:00:00"],
    ]
    out = dt.deduce_data_types(rows)
    assert out[0] is dt.INTEGER
    assert out[1] is dt.DOUBLE
    assert out[2] is dt.TEXT


def test_sum_promotion():
    assert dt.promoted_type("sum", dt.SMALLINT) is dt.BIGINT
    assert dt.promoted_type("sum", dt.BIGINT) is dt.NUMERIC
    assert dt.promoted_type("avg", dt.INTEGER) is dt.NUMERIC
    assert dt.promoted_type("avg", dt.DOUBLE) is dt.DOUBLE
