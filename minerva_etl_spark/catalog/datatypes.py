"""Type system: the reference's string-deduction ladder mapped to Spark.

Reference semantics (`/root/reference/src/minerva/storage/datatype.py`):
every type has a string parser (for the ingest path); types form a
widening lattice ``smallint < integer < bigint < real < double precision
< numeric < timestamp < text`` (`datatype.py:908-929`); the type of a
column of strings is deduced by parsing each value with the smallest type
that accepts it and folding with ``max_data_type``
(`datatype.py:932-975`).

Here types are a small enum ordered by the same lattice, each carrying
its Spark type; deduction accepts the same surface syntax (ints by
range, decimals, floats, ISO timestamps, empty string = null).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import total_ordering

from pyspark.sql import types as T


@total_ordering
@dataclass(frozen=True)
class DataType:
    name: str
    rank: int
    spark_type: T.DataType

    def __lt__(self, other: "DataType") -> bool:
        return self.rank < other.rank

    def __str__(self) -> str:  # pragma: no cover
        return self.name


BOOLEAN = DataType("boolean", 0, T.BooleanType())
SMALLINT = DataType("smallint", 1, T.ShortType())
INTEGER = DataType("integer", 2, T.IntegerType())
BIGINT = DataType("bigint", 3, T.LongType())
REAL = DataType("real", 4, T.FloatType())
DOUBLE = DataType("double precision", 5, T.DoubleType())
# precision choice documented: reference `numeric` is arbitrary-precision;
# Spark needs fixed precision — 38,18 covers every fixture value.
NUMERIC = DataType("numeric", 6, T.DecimalType(38, 18))
TIMESTAMP = DataType("timestamp", 7, T.TimestampNTZType())
TIMESTAMPTZ = DataType("timestamp with time zone", 7, T.TimestampType())
TEXT = DataType("text", 8, T.StringType())

REGISTRY: dict[str, DataType] = {
    t.name: t
    for t in (
        BOOLEAN, SMALLINT, INTEGER, BIGINT, REAL, DOUBLE, NUMERIC,
        TIMESTAMP, TIMESTAMPTZ, TEXT,
    )
}
# array variants of every base type, as the reference registers them
# (`datatype.py:889-898`: ArrayType(registry[...]) for each base; string
# syntax `[a,b,c]`, `datatype.py:781-787`).  Arrays sit above every
# scalar in the lattice (never deduced — reference
# ``ArrayType.deduce_parser_config`` raises NotImplementedError; they
# arrive via DECLARED parser-config / trend-store types only).
REGISTRY.update(
    {
        f"{t.name}[]": DataType(f"{t.name}[]", 9, T.ArrayType(t.spark_type))
        for t in (
            BOOLEAN, SMALLINT, INTEGER, BIGINT, REAL, DOUBLE, NUMERIC,
            TIMESTAMP, TIMESTAMPTZ, TEXT,
        )
    }
)
# aliases accepted by the YAML instance format
REGISTRY.update(
    {
        "int": INTEGER,
        "double": DOUBLE,
        "float": REAL,
        "string": TEXT,
        "int[]": REGISTRY["integer[]"],
        "double[]": REGISTRY["double precision[]"],
        "float[]": REGISTRY["real[]"],
        "string[]": REGISTRY["text[]"],
    }
)

#: the widening ladder used by deduction (boolean deliberately excluded,
#: as in the reference ladder `datatype.py:908-917`)
LADDER = [SMALLINT, INTEGER, BIGINT, REAL, DOUBLE, NUMERIC, TIMESTAMP, TEXT]

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_DECIMAL_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+)$")
_TS_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?"
    r"([+-]\d{2}:?\d{2}|Z)?$"
)


def deduce_data_type(value: str | None) -> DataType | None:
    """Smallest ladder type whose parser accepts ``value``.

    Returns None for nulls (None / empty string), mirroring the
    reference's null markers.
    """
    if value is None or value == "":
        return None
    text = value.strip()
    if _INT_RE.match(text):
        try:
            n = int(text)
        except ValueError:  # pragma: no cover
            return TEXT
        if -32768 <= n <= 32767:
            return SMALLINT
        if -2147483648 <= n <= 2147483647:
            return INTEGER
        if -(2**63) <= n < 2**63:
            return BIGINT
        return NUMERIC
    if _DECIMAL_RE.match(text):
        # plain decimal notation: reference deduces real (widens on demand)
        return REAL
    if _FLOAT_RE.match(text):
        return DOUBLE
    if _TS_RE.match(text):
        return TIMESTAMP
    return TEXT


def max_data_type(left: DataType | None, right: DataType | None) -> DataType | None:
    """Widening fold: the smaller of the two lattice positions that can
    represent both (simply the max rank, as in `datatype.py:919-929`)."""
    if left is None:
        return right
    if right is None:
        return left
    return left if left.rank >= right.rank else right


def deduce_data_types(rows: list[list[str | None]]) -> list[DataType]:
    """Per-column fold of deduce over a sample of string rows
    (`datatype.py:932-975`); columns that are all-null deduce to text."""
    acc: list[DataType | None] = []
    for row in rows:
        if len(acc) < len(row):
            acc.extend([None] * (len(row) - len(acc)))
        for i, value in enumerate(row):
            acc[i] = max_data_type(acc[i], deduce_data_type(value))
    return [t if t is not None else TEXT for t in acc]


# ---------------------------------------------------------------------------
# aggregate result-type promotion (`aggregation_compilation.py:396-414`):
# SUM: smallint/integer -> bigint, bigint -> numeric, real -> real,
#      double -> double, numeric -> numeric
# AVG: integral -> numeric, real/double -> double, numeric -> numeric
_SUM_PROMOTION = {
    "smallint": BIGINT, "integer": BIGINT, "bigint": NUMERIC,
    "real": REAL, "double precision": DOUBLE, "numeric": NUMERIC,
}
_AVG_PROMOTION = {
    "smallint": NUMERIC, "integer": NUMERIC, "bigint": NUMERIC,
    "real": DOUBLE, "double precision": DOUBLE, "numeric": NUMERIC,
}


def spark_ddl(type_name: str) -> str:
    """Spark SQL DDL string for a declared (reference-named) type —
    e.g. ``'bigint'`` → ``bigint``, ``'numeric'`` → ``decimal(38,18)``."""
    return REGISTRY[type_name.lower()].spark_type.simpleString()


# ---------------------------------------------------------------------------
# Spark-type widening (schema evolution on the write path).  The reference
# widens column types in place via ALTER TABLE (`commands/trend_store.py:
# 436-465`, `storage/generic.py:131-160`) using the same lattice as
# deduction; here the lattice is keyed by Spark ``simpleString`` names.
_SPARK_WIDEN_RANK = {
    "boolean": 0, "tinyint": 1, "smallint": 1, "int": 2, "bigint": 3,
    "float": 4, "double": 5, "decimal": 6, "date": 7, "timestamp_ntz": 7,
    "timestamp": 7, "string": 8,
}


def widen_spark_type(left: str, right: str) -> str:
    """The narrower Spark type (simpleString) that can represent values
    of both ``left`` and ``right``; ``string`` is the top element.

    Mirrors ``max_data_type`` (`datatype.py:919-929`) on the physical
    side: used when an incoming batch's column type differs from the
    stored one.
    """
    if left == right:
        return left
    if left.startswith("array<") and right.startswith("array<"):
        # arrays widen element-wise (reference registers the array of
        # every scalar; the scalar lattice lifts pointwise)
        inner = widen_spark_type(left[6:-1], right[6:-1])
        return f"array<{inner}>"
    base_l, base_r = left.split("(")[0], right.split("(")[0]
    rank_l = _SPARK_WIDEN_RANK.get(base_l)
    rank_r = _SPARK_WIDEN_RANK.get(base_r)
    if rank_l is None or rank_r is None:
        # non-scalar / unknown combination: only textual widening is safe
        return "string"
    if rank_l == rank_r:
        # e.g. timestamp vs timestamp_ntz, decimal(10,2) vs decimal(38,18)
        if base_l == base_r == "decimal":
            return "decimal(38,18)"
        # temporal family: prefer the timestamp types over date, so a
        # date column meeting timestamp[_ntz] batches keeps time-of-day
        # (date-widening would silently truncate and report no change)
        if "timestamp" in (left, right):
            return "timestamp"
        if "timestamp_ntz" in (left, right):
            return "timestamp_ntz"
        return left
    return left if rank_l > rank_r else right


def promoted_type(aggregation: str, source: DataType) -> DataType:
    """Result type a declared aggregation must be cast to so rolled-up
    stores keep the reference's declared column types."""
    if aggregation.lower() == "sum":
        return _SUM_PROMOTION.get(source.name, source)
    if aggregation.lower() in ("avg", "mean"):
        return _AVG_PROMOTION.get(source.name, DOUBLE)
    if aggregation.lower() == "count":
        return INTEGER
    return source
