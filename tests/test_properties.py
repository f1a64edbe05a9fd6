"""Property-based tests (hypothesis): granularity bucket algebra, the
type-widening lattice, and Python↔SQL bucket parity via DuckDB.

The reference has no property tests (SURVEY §5.3); these guard the
invariants the whole engine leans on.
"""

from datetime import datetime, timedelta

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from minerva_etl_spark.catalog import datatypes as dt
from minerva_etl_spark.catalog.granularity import Granularity

GRANS = ["15m", "30m", "1h", "1d", "1w", "1month"]

timestamps = st.datetimes(
    min_value=datetime(2001, 1, 1), max_value=datetime(2035, 12, 31)
)


@given(ts=timestamps, gran=st.sampled_from(GRANS))
@settings(max_examples=300, deadline=None)
def test_bucket_end_covers_half_open_interval(ts, gran):
    g = Granularity.parse(gran)
    end = g.bucket_end(ts)
    # ts ∈ (end - g, end]
    assert ts <= end
    assert g.decr(end) < ts or ts == end
    # idempotent: the label is its own bucket end
    assert g.bucket_end(end) == end


@given(ts=timestamps, gran=st.sampled_from(GRANS))
@settings(max_examples=300, deadline=None)
def test_truncate_floor_properties(ts, gran):
    g = Granularity.parse(gran)
    start = g.truncate(ts)
    assert start <= ts
    assert g.truncate(start) == start
    assert g.inc(start) > ts or ts == start


@given(ts=timestamps, gran=st.sampled_from(["15m", "1h", "1d", "1w", "1month"]))
@settings(max_examples=150, deadline=None)
def test_bucket_end_matches_duckdb_sql(ts, gran):
    """The ANSI emission computes the same label as the Python model
    (microsecond-floored input, as stored)."""
    g = Granularity.parse(gran)
    ts = ts.replace(microsecond=(ts.microsecond // 1) )
    sql = g.bucket_end_ansi_sql("ts")
    got = duckdb.sql(
        f"SELECT {sql} AS b FROM (SELECT TIMESTAMP '{ts}' AS ts)"
    ).fetchone()[0]
    assert got == g.bucket_end(ts)


@given(
    a=st.sampled_from(dt.LADDER),
    b=st.sampled_from(dt.LADDER),
    c=st.sampled_from(dt.LADDER),
)
def test_widening_is_a_semilattice(a, b, c):
    m = dt.max_data_type
    assert m(a, b) == m(b, a)
    assert m(a, m(b, c)) == m(m(a, b), c)
    assert m(a, a) == a
    # absorbing top
    assert m(a, dt.TEXT) == dt.TEXT


@given(st.integers(min_value=-(2**70), max_value=2**70))
def test_integer_deduction_roundtrip(n):
    t = dt.deduce_data_type(str(n))
    if -32768 <= n <= 32767:
        assert t is dt.SMALLINT
    elif -2147483648 <= n <= 2147483647:
        assert t is dt.INTEGER
    elif -(2**63) <= n < 2**63:
        assert t is dt.BIGINT
    else:
        assert t is dt.NUMERIC


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_float_deduction_never_text(x):
    t = dt.deduce_data_type(repr(x))
    assert t in (dt.REAL, dt.DOUBLE, dt.SMALLINT, dt.INTEGER, dt.BIGINT, dt.NUMERIC)


@given(
    st.lists(
        st.integers(min_value=1, max_value=9999), min_size=1, max_size=6
    )
)
def test_split_thresholds_partition_the_bucket_space(parts):
    """Any basis-point composition that sums to 1 yields strictly
    increasing cumulative thresholds ending exactly at the bucket
    count — no gap or overlap in the split mapping."""
    from minerva_etl_spark.operators.split import _BUCKETS, _thresholds

    total = sum(parts)
    fracs = {f"s{i}": p / _BUCKETS for i, p in enumerate(parts)}
    if total != _BUCKETS:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            _thresholds(fracs)
        return
    th = _thresholds(fracs)
    cums = [c for _, c in th]
    assert cums == sorted(cums)
    assert cums[-1] == _BUCKETS
    # widths reproduce the inputs exactly
    widths = [c - p for c, p in zip(cums, [0] + cums[:-1])]
    assert widths == parts


# ------------------------------------------------------------- media codecs
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    channels=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, channels, data):
    """decode(encode(px, filters)) == px for ANY pixel buffer and ANY
    per-row filter choice — the inverse-filter algebra (Sub/Up/Average/
    Paeth) holds over the whole input space, not just fixtures."""
    from minerva_etl_spark.operators.multimodal import (
        png_decode,
        synthesize_png,
    )

    n = w * h * channels
    px = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    d = png_decode(synthesize_png(px, w, h, channels, filters))
    assert bytes(d["pixels"]) == px
    assert (d["width"], d["height"], d["channels"]) == (w, h, channels)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 9),
    nf=st.integers(1, 5),
    fps=st.integers(1, 60),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_property(w, h, nf, fps, data):
    """decode(encode(frames)) recovers every frame bit-exactly for any
    geometry — bottom-up row order, BGR swap, and 4-byte padding are
    exact inverses at every width (incl. stride % 4 == 0 and != 0)."""
    from minerva_etl_spark.operators.multimodal import (
        avi_decode,
        synthesize_avi,
    )

    n = w * h * 3
    frames = [
        bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=n, max_size=n)
            )
        )
        for _ in range(nf)
    ]
    d = avi_decode(synthesize_avi(frames, w, h, fps=fps))
    assert (d["width"], d["height"], d["fps"], d["n_frames"]) == (
        w, h, fps, nf,
    )
    for got, exp in zip(d["frames"], frames):
        assert bytes(got) == exp


@given(
    samples=st.lists(st.integers(-32768, 32767), max_size=200),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    """wav_decode recovers rate/frame-count for any 16-bit sample list
    (incl. empty), and the RMS equals the exact integer-sum formula."""
    import math

    from minerva_etl_spark.operators.multimodal import (
        synthesize_wav,
        wav_decode,
    )

    d = wav_decode(synthesize_wav(samples, rate))
    assert d["sample_rate"] == rate and d["n_frames"] == len(samples)
    if samples:
        exp = math.floor(
            (sum(v * v for v in samples) / len(samples)) ** 0.5 * 1e6 + 0.5
        ) / 1e6
        assert d["rms"] == exp
    else:
        assert d["rms"] == 0.0


# --------------------------------------------------------- code operators
_code_chars = st.text(
    alphabet=list("ab \t\n#/*-\"'=.1"), min_size=0, max_size=120
)


@given(text=_code_chars)
@settings(max_examples=200, deadline=None)
def test_normalize_code_idempotent(text):
    """normalize(normalize(x)) == normalize(x) — the dedup key is a
    fixed point, so re-normalizing stored keys can never split a
    group (checked via the DuckDB twin expression; the Spark/DuckDB
    byte-equality is pinned separately in test_code.py)."""
    import pandas as pd

    from minerva_etl_spark.operators.code import normalize_code_duck_expr

    con = duckdb.connect()
    expr = normalize_code_duck_expr("content")
    con.register("t1", pd.DataFrame({"content": [text]}))
    (n1,) = con.execute(f"SELECT {expr} FROM t1").fetchone()
    con.register("t2", pd.DataFrame({"content": [n1]}))
    (n2,) = con.execute(f"SELECT {expr} FROM t2").fetchone()
    assert n2 == n1


@given(
    text=st.text(min_size=0, max_size=200),
    fid=st.integers(min_value=0, max_value=10**9),
    seed=st.integers(min_value=0, max_value=99),
)
@settings(max_examples=200, deadline=None)
def test_fim_cuts_reassemble(text, fid, seed):
    """For ANY unicode text and id: if FIM applies, the rendered
    string is exactly prefix+SUF+suffix+MID+middle of the original at
    the emitted cut offsets; if not, the text passes through
    verbatim (DuckDB twin expressions — character semantics match
    Spark's)."""
    import pandas as pd

    from minerva_etl_spark.operators.code import (
        FIM_MIDDLE, FIM_PREFIX, FIM_SUFFIX, fim_exprs,
    )

    exprs = fim_exprs(
        "content", "file_id", seed=seed, rate=0.7, spark_side=False
    )
    sel = ", ".join(f"{sql} AS {name}" for name, sql in exprs.items())
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame({"file_id": [fid], "content": [text]})
    )
    row = con.execute(f"SELECT {sel} FROM t").fetchdf().iloc[0]
    if row["fim_applied"]:
        lo, hi = int(row["cut_lo"]), int(row["cut_hi"])
        assert 0 <= lo <= hi <= len(text)
        expected = (
            FIM_PREFIX + text[:lo] + FIM_SUFFIX + text[hi:]
            + FIM_MIDDLE + text[lo:hi]
        )
        assert row["fim_text"] == expected
    else:
        assert row["fim_text"] == text
