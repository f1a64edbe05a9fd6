"""Deterministic corpus sketches — KMV distinct, md5-HLL registers,
count-min heavy hitters (round 12).

At 100 TB, "how many distinct tokens / URLs / shingles" and "which
items are hot" are sketch questions: exact groupBys move the corpus,
sketches move kilobytes and MERGE (per-partition partials combine
associatively — the map-side-combine property everything in this
engine is built around).  Spark's own ``approx_count_distinct`` is an
HLL++ whose internals can't be oracle-matched; these sketches use the
engine-wide md5 draw instead, so every register and every estimate is
bit-reproducible in DuckDB:

* **KMV (k minimum values)** — Bar-Yossef et al. 2002: the ``k``
  smallest distinct 60-bit md5 values; distinct estimate
  ``(k−1) · 2⁶⁰ div h_k`` (exact integer).  The k-smallest scan is
  Spark's TakeOrdered (per-partition top-k + driver merge of k·p
  values — no global sort).
* **HLL registers** — Flajolet et al. 2007: bucket = low ``b`` bits,
  ``rho`` = leading-zero rank of the remaining 60−b bits; one
  combinable ``groupBy(bucket).max(rho)``.  The raw estimate
  ``α_m · m² / Σ 2^{−rho_j}`` is computed from the EXACT integer
  harmonic numerator ``S = Σ 2^{54−rho_j}`` (the 2⁵⁴ scale keeps
  ``m·2^{54−1}`` inside BIGINT for every register state) in ONE
  pinned IEEE expression (both engines cast the same BIGINT and
  divide the same way); the small/large-range corrections are
  documented extensions, not silently applied.
* **Count-min** — Cormode & Muthukrishnan 2005: ``d`` rows × ``w``
  buckets of exact BIGINT counts (combinable groupBy); point query =
  min over rows.  Overestimates only — the guarantee heavy-hitter
  reporting needs.

All three sketches MERGE: KMV by union + re-min-k, HLL by per-bucket
max, CM by cell-wise sum — pytest-pinned (half ∪ half == whole).

Reference parity: the reference has no sketch surface; this extends
the corpus-stats family (`corpus_report`, `operators/bloom.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "kmv_sketch",
    "kmv_estimate_expr",
    "hll_registers",
    "hll_estimate",
    "cm_sketch",
    "cm_query",
    "kmv_oracle_sql",
    "hll_oracle_sql",
    "cm_oracle_sql",
]

#: 60-bit hash space (15 md5 hex digits — the engine-wide draw width)
_HBITS = 60
_HSPACE = 1 << _HBITS
#: harmonic-numerator scale: 2^(54 - rho) terms stay BIGINT-safe for
#: any register table (rho >= 1, so max m * 2^53 + empty * 2^54)
_HSCALE_BITS = 54
_HSCALE = 1 << _HSCALE_BITS


def _h60(col: str) -> str:
    """The engine-wide md5 draw: first 15 hex digits → BIGINT in
    [0, 2⁶⁰)."""
    return f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"


def _h60_duck(col: str) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 15))"
        f"::BIGINT AS BIGINT)"
    )


# ------------------------------------------------------------------ KMV


def kmv_sketch(
    df: DataFrame, item_col: str, k: int = 64
) -> DataFrame:
    """The ``k`` smallest DISTINCT 60-bit hashes of ``item_col`` —
    ``(pos, h)`` with pos 1-based.  ``orderBy().limit(k)`` plans as
    TakeOrdered: per-partition top-k, driver merges k·p values."""
    return (
        df.select(F.expr(_h60(item_col)).alias("h"))
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(int(k))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("h").asc()))
            .alias("pos"),
            "h",
        )
    )


def kmv_estimate_expr(k: int) -> F.Column:
    """Distinct-count estimate from a KMV sketch row set: requires
    the ``pos == k`` row's hash as column ``h`` — exact integer
    ``(k−1)·2⁶⁰ div h_k``, computed through DECIMAL(38) because the
    numerator exceeds BIGINT (the result never does for any real
    universe)."""
    return F.expr(
        f"CAST((CAST({int(k) - 1} AS DECIMAL(38,0)) * {_HSPACE}) "
        f"div h AS BIGINT)"
    )


def kmv_oracle_sql(table_expr: str, item_col: str, k: int = 64) -> str:
    return f"""
WITH hashes AS (
  SELECT DISTINCT {_h60_duck(item_col)} AS h FROM {table_expr}
),
topk AS (
  SELECT h, row_number() OVER (ORDER BY h ASC) AS pos
  FROM hashes ORDER BY h ASC LIMIT {int(k)}
)
SELECT CAST(pos AS INT) AS pos, h FROM topk
"""


# ------------------------------------------------------------------ HLL


def _rho_expr(rest: str, width: int) -> str:
    # leading-zero rank of a `width`-bit value + 1; 0 -> width + 1.
    # Pure-integer formulation: length(bin(x)) is the bit length
    # (floor(log2 x) + 1) in BOTH Spark and DuckDB, so rho is exact
    # cross-engine.  floor(log2(CAST(x AS DOUBLE))) is NOT — Spark
    # computes log2 as ln(x)/ln(2) while DuckDB uses libm log2, and
    # they disagree on values like 2^48-1 (r12 ADVICE).
    return (
        f"CAST(CASE WHEN {rest} = 0 THEN {width + 1} "
        f"ELSE {width} + 1 - length(bin({rest})) END AS INT)"
    )


def hll_registers(
    df: DataFrame, item_col: str, b: int = 8
) -> DataFrame:
    """HLL register table ``(bucket, rho)`` — ``m = 2^b`` rows max,
    one combinable groupBy.  Mergeable by per-bucket max."""
    m = 1 << int(b)
    h = _h60(item_col)
    width = _HBITS - int(b)
    return (
        df.select(F.expr(h).alias("__h"))
        .select(
            F.expr(f"CAST(__h % {m} AS INT)").alias("bucket"),
            F.expr(f"__h div {m}").alias("__rest"),
        )
        .select(
            "bucket", F.expr(_rho_expr("__rest", width)).alias("__rho")
        )
        .groupBy("bucket")
        .agg(F.max("__rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, b: int = 8) -> DataFrame:
    """The raw HLL estimate from a register table: the exact integer
    harmonic numerator ``S = Σ 2^{60−rho} + empty·2⁶⁰`` feeds ONE
    pinned IEEE expression (identical in the oracle).  Returns one
    row ``(m, n_buckets_used, harmonic_grid, estimate)``."""
    m = 1 << int(b)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return registers.agg(
        F.count(F.lit(1)).cast("int").alias("n_buckets_used"),
        F.sum(
            F.expr(
                f"CAST(pow(2.0d, {_HSCALE_BITS} - least(rho, "
                f"{_HSCALE_BITS})) AS BIGINT)"
            )
        ).alias("__s_used"),
    ).select(
        F.lit(m).cast("int").alias("m"),
        "n_buckets_used",
        F.expr(
            f"__s_used + CAST(({m} - n_buckets_used) AS BIGINT) "
            f"* CAST({_HSCALE} AS BIGINT)"
        ).alias("harmonic_grid"),
    ).select(
        "m",
        "n_buckets_used",
        "harmonic_grid",
        F.expr(
            f"CAST(round(CAST({alpha!r} AS DOUBLE) * {m} * {m} "
            f"* CAST({_HSCALE} AS DOUBLE) "
            f"/ CAST(harmonic_grid AS DOUBLE), 0) AS BIGINT)"
        ).alias("estimate"),
    )


def hll_oracle_sql(table_expr: str, item_col: str, b: int = 8) -> str:
    m = 1 << int(b)
    width = _HBITS - int(b)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # same pure-integer bit-length formulation as _rho_expr — the two
    # engines' libm log2 provably disagree (e.g. rest = 2^48-1), the
    # minimal binary string length never does.
    rho = (
        f"CASE WHEN rest = 0 THEN {width + 1} "
        f"ELSE {width} + 1 - length(bin(rest)) END"
    )
    return f"""
WITH h AS (
  SELECT {_h60_duck(item_col)} AS hv FROM {table_expr}
),
split AS (
  SELECT CAST(hv % {m} AS INT) AS bucket, hv // {m} AS rest FROM h
),
regs AS (
  SELECT bucket, max({rho}) AS rho FROM split GROUP BY bucket
),
agg AS (
  SELECT CAST(count(*) AS INT) AS n_buckets_used,
         CAST(sum(CAST(pow(2.0, {_HSCALE_BITS}
                  - least(rho, {_HSCALE_BITS})) AS BIGINT))
              AS BIGINT) AS s_used
  FROM regs
)
SELECT CAST({m} AS INT) AS m, n_buckets_used,
       s_used + CAST(({m} - n_buckets_used) AS BIGINT)
         * CAST({_HSCALE} AS BIGINT) AS harmonic_grid,
       CAST(round(CAST({alpha!r} AS DOUBLE) * {m} * {m}
                  * CAST({_HSCALE} AS DOUBLE)
                  / CAST(s_used + CAST(({m} - n_buckets_used)
                         AS BIGINT) * CAST({_HSCALE} AS BIGINT)
                         AS DOUBLE), 0) AS BIGINT) AS estimate
FROM agg
"""


# ------------------------------------------------------------- count-min


def cm_sketch(
    df: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min table ``(row, bucket, cnt)`` — ``d`` salted md5
    hashes, exact BIGINT cells, one combinable groupBy after a
    ``d``-way explode.  Mergeable by cell-wise sum."""
    weight = (
        f"CAST({weight_col} AS BIGINT)" if weight_col else
        "CAST(1 AS BIGINT)"
    )
    salted = _h60(f"concat(CAST(r AS STRING), ':', {item_col})")
    return (
        df.select(
            F.col(item_col),
            F.expr(weight).alias("__w"),
            F.explode(
                F.sequence(F.lit(0), F.lit(int(d) - 1))
            ).alias("r"),
        )
        .select(
            F.col("r").cast("int").alias("row"),
            F.expr(f"CAST({salted} % {int(w)} AS INT)").alias("bucket"),
            "__w",
        )
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cm_query(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point estimates for ``queries[item_col]``: min over the ``d``
    cells each item hashes into (missing cell ⇒ 0).  Returns
    ``(item, est)``."""
    qsalted = _h60("concat(CAST(r AS STRING), ':', item)")
    cells = (
        queries.select(F.col(item_col).alias("item"))
        .distinct()
        .select(
            "item",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(d) - 1))
            ).alias("r"),
        )
        .select(
            "item",
            F.col("r").cast("int").alias("row"),
            F.expr(f"CAST({qsalted} % {int(w)} AS INT)").alias("bucket"),
        )
    )
    return (
        cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")))
            .alias("est")
        )
    )


def cm_oracle_sql(
    table_expr: str,
    item_col: str,
    queries_expr: str,
    d: int = 4,
    w: int = 256,
    weight_col: str | None = None,
) -> str:
    weight = (
        f"CAST({weight_col} AS BIGINT)" if weight_col else
        "CAST(1 AS BIGINT)"
    )
    salted = _h60_duck(
        f"CAST(gs.r AS VARCHAR) || ':' || {item_col}"
    )
    qsalted = _h60_duck("CAST(gs.r AS VARCHAR) || ':' || q.item")
    return f"""
WITH cells AS (
  SELECT CAST(gs.r AS INT) AS row,
         CAST({salted} % {int(w)} AS INT) AS bucket,
         CAST(sum({weight}) AS BIGINT) AS cnt
  FROM {table_expr} t
  CROSS JOIN UNNEST(generate_series(0, {int(d) - 1})) AS gs(r)
  GROUP BY 1, 2
),
q AS (SELECT DISTINCT item FROM {queries_expr} qq),
qcells AS (
  SELECT q.item, CAST(gs.r AS INT) AS row,
         CAST({qsalted} % {int(w)} AS INT) AS bucket
  FROM q CROSS JOIN UNNEST(generate_series(0, {int(d) - 1})) AS gs(r)
)
SELECT qc.item, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
FROM qcells qc
LEFT JOIN cells c ON c.row = qc.row AND c.bucket = qc.bucket
GROUP BY qc.item
"""
