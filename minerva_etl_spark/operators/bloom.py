"""Bloom-prefiltered benchmark decontamination — the 100 TB path.

`operators/dedup.py::contamination_check` broadcasts the benchmark's
distinct shingle set as strings.  That is the right plan while eval
sets are MBs, but a consolidated decontamination list (every public
benchmark + held-out suites, hundreds of millions of shingles) breaks
the broadcast budget long before the corpus is the problem.  The
classic fix: broadcast a BLOOM FILTER of the benchmark shingles
(~10-14 bits/element instead of the full strings — a 1e8-shingle list
becomes a ~170 MB bitmap at 1e-4 fpp instead of several GB of
strings), prefilter the corpus's exploded shingles against it
map-side, and exact-confirm only the survivors with a (now tiny)
shuffle join against the real shingle set.

Semantics are EXACTLY those of ``contamination_check``: a Bloom
filter has no false negatives, and the confirm join removes the false
positives — so the DuckDB oracle for the exact operator is the oracle
for this one too (the gate row pins that equality at every scale).

Hashing is JVM-side on BOTH the build and probe paths — the k bit
positions are derived in Catalyst from two ``xxhash64`` seeds via the
double-hashing scheme ``pos_i = (h1 + i * h2) mod m`` (Kirsch &
Mitzenmacher 2006, public result), so Python never hashes a shingle
and the two sides can never disagree.  Hashes are masked to 31 bits
before the linear combination: Spark 4 runs ANSI mode, where a raw
``bigint`` overflow in ``h1 + i*h2`` would *throw*, not wrap.

Scale shape:
- build: one map-side pass over the benchmark; each task emits its
  partition's ``m/8``-byte bitmap, the driver ORs them (task count ×
  bitmap size, bounded and small — this is a reduce of bitmaps, not a
  collect of positions);
- probe: ``mapInPandas`` over the corpus's exploded shingles with the
  bitmap as a ``SparkContext.broadcast`` (numpy bit test, vectorized
  over the Arrow batch);
- confirm: shuffle equi-join of the ~(hits + fpp·shingles) survivors
  against the benchmark shingles — the benchmark side no longer needs
  to fit in a broadcast.

Reference: extension (the reference engine has no corpus hygiene
surface); SURVEY §2 "beyond the reference" charter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from minerva_etl_spark.operators.dedup import (
    shingles_from_tokens_spark_sql,
)
from minerva_etl_spark.operators.text import tokens_expr

#: 31-bit mask keeping the double-hash linear combination inside
#: bigint under ANSI arithmetic (max = 2^31 + k * 2^31 for small k)
_MASK = (1 << 31) - 1


def bloom_positions(
    col: str, num_bits: int, num_hashes: int
) -> Column:
    """The ``num_hashes`` Bloom bit positions of a string column as an
    ``array<bigint>`` — pure Catalyst (xxhash64 double hashing), used
    identically by the build and probe paths."""
    h1 = f"(xxhash64({col}, 1) & {_MASK})"
    # force h2 odd so the stride never collapses to a constant
    h2 = f"((xxhash64({col}, 2) & {_MASK}) | 1)"
    return F.expr(
        f"transform(sequence(0, {num_hashes - 1}), "
        f"i -> pmod({h1} + CAST(i AS BIGINT) * {h2}, {num_bits}))"
    )


def build_bloom(
    df: DataFrame, col: str, num_bits: int, num_hashes: int
) -> bytes:
    """Distributed Bloom build over a string column.

    Each task sets its partition's bits in a local numpy bitmap and
    emits the ``num_bits/8``-byte array; the driver ORs the per-task
    bitmaps.  Driver traffic = tasks × bitmap bytes (bitmaps, never
    positions or strings).
    """
    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")
    pos = df.select(
        bloom_positions(col, num_bits, num_hashes).alias("__pos")
    )

    n_bytes = num_bits // 8

    def to_bitmaps(batches):
        import numpy as np
        import pandas as pd

        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            p = np.concatenate(pdf["__pos"].to_numpy())
            np.bitwise_or.at(
                bitmap, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8)
            )
        if seen:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    parts = pos.mapInPandas(to_bitmaps, "bitmap binary").collect()
    import numpy as np

    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row.bitmap, dtype=np.uint8)
    return out.tobytes()


def bloom_maybe_members(
    df: DataFrame,
    col: str,
    bitmap: bytes,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Keep rows whose ``col`` is possibly in the Bloom set (no false
    negatives).  The bitmap ships once per executor as a
    ``SparkContext.broadcast``; the membership test is a vectorized
    numpy bit lookup per Arrow batch."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)
    staged = df.withColumn(
        "__pos", bloom_positions(col, num_bits, num_hashes)
    )
    cols = df.columns

    def probe(batches):
        import numpy as np

        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            p = np.vstack(pdf["__pos"].to_numpy())
            hit = (bm[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8)))
            keep = (hit != 0).all(axis=1)
            out = pdf.loc[keep, cols]
            if len(out):
                yield out

    return staged.mapInPandas(probe, df.schema)


def contamination_check_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """`contamination_check` semantics through the Bloom scale path:
    build the filter from the benchmark shingles, prefilter the
    corpus's exploded shingles map-side, exact-confirm survivors with
    a non-broadcast equi-join.  Output and the DuckDB oracle are
    identical to the exact operator's."""
    staged = corpus.withColumn("__toks", tokens_expr(text_col)).withColumn(
        "__shingles", F.expr(shingles_from_tokens_spark_sql("__toks", n))
    )
    exploded = staged.select(
        F.col(id_col),
        F.size("__shingles").alias("__n_shingles"),
        F.explode_outer("__shingles").alias("__shingle"),
    ).filter(F.col("__shingle").isNotNull() & (F.col("__shingle") != ""))

    bench = (
        benchmark.withColumn("__toks", tokens_expr(text_col))
        .withColumn(
            "__shingles", F.expr(shingles_from_tokens_spark_sql("__toks", n))
        )
        .select(F.explode_outer("__shingles").alias("__shingle"))
        .filter(F.col("__shingle").isNotNull() & (F.col("__shingle") != ""))
        .distinct()
    )

    bitmap = build_bloom(bench, "__shingle", num_bits, num_hashes)
    candidates = bloom_maybe_members(
        exploded, "__shingle", bitmap, num_bits, num_hashes
    )
    # exact confirm: plain shuffle join — deliberately NOT broadcast;
    # at the scale this path exists for, the benchmark shingle set
    # exceeds the broadcast budget while the bloom survivors are tiny
    return (
        candidates.join(bench.hint("shuffle_hash"), "__shingle")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_hits"),
            F.first("__n_shingles").cast("bigint").alias("n_shingles"),
        )
        .withColumn(
            "contaminated_frac",
            F.col("n_hits").cast("double")
            / F.col("n_shingles").cast("double"),
        )
    )
