"""WebDataset-style shard export/import — the multimodal training
hand-off format (round 11).

Large multimodal training jobs do not read parquet: loaders stream
sequential tar shards in which one SAMPLE is the group of members
sharing a basename key — ``000017.jpg`` + ``000017.txt`` +
``000017.json`` is one (image, caption, metadata) sample (the
WebDataset convention, webdataset/webdataset; also the tarfile
layout of img2dataset/LAION distribution).  This module is the
export edge from a curated corpus DataFrame to that layout, and the
import edge back.

Layout rules implemented:

- shard files are ``{prefix}-{NNNNNN}.tar`` in one directory;
- a sample's members are ``{key}.{ext}``, one per exported column
  (binary columns byte-for-byte, strings UTF-8);
- shard assignment is the repo's deterministic md5 draw on the key
  (``pmod(conv(substr(md5(key),1,15),16,10), n_shards)`` — the same
  convention every sampling operator uses, so DuckDB recomputes it),
  which is also what a shuffled training run wants: hash-sharding IS
  the global shuffle, each shard a uniform sample of the corpus;
- members within a shard are written in sorted-name order
  (`write_archives`), so shard bytes are deterministic.

Scale shape: melt (one projection) → `write_archives`' one-task-per-
shard applyInPandas group write — the correct unsplittable unit, as
with the archive/WARC exporters; a shard never buffers more than
itself.  Import is `read_archives`' one-task-per-shard member walk.
Pick ``n_shards`` so a shard is 100 MB–1 GB at your corpus scale
(SCALE.md "Document ingest edge" discipline).

Reference parity: extension surface — the reference's nearest analog
is the CSV export of `src/minerva/commands/trend_store.py` semantics
(tabular only); the paired-member sample layout is the multimodal
addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["wds_export", "wds_import", "wds_shard_expr"]


def wds_shard_expr(key_col: str, n_shards: int) -> F.Column:
    """Deterministic shard id for a sample key — the engine-wide md5
    draw (DuckDB twin:
    ``CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) % n``)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
            16,
            10,
        ).cast("bigint"),
        F.lit(int(n_shards)),
    )


def wds_export(
    df: DataFrame,
    out_dir: str,
    exts: dict[str, str],
    key_col: str = "doc_id",
    n_shards: int = 8,
    prefix: str = "shard",
) -> DataFrame:
    """Export one tar-shard set: ``exts`` maps COLUMN → member
    extension (e.g. ``{"payload": "jpg", "text": "txt"}``); every row
    becomes ``len(exts)`` members named ``{key}.{ext}`` inside shard
    ``{prefix}-{NNNNNN}.tar`` chosen by the md5 draw on the key.
    Keys are zero-padded to 12 digits when integral so member order
    inside a shard follows key order.  Returns `write_archives`'
    (archive, n_members, n_bytes) report."""
    from minerva_etl_spark.sources.archive import write_archives

    key_s = (
        F.lpad(F.col(key_col).cast("string"), 12, "0")
        if dict(df.dtypes).get(key_col) in ("bigint", "int", "smallint")
        else F.col(key_col).cast("string")
    )
    shard = F.concat(
        F.lit(prefix + "-"),
        F.lpad(
            wds_shard_expr(key_col, n_shards).cast("string"), 6, "0"
        ),
        F.lit(".tar"),
    )
    parts = []
    for col, ext in sorted(exts.items()):
        parts.append(
            df.select(
                shard.alias("archive"),
                F.concat(key_s, F.lit("." + ext)).alias("member"),
                F.col(col).cast("binary").alias("content"),
            )
        )
    melted = parts[0]
    for p in parts[1:]:
        melted = melted.unionByName(p)
    return write_archives(melted, out_dir)


def wds_import(
    spark: SparkSession,
    shard_dir: str,
) -> DataFrame:
    """Read a shard directory back to long form:
    ``(shard, key, ext, content)`` — one row per member, the sample
    being the group of rows sharing ``key``.  Pivot to columns with
    ``groupBy("key").pivot("ext")`` when the extension set is known
    and small."""
    from minerva_etl_spark.sources.archive import read_archives

    m = read_archives(spark, shard_dir)
    return m.select(
        F.col("archive").alias("shard"),
        F.regexp_extract("member", r"^(.*)\.([^.]+)$", 1).alias("key"),
        F.regexp_extract("member", r"^(.*)\.([^.]+)$", 2).alias("ext"),
        "content",
    )
