"""WebDataset shard export/import (`operators/wds.py`): paired-member
round trip, binary fidelity, deterministic shard assignment, and the
pivot-back recipe."""

from pyspark.sql import functions as F

from minerva_etl_spark.operators.wds import (
    wds_export,
    wds_import,
    wds_shard_expr,
)


def _corpus(spark):
    rows = [
        (1, b"\x89PNG\x0d\x0a\x1a\x0afakepixels", "a caption one"),
        (2, b"\xff\xd8\xffjpegish\x00bytes", "caption two"),
        (17, b"", "empty payload still a sample"),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, payload binary, caption string"
    )


def test_round_trip_binary_and_text(spark, tmp_path):
    df = _corpus(spark)
    report = wds_export(
        df, str(tmp_path), {"payload": "img", "caption": "txt"},
        n_shards=2,
    )
    assert report.agg(F.sum("n_members")).collect()[0][0] == 6
    back = wds_import(spark, str(tmp_path))
    by = {(int(r.key), r.ext): bytes(r.content) for r in back.collect()}
    for r in df.collect():
        assert by[(r.doc_id, "img")] == bytes(r.payload)
        assert by[(r.doc_id, "txt")] == r.caption.encode()


def test_sample_members_share_shard_and_key_padding(spark, tmp_path):
    df = _corpus(spark)
    wds_export(
        df, str(tmp_path), {"payload": "img", "caption": "txt"},
        n_shards=4,
    ).collect()
    back = wds_import(spark, str(tmp_path))
    # both members of a sample land in the SAME shard (the loader
    # contract: a sample never spans shards)
    per_key = (
        back.groupBy("key")
        .agg(F.countDistinct("shard").alias("ns"),
             F.count(F.lit(1)).alias("nm"))
        .collect()
    )
    assert all(r.ns == 1 and r.nm == 2 for r in per_key)
    # integral keys are zero-padded to 12 so name order == key order
    assert {r.key for r in back.collect()} == {
        "000000000001", "000000000002", "000000000017"
    }


def test_shard_assignment_is_md5_draw(spark, tmp_path):
    df = _corpus(spark)
    expect = {
        str(r.doc_id).zfill(12): f"shard-{r.s:06d}.tar"
        for r in df.select(
            "doc_id", wds_shard_expr("doc_id", 4).alias("s")
        ).collect()
    }
    wds_export(
        df, str(tmp_path), {"caption": "txt"}, n_shards=4
    ).collect()
    got = {
        r.key: r.shard
        for r in wds_import(spark, str(tmp_path)).collect()
    }
    assert got == expect


def test_pivot_back_to_columns(spark, tmp_path):
    df = _corpus(spark)
    wds_export(
        df, str(tmp_path), {"payload": "img", "caption": "txt"},
        n_shards=2,
    ).collect()
    wide = (
        wds_import(spark, str(tmp_path))
        .groupBy(F.col("key").cast("bigint").alias("doc_id"))
        .pivot("ext", ["img", "txt"])
        .agg(F.first("content"))
    )
    rows = {r.doc_id: r for r in wide.collect()}
    assert bytes(rows[2].img) == b"\xff\xd8\xffjpegish\x00bytes"
    assert bytes(rows[1].txt) == b"a caption one"


def test_string_keys_pass_through_unpadded(spark, tmp_path):
    df = spark.createDataFrame(
        [("img_aa", "x"), ("img_bb", "y")], "name string, caption string"
    )
    wds_export(
        df, str(tmp_path), {"caption": "txt"}, key_col="name",
        n_shards=2,
    ).collect()
    keys = {
        r.key for r in wds_import(spark, str(tmp_path)).collect()
    }
    assert keys == {"img_aa", "img_bb"}
