"""Archive ingest (tar/zip): member iteration, Spark read/write round
trips, harvest-plugin path, member filtering, dirty-archive policy,
and the CLI verbs."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest

from minerva_etl_spark.sources.archive import (
    iter_members,
    read_archives,
    write_archives,
)


def _tar_bytes(members: dict[str, bytes], mode: str = "gz") -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=f"w:{mode}") as tf:
        d = tarfile.TarInfo("subdir/")  # dir member: skipped
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_iter_members_tar_zip_and_magic_fallback():
    m = {"a.txt": b"alpha", "b/c.txt": b"beta"}
    assert dict(iter_members("s.tar.gz", _tar_bytes(m))) == m
    assert dict(iter_members("s.tar", _tar_bytes(m, ""))) == m
    assert dict(iter_members("s.zip", _zip_bytes(m))) == m
    # a zip with a lying extension still parses via magic bytes
    assert dict(iter_members("s.data", _zip_bytes(m))) == m
    with pytest.raises(ValueError, match="not a tar/zip"):
        list(iter_members("s.tar", b"definitely not a tar"))
    with pytest.raises(ValueError, match="corrupt zip"):
        list(iter_members("s.zip", b"PK\x03\x04 broken"))


def test_read_archives_mixed_dir(tmp_path, spark):
    (tmp_path / "one.tar.gz").write_bytes(
        _tar_bytes({"x.txt": b"tar text", "img.bin": b"\xff\xfe\x00"})
    )
    (tmp_path / "two.zip").write_bytes(_zip_bytes({"y.txt": b"zip text"}))
    rows = {
        (r.archive, r.member): r
        for r in read_archives(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {
        ("one.tar.gz", "x.txt"), ("one.tar.gz", "img.bin"),
        ("two.zip", "y.txt"),
    }
    r = rows[("one.tar.gz", "x.txt")]
    assert r.size == 8 and r.text == "tar text" and bytes(r.content) == b"tar text"
    assert rows[("one.tar.gz", "img.bin")].text is None  # not utf-8


def test_read_archives_member_glob_and_skip(tmp_path, spark):
    (tmp_path / "ok.zip").write_bytes(
        _zip_bytes({"keep.txt": b"k", "drop.json": b"d"})
    )
    (tmp_path / "bad.tar").write_bytes(b"garbage not a tar file....")
    got = read_archives(
        spark, str(tmp_path), members_glob="*.txt", on_error="skip"
    ).collect()
    assert [(r.archive, r.member) for r in got] == [("ok.zip", "keep.txt")]
    with pytest.raises(Exception, match="not a tar/zip"):
        read_archives(spark, str(tmp_path)).collect()


def test_write_read_round_trip_both_formats(tmp_path, spark):
    rows = [
        ("shard-0.zip", "a.txt", b"zip a"),
        ("shard-0.zip", "b.txt", b"zip b"),
        ("shard-1.tar.gz", "c.txt", b"tar c"),
    ]
    df = spark.createDataFrame(
        rows, "archive string, member string, content binary"
    )
    out = tmp_path / "arcs"
    report = {
        r.archive: r
        for r in write_archives(df, str(out)).collect()
    }
    assert report["shard-0.zip"].n_members == 2
    assert report["shard-1.tar.gz"].n_members == 1
    back = {
        (r.archive, r.member): bytes(r.content)
        for r in read_archives(spark, str(out)).collect()
    }
    assert back == {(a, m): c for a, m, c in rows}


def test_harvest_plugin_path(tmp_path, spark):
    from minerva_etl_spark.sources.plugins import get_plugin

    (tmp_path / "docs.tgz").write_bytes(_tar_bytes({"d.txt": b"doc"}))
    for ftype in ("tar", "zip"):
        df = get_plugin(ftype)(spark, str(tmp_path / "docs.tgz"), None)
        assert df.collect()[0].text == "doc"


def test_cli_archive_read_and_export(tmp_path, spark):
    from minerva_etl_spark.cli import main

    (tmp_path / "in.zip").write_bytes(_zip_bytes({"m.txt": b"cli"}))
    rd = str(tmp_path / "rows")
    main(["archive", "read", "--input", str(tmp_path / "in.zip"),
          "--output", rd])
    rows = spark.read.parquet(rd).collect()
    assert len(rows) == 1 and rows[0].text == "cli"

    exp = str(tmp_path / "report")
    out_dir = str(tmp_path / "outarcs")
    main(["archive", "export", "--input", rd, "--output", exp,
          "--output-dir", out_dir])
    back = read_archives(spark, out_dir).collect()
    assert len(back) == 1 and back[0].member == "m.txt"


def test_corrupt_member_data_is_skippable(tmp_path, spark):
    """zlib/EOF-class corruption inside member data must surface as
    the same ValueError on_error='skip' can skip."""
    import io
    import zipfile as _zf

    buf = io.BytesIO()
    with _zf.ZipFile(buf, "w", _zf.ZIP_DEFLATED) as zf:
        zf.writestr("a.txt", b"x" * 400)
    blob = bytearray(buf.getvalue())
    at = blob.find(b"a.txt") + 10  # flip bytes inside the deflate data
    blob[at] ^= 0xFF
    blob[at + 1] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt zip"):
        list(iter_members("s.zip", bytes(blob)))
    # truncated gzip tar: EOFError class -> ValueError too
    whole = _tar_bytes({"b.txt": b"y" * 400})
    with pytest.raises(ValueError, match="not a tar/zip"):
        list(iter_members("s.tar.gz", whole[: len(whole) // 2]))
    (tmp_path / "bad.zip").write_bytes(bytes(blob))
    (tmp_path / "ok.zip").write_bytes(_zip_bytes({"c.txt": b"ok"}))
    got = read_archives(spark, str(tmp_path), on_error="skip").collect()
    assert [(r.archive, r.member) for r in got] == [("ok.zip", "c.txt")]


def test_plugins_resolve_without_prior_import(tmp_path):
    """get_plugin('tar'|'zip'|'warc') must work on a code path that
    never imported the source modules (the load-data CLI path) — the
    registry imports built-ins lazily."""
    import subprocess
    import sys

    code = (
        "from minerva_etl_spark.sources.plugins import get_plugin\n"
        "assert callable(get_plugin('tar'))\n"
        "assert callable(get_plugin('zip'))\n"
        "assert callable(get_plugin('warc'))\n"
        "print('plugins-ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert "plugins-ok" in out.stdout, out.stderr[-500:]


def test_orc_plugin_roundtrip(spark, tmp_path):
    """The ORC harvest plugin (S2 family) reads back a Spark-written
    ORC dataset value-exactly through the same get_plugin dispatch."""
    from minerva_etl_spark.sources.plugins import get_plugin, list_plugins

    assert "orc" in list_plugins()
    src = spark.createDataFrame(
        [(1, "alpha", 3.5), (2, "beta", -1.25)],
        "id bigint, name string, score double",
    )
    path = str(tmp_path / "data_orc")
    src.write.orc(path)
    back = get_plugin("orc")(spark, path, None)
    assert sorted(back.collect()) == sorted(src.collect())
