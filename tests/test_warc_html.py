"""WARC harvest source + HTML extraction tests."""

import gzip
import io

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.operators.html import extract_html, html_extract
from minerva_etl_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    synthesize_http_response,
    synthesize_warc,
    synthesize_warc_record,
    write_warc_files,
)


def _sample_records():
    info = synthesize_warc_record(
        "warcinfo",
        b"software: minerva-etl-spark\r\n",
        record_id="info-1",
        content_type="application/warc-fields",
    )
    html = b"<html><body><p>hello crawl</p></body></html>"
    resp = synthesize_warc_record(
        "response",
        synthesize_http_response(html),
        record_id="rec-2",
        target_uri="https://corpus.test/d/2",
        warc_date="2026-02-03T04:05:06Z",
        content_type="application/http; msgtype=response",
    )
    req = synthesize_warc_record(
        "request",
        b"GET /d/2 HTTP/1.1\r\nHost: corpus.test\r\n\r\n",
        record_id="req-2",
        target_uri="https://corpus.test/d/2",
        content_type="application/http; msgtype=request",
    )
    return [info, resp, req], html


@pytest.mark.parametrize("gz", [False, True])
def test_iter_warc_records_roundtrip(gz):
    recs, html = _sample_records()
    blob = synthesize_warc(recs, gzip_members=gz)
    out = list(iter_warc_records(blob))
    assert [r["warc_type"] for r in out] == ["warcinfo", "response", "request"]
    assert out[0]["record_id"] == "urn:uuid:info-1"
    # the response record is HTTP-unwrapped: status parsed, body sliced
    assert out[1]["http_status"] == 200
    assert out[1]["http_content_type"] == "text/html"
    assert out[1]["body"] == html
    assert out[1]["target_uri"] == "https://corpus.test/d/2"
    assert out[1]["warc_date"] == "2026-02-03T04:05:06Z"
    # WARC-level content length covers the whole HTTP message
    assert out[1]["content_length"] > len(html)
    # non-response records keep their raw body and a null status
    assert out[2]["http_status"] is None
    assert out[2]["body"].startswith(b"GET /d/2")


def test_gzip_members_are_individually_valid():
    """Common Crawl layout: each record its own gzip member, so a
    range request + single-member gunzip recovers one record."""
    import zlib

    recs, _ = _sample_records()
    blob = synthesize_warc(recs, gzip_members=True)
    # first member decompresses alone to exactly the first record
    d = zlib.decompressobj(wbits=31)
    assert d.decompress(blob) == recs[0]
    # and a trailing member remains (i.e. records really are separate
    # members, not one stream)
    assert d.unused_data
    assert gzip.GzipFile(fileobj=io.BytesIO(blob)).read() == b"".join(recs)


def test_read_warc_spark(spark, tmp_path):
    recs, html = _sample_records()
    (tmp_path / "a.warc.gz").write_bytes(
        synthesize_warc(recs, gzip_members=True)
    )
    (tmp_path / "b.warc").write_bytes(
        synthesize_warc(recs, gzip_members=False)
    )
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6  # 3 records x 2 files, mixed plain/gzip
    resp = [r for r in rows if r.warc_type == "response"]
    assert {bytes(r.body) for r in resp} == {html}
    assert {r.http_status for r in resp} == {200}
    assert len({r.warc_file for r in rows}) == 2


def test_warc_plugin_registered(spark, tmp_path):
    from minerva_etl_spark.sources.plugins import get_plugin

    recs, _ = _sample_records()
    (tmp_path / "a.warc.gz").write_bytes(synthesize_warc(recs))
    df = get_plugin("warc")(spark, str(tmp_path), None)
    assert df.count() == 3


def test_write_warc_files_roundtrip(spark, tmp_path):
    data = [
        (f"part-{i % 2}.warc.gz", f"doc-{i}", f"https://t/{i}",
         "2026-01-01T00:00:00Z", f"payload {i}".encode())
        for i in range(6)
    ]
    df = spark.createDataFrame(
        data,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, body binary",
    )
    out = str(tmp_path / "export")
    stats = {r.warc_file: r.n_records
             for r in write_warc_files(df, out).collect()}
    assert stats == {"part-0.warc.gz": 3, "part-1.warc.gz": 3}
    back = read_warc(spark, out).collect()
    assert sorted(bytes(r.body).decode() for r in back) == sorted(
        f"payload {i}" for i in range(6)
    )
    assert all(r.http_status == 200 for r in back)


def test_warc_read_to_export_roundtrip_with_nulls(spark, tmp_path):
    """The advertised warc-read -> warc-export loop: read output
    carries null http_status / http_content_type on warcinfo and
    request records (pandas NaN), which the writer must default to
    200 / text/html instead of crashing on int(nan) or emitting a
    literal 'nan' header."""
    recs, html = _sample_records()
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(synthesize_warc(recs))
    df = read_warc(spark, str(src)).withColumn(
        "warc_file", F.lit("out.warc.gz")
    )
    out = str(tmp_path / "export")
    stats = write_warc_files(df, out).collect()
    assert stats[0].n_records == 3
    back = read_warc(spark, out).collect()
    assert len(back) == 3
    # every exported record is a response with defaulted headers
    assert all(r.http_status == 200 for r in back)
    assert all(r.http_content_type == "text/html" for r in back)
    assert not any("nan" in (r.http_content_type or "") for r in back)
    bodies = {bytes(r.body) for r in back}
    assert html in bodies


def test_missing_content_length_raises_specific_error():
    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:x-1>\r\n"
        b"\r\n"
        b"body bytes\r\n\r\n"
    )
    with pytest.raises(ValueError, match="missing.*Content-Length"):
        list(iter_warc_records(rec))


def test_extract_html_semantics():
    html = (
        "<html><head><title>A  Title</title>"
        "<style>p { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><nav>menu &amp; more</nav>"
        "<p>first   paragraph</p><p>second<br/>line</p>"
        '<a href="/x">link one</a> and <a href="/y">link two</a>'
        "<div>tail</div></body></html>"
    )
    d = extract_html(html)
    assert d["title"] == "A Title"
    assert d["n_links"] == 2
    assert d["text"] == (
        "menu & more\nfirst paragraph\nsecond\nline\n"
        "link one and link two\ntail"
    )


def test_extract_html_skips_nested_and_unescapes():
    d = extract_html(
        "<div><noscript><p>no js</p></noscript>kept &lt;tag&gt;</div>"
    )
    assert d["text"] == "kept <tag>"
    assert d["n_links"] == 0


def test_html_extract_spark(spark):
    df = spark.createDataFrame(
        [(1, "<title>t1</title><p>alpha</p>"),
         (2, "<p>beta</p><a href='/z'>z</a>")],
        "doc_id bigint, html string",
    )
    rows = {r.doc_id: r for r in html_extract(df).collect()}
    assert rows[1].title == "t1" and rows[1].text == "alpha"
    assert rows[2].text == "beta\nz"
    assert rows[2].n_links == 1


def test_warc_to_text_pipeline(spark, tmp_path):
    """End-to-end crawl shape: WARC file -> records -> HTML extract."""
    html_t = "<html><head><title>Doc %d</title></head><body><p>%s</p></body></html>"
    recs = [
        synthesize_warc_record(
            "response",
            synthesize_http_response((html_t % (i, f"w{i} " * 3)).encode()),
            record_id=f"doc-{i}",
            target_uri=f"https://t/{i}",
            content_type="application/http; msgtype=response",
        )
        for i in range(4)
    ]
    (tmp_path / "c.warc.gz").write_bytes(synthesize_warc(recs))
    from pyspark.sql import functions as F

    records = read_warc(spark, str(tmp_path)).where(
        F.col("warc_type") == "response"
    )
    docs = records.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("bigint")
        .alias("doc_id"),
        F.col("body").alias("html"),
    )
    out = {r.doc_id: r for r in html_extract(docs).collect()}
    assert len(out) == 4
    assert out[2].title == "Doc 2"
    assert out[2].text == "w2 w2 w2"


def test_cli_crawl_verbs(spark, tmp_path):
    """`crawl warc-read` / `warc-export` / `warc-to-text` through the
    CLI, parity with how an operator drives the harvest edge."""
    from minerva_etl_spark.cli import main

    html_t = (
        "<html><head><title>Doc %d</title></head>"
        "<body><p>%s</p></body></html>"
    )
    recs = [
        synthesize_warc_record(
            "response",
            synthesize_http_response((html_t % (i, f"w{i} body")).encode()),
            record_id=f"doc-{i}",
            target_uri=f"https://t/{i}",
            content_type="application/http; msgtype=response",
        )
        for i in range(5)
    ]
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    (warc_dir / "seg.warc.gz").write_bytes(synthesize_warc(recs))

    records_out = str(tmp_path / "records")
    main(["crawl", "warc-read", "--input", str(warc_dir),
          "--output", records_out, "--types", "response"])
    got = spark.read.parquet(records_out)
    assert got.count() == 5
    assert set(got.select("warc_type").distinct().toPandas()["warc_type"]) \
        == {"response"}

    text_out = str(tmp_path / "docs")
    main(["crawl", "warc-to-text", "--input", str(warc_dir),
          "--output", text_out])
    docs = spark.read.parquet(text_out)
    assert docs.count() == 5
    rows = {r.title: r.text for r in docs.collect()}
    assert rows["Doc 3"] == "w3 body"

    export_dir = str(tmp_path / "export")
    staged = str(tmp_path / "staged")
    spark.createDataFrame(
        [("out.warc.gz", f"r-{i}", f"https://t/{i}",
          "2026-01-01T00:00:00Z", f"b{i}".encode()) for i in range(3)],
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, body binary",
    ).write.parquet(staged)
    main(["crawl", "warc-export", "--input", staged,
          "--output", export_dir, "--output-dir", export_dir])
    back = read_warc(spark, export_dir)
    assert back.count() == 3
