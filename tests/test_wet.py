"""Common Crawl WET/WAT (`sources/wet.py`): write/read round trips,
type filters, missing-envelope-path semantics, plugin registration."""

import json

from pyspark.sql import functions as F  # noqa: F401


def _wet_rows(spark, n=6):
    rows = [
        (
            f"part-{i % 2}.warc.wet.gz",
            f"rec-{i:04d}",
            f"https://x.test/{i}",
            "2026-02-03T04:05:06Z",
            f"text body {i} alpha",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, text string",
    )


def test_wet_roundtrip(spark, tmp_path):
    from minerva_etl_spark.sources.wet import read_wet, write_wet_files

    d = str(tmp_path / "wet")
    written = write_wet_files(_wet_rows(spark), d).collect()
    assert sum(r.n_records for r in written) == 6
    back = {
        r.record_id: r for r in read_wet(spark, d).collect()
    }
    assert len(back) == 6
    assert back["urn:uuid:rec-0002"].text == "text body 2 alpha"
    assert back["urn:uuid:rec-0002"].n_chars == 17
    assert back["urn:uuid:rec-0005"].target_uri == "https://x.test/5"


def test_wet_reader_filters_non_conversion_records(spark, tmp_path):
    """A WET shard mixed with a warcinfo record (real shards lead
    with one) yields only the conversion rows."""
    from minerva_etl_spark.sources.warc import (
        synthesize_warc,
        synthesize_warc_record,
    )
    from minerva_etl_spark.sources.wet import read_wet

    recs = [
        synthesize_warc_record(
            "warcinfo", b"software: test", record_id="info-1",
            content_type="application/warc-fields",
        ),
        synthesize_warc_record(
            "conversion", "kept text".encode(), record_id="rec-1",
            target_uri="https://x.test/1",
            content_type="text/plain",
        ),
    ]
    p = tmp_path / "mixed.warc.wet.gz"
    p.write_bytes(synthesize_warc(recs))
    out = read_wet(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].text == "kept text"


def _wat_env(i, with_html=True):
    http = {"Headers": {"Content-Type": "text/html"}}
    if with_html:
        http["HTML-Metadata"] = {
            "Head": {"Title": f"Title {i}"},
            "Links": [{"url": f"/l{j}"} for j in range(i % 3)],
        }
    return json.dumps(
        {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": f"https://x.test/{i}"
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": http
                },
            }
        }
    )


def test_wat_roundtrip_and_missing_paths(spark, tmp_path):
    from minerva_etl_spark.sources.wet import read_wat, write_wat_files

    rows = [
        (
            "f0.warc.wat.gz",
            f"rec-{i:04d}",
            f"https://x.test/{i}",
            "2026-02-03T04:05:06Z",
            _wat_env(i, with_html=(i != 3)),
        )
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, meta_json string",
    )
    d = str(tmp_path / "wat")
    write_wat_files(df, d).collect()
    back = {r.record_id: r for r in read_wat(spark, d).collect()}
    assert back["urn:uuid:rec-0002"].title == "Title 2"
    assert back["urn:uuid:rec-0002"].n_links == 2
    assert back["urn:uuid:rec-0002"].http_content_type == "text/html"
    # non-HTML response: title NULL, links 0 (missing-path semantics)
    assert back["urn:uuid:rec-0003"].title is None
    assert back["urn:uuid:rec-0003"].n_links == 0


def test_wet_wat_registered_as_harvest_plugins(spark, tmp_path):
    from minerva_etl_spark.sources.plugins import get_plugin
    from minerva_etl_spark.sources.wet import write_wet_files

    d = str(tmp_path / "wet")
    write_wet_files(_wet_rows(spark, 3), d).collect()
    out = get_plugin("wet")(spark, d, None).collect()
    assert len(out) == 3
    assert get_plugin("wat") is not None
