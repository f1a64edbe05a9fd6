"""Trigger evaluation, CSV harvest ingest, DN helpers, SQL translation,
attribute store, notification store, multimodal plumbing."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.catalog.directory import (
    dn_entity_name_expr,
    dn_entity_type_expr,
    dn_to_parts,
    names_to_entity_ids,
    register_entities,
)
from minerva_etl_spark.operators.multimodal import (
    deterministic_fake_decode,
    extract_features,
    sample_frames,
)
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.sources.csv_harvest import CsvParserConfig, read_csv_packages
from minerva_etl_spark.store.attribute_store import AttributeStore
from minerva_etl_spark.store.notification import NotificationStore
from minerva_etl_spark.trigger.trigger import Trigger


def ts(*args):
    return datetime(*args)


# ------------------------------------------------------------------ trigger
def test_trigger_fires_over_threshold(spark):
    def kpi(spark_, timestamps):
        return spark.createDataFrame(
            [
                (1, ts(2024, 1, 1, 0, 15), 0.08),
                (2, ts(2024, 1, 1, 0, 15), 0.01),
            ],
            "entity_id bigint, timestamp timestamp_ntz, power_mwh double",
        )

    trig = Trigger(
        name="HighPowerUsage",
        kpi=kpi,
        thresholds={"max_power": 0.05},
        condition="power_mwh > max_power",
        weight="100",
        notification_message="concat('power ', power_mwh)",
    )
    out = trig.evaluate(spark, [ts(2024, 1, 1, 0, 15)]).collect()
    assert len(out) == 1
    row = out[0]
    assert row.entity_id == 1 and row.weight == 100 and row.rule == "HighPowerUsage"
    assert "0.08" in row.details and "0.08" in row.data


# -------------------------------------------------------------- csv harvest
def test_csv_harvest_deduction_and_ids(spark, tmp_path):
    p = tmp_path / "sample.csv"
    p.write_text(
        "node,timestamp,power_kwh,state\n"
        "hillside14,2024-01-01 00:15:00,1.5,up\n"
        "hillside15,2024-01-01 00:15:00,,down\n"
    )
    cfg = CsvParserConfig(
        identifier_column="node",
        timestamp_column="timestamp",
        entity_type="node",
        granularity="15m",
    )
    df = read_csv_packages(spark, str(p), cfg)
    rows = {r.entity_ref: r for r in df.collect()}
    assert rows["hillside14"].power_kwh == 1.5
    assert rows["hillside15"].power_kwh is None
    assert rows["hillside14"].state == "up"
    assert rows["hillside14"].timestamp == ts(2024, 1, 1, 0, 15)
    # deterministic ids: same name -> same id on re-read
    df2 = read_csv_packages(spark, str(p), cfg)
    assert (
        df.select("entity_id").collect() == df2.select("entity_id").collect()
    )


def test_jsonl_harvest_matches_csv_twin(spark, tmp_path):
    """The JSONL harvest flavor loads a file to the SAME typed frame as
    its CSV twin: primitivesAsString + the shared deduction ladder."""
    from minerva_etl_spark.sources.plugins import get_plugin

    c = tmp_path / "sample.csv"
    c.write_text(
        "node,timestamp,power_kwh,state\n"
        "hillside14,2024-01-01 00:15:00,1.5,up\n"
        "hillside15,2024-01-01 00:15:00,7,down\n"
    )
    j = tmp_path / "sample.jsonl"
    j.write_text(
        '{"node": "hillside14", "timestamp": "2024-01-01 00:15:00",'
        ' "power_kwh": 1.5, "state": "up"}\n'
        '{"node": "hillside15", "timestamp": "2024-01-01 00:15:00",'
        ' "power_kwh": 7, "state": "down"}\n'
    )
    cfg = dict(
        identifier_column="node",
        timestamp_column="timestamp",
        entity_type="node",
        granularity="15m",
        id_method="md5",
    )
    a = get_plugin("csv")(spark, str(c), dict(cfg))
    b = get_plugin("jsonl")(spark, str(j), dict(cfg))
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    assert dict(a.dtypes) == dict(b.dtypes)
    ra = sorted(a.select(*cols).collect())
    rb = sorted(b.select(*cols).collect())
    assert ra == rb


def test_jsonl_harvest_rejects_nested_records(spark, tmp_path):
    """Nested objects/arrays survive primitivesAsString as structs the
    type ladder cannot parse — the reader must fail cleanly, naming the
    offending columns."""
    import pytest

    from minerva_etl_spark.sources.plugins import get_plugin

    j = tmp_path / "nested.jsonl"
    j.write_text(
        '{"node": "a", "timestamp": "2024-01-01 00:15:00",'
        ' "meta": {"x": 1}, "vals": [1, 2]}\n'
    )
    cfg = dict(identifier_column="node", timestamp_column="timestamp",
               entity_type="node", id_method="md5")
    with pytest.raises(ValueError, match="meta, vals"):
        get_plugin("jsonl")(spark, str(j), dict(cfg))


def test_register_entities_create_on_miss(spark, tmp_path):
    dim_path = str(tmp_path / "entity_node")
    names1 = spark.createDataFrame([("a",), ("b",)], "name string")
    dim = register_entities(spark, dim_path, names1, "node")
    assert dim.count() == 2
    names2 = spark.createDataFrame([("b",), ("c",)], "name string")
    dim = register_entities(spark, dim_path, names2, "node")
    assert dim.count() == 3  # only 'c' inserted


# ---------------------------------------------------------------------- dn
def test_dn_parse_and_explode(spark):
    df = spark.createDataFrame([("network=g1,node=n001",)], "dn string")
    row = df.select(
        dn_entity_type_expr("dn").alias("t"), dn_entity_name_expr("dn").alias("n")
    ).collect()[0]
    assert (row.t, row.n) == ("node", "n001")
    parts = dn_to_parts(df).collect()
    assert [(p.pos, p.key, p.value) for p in parts] == [
        (0, "network", "g1"),
        (1, "node", "n001"),
    ]


# ------------------------------------------------------------ sql translate
def test_translate_casts_and_functions():
    assert translate("x::bigint") == "CAST(x AS bigint)"
    assert translate("sum(v)::numeric") == "CAST(sum(v) AS decimal(38,18))"
    assert (
        translate("power_kwh * 1000::double precision")
        == "power_kwh * CAST(1000 AS double)"
    )
    assert translate('SELECT * FROM trend."node_main_15m"') == (
        "SELECT * FROM node_main_15m"
    )
    assert translate("string_agg(name, ',')") == (
        "array_join(collect_list(name), ',')"
    )
    assert translate("now()") == "current_timestamp()"
    assert "explode(sequence(" in translate("generate_series(a, b, c)")


# ---------------------------------------------------------- attribute store
def test_attribute_store_scd_cycle(spark, tmp_path):
    st = AttributeStore("ds", "node", ["height", "state"], str(tmp_path))
    st.store_batch(spark, spark.createDataFrame(
        [(1, ts(2024, 1, 1), 10.0, "up"), (1, ts(2024, 1, 2), 10.0, "up")],
        "entity_id bigint, timestamp timestamp_ntz, height double, state string",
    ))
    st.store_batch(spark, spark.createDataFrame(
        [(1, ts(2024, 1, 3), 12.0, "down")],
        "entity_id bigint, timestamp timestamp_ntz, height double, state string",
    ))
    assert st.read_history(spark).count() == 3
    st.compact(spark)
    hist = st.read_history(spark).collect()
    # run of identical (10.0, up) collapses to its first row
    assert len(hist) == 2
    curr = st.materialize_curr(spark).collect()
    assert len(curr) == 1 and curr[0].height == 12.0 and curr[0].state == "down"


# -------------------------------------------------------- notification store
def test_notification_append(spark, tmp_path):
    ns = NotificationStore("trigger-notification", ["rule", "weight"], str(tmp_path))
    batch = spark.createDataFrame(
        [(1, ts(2024, 1, 1, 0, 15), "r", 100)],
        "entity_id bigint, timestamp timestamp_ntz, rule string, weight int",
    )
    ns.store(batch)
    ns.store(batch)
    assert ns.read(spark).count() == 2  # append-only


def test_notification_typed_attributes(spark, tmp_path):
    """Declared attribute types are enforced on every append (reference
    notificationstore.py:17-97): weight coerced to the declared integer,
    a map payload canonicalized to a JSON string, missing declared
    columns rejected, undeclared extras dropped."""
    import pytest

    ns = NotificationStore(
        "typed",
        [
            {"name": "rule", "data_type": "text"},
            {"name": "weight", "data_type": "integer"},
            {"name": "data", "data_type": "json"},
        ],
        str(tmp_path),
    )
    batch = spark.createDataFrame(
        [(1, ts(2024, 1, 1, 0, 15), "r", "100", {"k": "v"}, "extra")],
        "entity_id bigint, timestamp timestamp_ntz, rule string, "
        "weight string, data map<string,string>, junk string",
    )
    ns.store(batch)
    # drift in a later append: weight arrives as bigint, data as string
    ns.store(
        spark.createDataFrame(
            [(2, ts(2024, 1, 1, 0, 30), "r2", 7, '{"x":"y"}')],
            "entity_id bigint, timestamp timestamp_ntz, rule string, "
            "weight bigint, data string",
        )
    )
    out = ns.read(spark)
    assert dict(out.dtypes)["weight"] == "int"
    assert "junk" not in out.columns
    rows = {r.entity_id: r for r in out.collect()}
    assert rows[1].weight == 100 and rows[1].data == '{"k":"v"}'
    assert rows[2].data == '{"x":"y"}'
    with pytest.raises(ValueError, match="missing declared attribute"):
        ns.store(
            spark.createDataFrame(
                [(3, ts(2024, 1, 1, 1, 0), "r3")],
                "entity_id bigint, timestamp timestamp_ntz, rule string",
            )
        )


# ------------------------------------------------------------- multimodal
def test_multimodal_feature_extract_and_frames(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"a" * 100)), (2, bytearray(b"\x00" * 2048)), (3, None)],
        "media_id bigint, payload binary",
    )
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[1].n_bytes == 100
    assert len(feats[1].feature) == 8
    assert abs(sum(feats[1].feature) - 1.0) < 1e-6
    assert feats[3].feature is None
    assert feats[1].feature == deterministic_fake_decode(b"a" * 100)

    frames = sample_frames(media, every_n_bytes=1024, max_frames=8).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    assert len(by_id[1]) == 1          # 100 bytes -> 1 frame
    assert len(by_id[2]) == 2          # 2048 bytes -> 2 frames
    assert 3 not in by_id              # null payload -> no frames
    assert len(bytes(by_id[2][0].frame_bytes)) == 1024


def test_alias_directory_resolution(spark):
    from minerva_etl_spark.catalog.directory import aliases_to_entity_ids

    alias_table = spark.createDataFrame(
        [("node-one", 11, "hostname"), ("node-1", 11, "short"),
         ("node-two", 22, "hostname")],
        "alias string, entity_id bigint, type string",
    )
    data = spark.createDataFrame(
        [("node-one",), ("node-two",), ("unknown",)], "alias string"
    )
    out = aliases_to_entity_ids(data, alias_table, alias_type="hostname")
    got = {r.alias: r.entity_id for r in out.collect()}
    assert got == {"node-one": 11, "node-two": 22, "unknown": None}


def test_attribute_store_array_typed(spark, tmp_path):
    """Array-typed attributes (reference test_store_batch_with_list_*):
    history, update, compact and curr all work on array<string>."""
    st = AttributeStore("ds", "node", ["tags", "height"], str(tmp_path))
    st.store_batch(spark, spark.createDataFrame(
        [(1, ts(2024, 1, 1), ["a", "b"], 10.0),
         (1, ts(2024, 1, 2), ["a", "b"], 10.0),
         (1, ts(2024, 1, 3), ["c"], 10.0)],
        "entity_id bigint, timestamp timestamp_ntz, tags array<string>, height double",
    ))
    st.compact(spark)
    hist = sorted(st.read_history(spark).collect(), key=lambda r: r.timestamp)
    assert [list(r.tags) for r in hist] == [["a", "b"], ["c"]]
    curr = st.materialize_curr(spark).collect()
    assert list(curr[0].tags) == ["c"]


def test_dn_escaped_comma_split(spark):
    """Reference split_parts/escape semantics: backslash-escaped commas
    stay inside one part; escape round-trips through the splitter."""
    from minerva_etl_spark.catalog.directory import (
        dn_escape_expr,
        dn_split_parts_expr,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("Word=asdf,Writer=qwerty\\,dvorak,Reader=Unicode",
          "qwerty,dvorak")],
        "dn string, raw string",
    )
    row = df.select(
        dn_split_parts_expr("dn").alias("parts"),
        dn_escape_expr("raw").alias("escaped"),
    ).collect()[0]
    assert row.parts == [
        "Word=asdf", "Writer=qwerty\\,dvorak", "Reader=Unicode",
    ]
    assert row.escaped == "qwerty\\,dvorak"
    # escape -> embed -> split round-trip keeps the value intact
    rt = df.select(
        dn_split_parts_expr("dn").alias("p")
    ).select(F.element_at("p", 2).alias("mid")).collect()[0]
    assert rt.mid == "Writer=qwerty\\,dvorak"


def test_dn_implode_roundtrip(spark):
    from minerva_etl_spark.catalog.directory import dn_implode

    df = spark.createDataFrame([("g1", "n001")], "network string, node string")
    out = df.select(dn_implode(("network", "network"), ("node", "node")).alias("dn"))
    row = out.select(
        "dn",
        dn_entity_type_expr("dn").alias("t"),
        dn_entity_name_expr("dn").alias("n"),
    ).collect()[0]
    assert row.dn == "network=g1,node=n001"
    assert (row.t, row.n) == ("node", "n001")


def test_translate_reference_example_corpus(spark):
    """Golden corpus: the actual SQL texts from the reference's
    tiny_instance examples translate to runnable Spark SQL
    (`examples/tiny_instance/materialization/hub-kpi_node_15m.yaml`,
    `relation/node->v-site.yaml`)."""
    kpi_view = (
        'SELECT\n'
        '  timestamp,\n'
        '  entity_id,\n'
        '  power_kwh * 1000 as power_mwh\n'
        'FROM trend."hub_node_main_15m"'
    )
    out = translate(kpi_view)
    assert 'FROM hub_node_main_15m' in out
    spark.createDataFrame(
        [(1, ts(2024, 1, 1), 0.5)],
        "entity_id bigint, timestamp timestamp_ntz, power_kwh double",
    ).createOrReplaceTempView("hub_node_main_15m")
    assert spark.sql(out).collect()[0].power_mwh == 500.0

    relation_query = (
        "SELECT\n"
        "  n.id AS source_id,\n"
        "  vs.id AS target_id\n"
        'FROM entity."node" n\n'
        'JOIN entity."v-site" vs ON vs.name = '
        "substring(n.name from '([a-z]+)-.*')\n"
        "GROUP BY n.id, vs.id"
    )
    out = translate(
        relation_query,
        table_resolver=lambda schema, name: f"{schema}_{name}".replace("-", "_"),
    )
    assert "regexp_extract(n.name, '([a-z]+)-.*', 1)" in out
    spark.createDataFrame(
        [(1, "alpha-1")], "id bigint, name string"
    ).createOrReplaceTempView("entity_node")
    spark.createDataFrame(
        [(100, "alpha")], "id bigint, name string"
    ).createOrReplaceTempView("entity_v_site")
    rows = spark.sql(out).collect()
    assert [(r.source_id, r.target_id) for r in rows] == [(1, 100)]

    # trigger notification shape: array_to_string + format
    notification = (
        "array_to_string(ARRAY['HighPowerUsage', "
        "format('%s > %s', power_kwh, max_power)], ',')"
    )
    out = translate(notification)
    assert out.startswith("array_join(array(")
    assert "format_string(" in out


def test_wav_synthesize_decode_roundtrip():
    """synthesize_wav emits a real RIFF/WAVE file the stdlib wave
    reader accepts, and wav_decode recovers exact rate/frames/duration
    and the hand-computable RMS."""
    import math

    from minerva_etl_spark.operators.multimodal import (
        synthesize_wav,
        wav_decode,
    )

    samples = [0, 100, -100, 1000, -1000, 32767, -32768, 7]
    payload = synthesize_wav(samples, sample_rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    d = wav_decode(payload)
    assert d["sample_rate"] == 8000
    assert d["n_frames"] == 8
    assert d["duration_ms"] == (8 * 1000) // 8000
    sumsq = sum(v * v for v in samples)
    want = math.floor((sumsq / 8) ** 0.5 * 1e6 + 0.5) / 1e6
    assert d["rms"] == want


def test_wav_decode_rejects_unsupported_width():
    """8- and 16-bit PCM decode; 24-bit stays an honest
    NotImplementedError."""
    import io
    import wave

    import pytest as _pytest

    from minerva_etl_spark.operators.multimodal import wav_decode

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)  # 24-bit
        w.setframerate(8000)
        w.writeframes(b"\x80\x80\x80" * 2)
    with _pytest.raises(NotImplementedError, match="24-bit"):
        wav_decode(buf.getvalue())


def test_wav_features_distributed(spark):
    """The mapInPandas path decodes per-task Arrow batches; empty audio
    yields rms 0.0 without crashing."""
    from minerva_etl_spark.operators.multimodal import (
        synthesize_wav,
        wav_features,
    )

    rows = [
        (1, synthesize_wav([10, -10, 20, -20], 16000)),
        (2, synthesize_wav([], 8000)),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r.media_id: r for r in wav_features(media).collect()}
    assert out[1].sample_rate == 16000 and out[1].n_frames == 4
    assert out[2].n_frames == 0 and out[2].rms == 0.0


def test_png_synthesize_decode_roundtrip_all_filters():
    """synthesize_png emits a real PNG (signature, chunked, zlib IDAT)
    and png_decode inverts every scanline filter type — Sub, Up,
    Average, Paeth — bit-exactly, for 1/2/3/4-channel images."""
    import random

    from minerva_etl_spark.operators.multimodal import (
        png_decode,
        synthesize_png,
    )

    rng = random.Random(7)
    for channels in (1, 2, 3, 4):
        for _ in range(8):
            w, h = rng.randint(1, 13), rng.randint(1, 9)
            px = bytes(rng.randrange(256) for _ in range(w * h * channels))
            filters = [rng.randrange(5) for _ in range(h)]
            payload = synthesize_png(px, w, h, channels, filters)
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
            d = png_decode(payload)
            assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
            assert bytes(d["pixels"]) == px


def test_png_decode_rejects_garbage():
    import pytest as _pytest

    from minerva_etl_spark.operators.multimodal import png_decode

    with _pytest.raises(ValueError):
        png_decode(b"GIF89a not a png")


def test_png_resize_nearest_neighbor_grid():
    """png_resize_bytes re-encodes a valid PNG whose pixel (x, y) is the
    source pixel at (x*W//new_w, y*H//new_h) — the floor-grid rule the
    oracle can replay."""
    from minerva_etl_spark.operators.multimodal import (
        png_decode,
        png_resize_bytes,
        synthesize_png,
    )

    w, h, c = 9, 7, 3
    px = bytes((y * 31 + x * 13 + ch * 101) % 256
               for y in range(h) for x in range(w) for ch in range(c))
    small = png_resize_bytes(synthesize_png(px, w, h, c), 4, 3)
    d = png_decode(small)
    assert (d["width"], d["height"]) == (4, 3)
    for y in range(3):
        for x in range(4):
            sx, sy = x * w // 4, y * h // 3
            for ch in range(c):
                assert (
                    d["pixels"][(y * 4 + x) * c + ch]
                    == px[(sy * w + sx) * c + ch]
                )


def test_png_features_distributed(spark):
    """The mapInPandas path decodes PNG Arrow batches per task and the
    resize operator composes with it (decode → resize → features)."""
    from minerva_etl_spark.operators.multimodal import (
        png_features,
        png_resize,
        synthesize_png,
    )

    px1 = bytes(range(0, 48))          # 4x4 gray
    px2 = bytes(v % 256 for v in range(0, 4 * 2 * 3))  # 4x2 rgb
    rows = [
        (1, synthesize_png(px1, 4, 4, 3, [0, 1, 2, 4])),
        (2, synthesize_png(px2, 4, 2, 3, [3, 4])),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r.media_id: r for r in png_features(media).collect()}
    assert out[1].width == 4 and out[1].height == 4 and out[1].n_channels == 3
    exp = [sum(px1[ch::3]) / 16 for ch in range(3)]
    import math

    assert out[1].channel_means == [
        math.floor(m * 1e6 + 0.5) / 1e6 for m in exp
    ]
    shrunk = {
        r.media_id: r
        for r in png_features(png_resize(media, 2, 2)).collect()
    }
    assert shrunk[1].width == 2 and shrunk[2].height == 2


def test_avi_synthesize_decode_roundtrip():
    """synthesize_avi emits a real RIFF 'AVI ' container (uncompressed
    24-bit DIB frames) and avi_decode recovers geometry, fps, and every
    frame's RGB pixels bit-exactly (bottom-up + BGR + padding undone)."""
    import random

    from minerva_etl_spark.operators.multimodal import (
        avi_decode,
        synthesize_avi,
    )

    rng = random.Random(11)
    for _ in range(10):
        w, h = rng.randint(1, 11), rng.randint(1, 7)
        nf = rng.randint(1, 6)
        frames = [
            bytes(rng.randrange(256) for _ in range(w * h * 3))
            for _ in range(nf)
        ]
        payload = synthesize_avi(frames, w, h, fps=24)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
        d = avi_decode(payload)
        assert (d["width"], d["height"], d["fps"], d["n_frames"]) == (
            w, h, 24, nf,
        )
        for got, exp in zip(d["frames"], frames):
            assert bytes(got) == exp


def test_avi_decode_rejects_garbage():
    import pytest as _pytest

    from minerva_etl_spark.operators.multimodal import avi_decode

    with _pytest.raises(ValueError):
        avi_decode(b"RIFF....WAVE not a video")


def test_avi_frame_sampling_emits_valid_pngs(spark):
    """avi_sample_frames decodes the container per task and re-encodes
    sampled frames as standalone PNGs — the video → image hand-off."""
    from minerva_etl_spark.operators.multimodal import (
        avi_sample_frames,
        png_decode,
        synthesize_avi,
    )

    w, h = 4, 3
    frames = [
        bytes((f * 50 + i) % 256 for i in range(w * h * 3))
        for f in range(5)
    ]
    media = spark.createDataFrame(
        [(1, synthesize_avi(frames, w, h, fps=10))],
        "media_id bigint, payload binary",
    )
    out = avi_sample_frames(media, every_n=2, max_frames=2).collect()
    assert [(r.media_id, r.frame_idx) for r in out] == [(1, 0), (1, 2)]
    for r in out:
        d = png_decode(bytes(r.frame_png))
        assert (d["width"], d["height"]) == (w, h)
        assert bytes(d["pixels"]) == frames[r.frame_idx]


def test_media_features_on_error_policy(spark):
    """A corrupt payload in a batch: on_error='fail' (default) raises a
    MediaDecodeError naming the media id; on_error='skip' drops the row
    and decodes the rest — a rotten payload in a 100 TB corpus must be
    either loud-and-identifiable or droppable, never a silent wrong
    answer."""
    import pytest as _pytest

    from minerva_etl_spark.operators.multimodal import (
        png_features,
        synthesize_png,
        wav_features,
        synthesize_wav,
    )

    good = synthesize_png(bytes(range(12)), 2, 2, 3)
    media = spark.createDataFrame(
        [(1, good), (2, b"not a png at all")],
        "media_id bigint, payload binary",
    )
    # pyspark surfaces the worker's MediaDecodeError as PythonException
    with _pytest.raises(Exception, match="media_id=2"):
        png_features(media).collect()

    out = png_features(media, on_error="skip").collect()
    assert [r.media_id for r in out] == [1]

    wavs = spark.createDataFrame(
        [(7, synthesize_wav([5, -5], 8000)), (8, b"RIFFjunk")],
        "media_id bigint, payload binary",
    )
    ok = wav_features(wavs, on_error="skip").collect()
    assert [r.media_id for r in ok] == [7]


def test_ulaw_expand_standard_table():
    """The G.711 expansion hits the standard anchor values and the
    pure-integer formula the oracle replays (all 256 codes)."""
    from minerva_etl_spark.operators.multimodal import ulaw_expand

    assert ulaw_expand(0xFF) == 0 and ulaw_expand(0x7F) == 0
    assert ulaw_expand(0x00) == -32124 and ulaw_expand(0x80) == 32124
    for b in range(256):
        u = 255 - b
        t = (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
        assert ulaw_expand(b) == (-t if u >= 128 else t)


def test_wav_mulaw_decode():
    """A format-7 RIFF (stdlib wave REJECTS it) decodes through the
    manual chunk walk to the exact recomputable stats."""
    import math
    import io
    import wave as wave_mod

    import pytest as _pytest

    from minerva_etl_spark.operators.multimodal import (
        synthesize_wav_mulaw,
        ulaw_expand,
        wav_decode,
    )

    raw = bytes((9 * 13 + i * 7) % 256 for i in range(50))
    payload = synthesize_wav_mulaw(raw, 8000)
    with _pytest.raises(wave_mod.Error):
        wave_mod.open(io.BytesIO(payload), "rb")  # proves the fallback is needed
    d = wav_decode(payload)
    vals = [ulaw_expand(b) for b in raw]
    want = math.floor(
        (sum(v * v for v in vals) / len(vals)) ** 0.5 * 1e6 + 0.5
    ) / 1e6
    assert d["sample_rate"] == 8000 and d["n_frames"] == 50
    assert d["n_channels"] == 1 and d["rms"] == want


def test_wav_8bit_pcm_decode():
    """8-bit unsigned PCM decodes centered at 128 (RMS on the 8-bit
    scale), instead of the old NotImplementedError."""
    import io
    import math
    import wave as wave_mod

    from minerva_etl_spark.operators.multimodal import wav_decode

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128, 130, 126, 255, 0]))
    d = wav_decode(buf.getvalue())
    vals = [0, 2, -2, 127, -128]
    want = math.floor(
        (sum(v * v for v in vals) / 5) ** 0.5 * 1e6 + 0.5
    ) / 1e6
    assert d["n_frames"] == 5 and d["rms"] == want


def test_alaw_expand_standard_table():
    """The G.711 A-law expansion hits the standard anchors (±32256,
    ±8) and the pure-integer formula the oracle replays (all 256
    codes; sign bit SET means positive — opposite of μ-law)."""
    from minerva_etl_spark.operators.multimodal import alaw_expand

    assert alaw_expand(0xAA) == 32256 and alaw_expand(0x2A) == -32256
    assert alaw_expand(0xD5) == 8 and alaw_expand(0x55) == -8
    for b in range(256):
        a = b ^ 0x55
        seg = (a // 16) % 8
        t = (a % 16) * 16
        t = t + 8 if seg == 0 else (t + 264) << (seg - 1)
        assert alaw_expand(b) == (t if a >= 128 else -t)


def test_wav_alaw_decode():
    """A format-6 RIFF decodes through the manual chunk walk with the
    A-law expansion."""
    import math

    from minerva_etl_spark.operators.multimodal import (
        alaw_expand,
        synthesize_wav_alaw,
        wav_decode,
    )

    raw = bytes((5 * 13 + i * 11) % 256 for i in range(48))
    d = wav_decode(synthesize_wav_alaw(raw, 8000))
    vals = [alaw_expand(b) for b in raw]
    want = math.floor(
        (sum(v * v for v in vals) / len(vals)) ** 0.5 * 1e6 + 0.5
    ) / 1e6
    assert d["sample_rate"] == 8000 and d["n_frames"] == 48
    assert d["rms"] == want


def test_wav_adpcm_rejected():
    """Compressed formats (e.g. 2 = MS ADPCM) stay an honest
    NotImplementedError naming the format code."""
    import struct

    import pytest as _pytest

    from minerva_etl_spark.operators.multimodal import wav_decode

    body = bytes([1, 2, 3, 4])
    payload = (
        b"RIFF" + struct.pack("<I", 38 + len(body)) + b"WAVEfmt "
        + struct.pack("<IHHIIHHH", 18, 2, 1, 8000, 8000, 1, 8, 0)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    with _pytest.raises(NotImplementedError, match="2"):
        wav_decode(payload)


def test_wav_spectral_two_tone():
    """A two-tone integer-cycle fixture lands exactly in its bins."""
    import math

    from minerva_etl_spark.operators.multimodal import (
        synthesize_wav,
        wav_spectral_decode,
    )

    n, k1, k2 = 96, 7, 13
    samples = [
        math.floor(10000 * math.sin(2 * math.pi * k1 * i / n)
                   + 3000 * math.sin(2 * math.pi * k2 * i / n) + 0.5)
        for i in range(n)
    ]
    d = wav_spectral_decode(synthesize_wav(samples, 8000))
    assert d["dominant_bin"] == k1 and d["second_bin"] == k2
    assert d["dominant_freq"] == k1 * 8000 / n
    assert d["n_samples"] == n


def test_wav_spectral_g711_and_short_reject():
    """Spectral features run on G.711 payloads too (shared sample
    front end); too-short payloads fail loudly."""
    import math

    import pytest as _pytest

    from minerva_etl_spark.operators.multimodal import (
        synthesize_wav_mulaw,
        wav_samples,
        wav_spectral_decode,
    )

    # mu-law byte 0xFF decodes to 0 -> silence has an FFT but a sine
    # through the compander still peaks at its bin: encode a coarse
    # square-ish wave at bin 4 (sign flips every n/8 samples)
    n, k = 64, 4
    raw = bytes(0x00 if math.sin(2 * math.pi * k * i / n) < 0 else 0x80
                for i in range(n))
    payload = synthesize_wav_mulaw(raw, 8000)
    vals, rate, ch = wav_samples(payload)
    assert set(vals) <= {32124, -32124}
    d = wav_spectral_decode(payload)
    assert d["dominant_bin"] == k  # square wave fundamental
    with _pytest.raises(ValueError, match="too short"):
        wav_spectral_decode(synthesize_wav_mulaw(b"\x00\x01", 8000))


def test_wav_spectral_spark_multichannel(spark):
    """Stereo folds to mono before the transform."""
    import math
    import struct

    from minerva_etl_spark.operators.multimodal import wav_spectral

    n, k = 64, 5
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        frames = b"".join(
            struct.pack(
                "<hh",
                math.floor(9000 * math.sin(2 * math.pi * k * i / n) + 0.5),
                math.floor(9000 * math.sin(2 * math.pi * k * i / n) + 0.5),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id bigint, payload binary"
    )
    row = wav_spectral(df).collect()[0]
    assert row.n_samples == n  # frames, not interleaved samples
    assert row.dominant_bin == k


def test_write_one_row_parquet_parameterized_types(spark, tmp_path):
    """r14 ADVICE (low): the naive ddl.split(',') mis-parsed
    parameterized types (decimal(10,2) split mid-type); the DDL now
    goes through a real StructType parse."""
    from decimal import Decimal

    from minerva_etl_spark.fsutil import write_one_row_parquet

    p = str(tmp_path / "meta")
    write_one_row_parquet(
        spark,
        p,
        "amount decimal(10,2), tag string, n bigint",
        [Decimal("12.34"), "x", 7],
    )
    row = spark.read.parquet(p).collect()[0]
    assert row.amount == Decimal("12.34")
    assert row.tag == "x" and row.n == 7
    with pytest.raises(ValueError, match="DDL fields"):
        write_one_row_parquet(spark, p, "a int, b int", [1])
