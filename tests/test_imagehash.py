"""Perceptual image dedup: dHash bands over real decoded pixels and
the pigeonhole hamming pair join."""

from __future__ import annotations

import pytest

from minerva_etl_spark.operators.imagehash import (
    dhash_bands,
    dhash_pairs,
    image_dhash,
)
from minerva_etl_spark.operators.multimodal import synthesize_png


def _gradient_pixels(w: int, h: int, descending: bool = False) -> bytes:
    """RGB rows whose grayscale strictly changes left-to-right."""
    px = bytearray()
    for _y in range(h):
        for x in range(w):
            v = (w - 1 - x if descending else x) * 255 // (w - 1)
            px += bytes((v, v, v))
    return bytes(px)


def test_dhash_bands_gradients():
    """Ascending rows compare False everywhere (0 bands); descending
    rows set every bit (0xFFFF per 16-bit band)."""
    asc = dhash_bands(9, 8, 3, _gradient_pixels(9, 8))
    desc = dhash_bands(9, 8, 3, _gradient_pixels(9, 8, descending=True))
    assert asc == [0, 0, 0, 0]
    assert desc == [0xFFFF] * 4


def test_dhash_resize_invariance():
    """A 2x nearest-neighbor upscale decodes to the same dHash —
    the property that makes it a re-encode/resize dedup key."""
    small = dhash_bands(9, 8, 3, _gradient_pixels(9, 8))
    big = dhash_bands(18, 16, 3, _gradient_pixels(18, 16))
    assert small == big


def test_image_dhash_and_pairs(spark):
    """Real PNG decode feeds the hash; a brightness-shifted twin
    (uniform +3, no clamping) has hamming 0 and pairs at radius 3;
    the gradient outlier does not pair."""
    base = _gradient_pixels(9, 8)
    textured = bytes(
        (17 * i + (i % 7) * 11) % 200 for i in range(9 * 8 * 3)
    )  # < 200: +3 never clamps
    shifted = bytes(v + 3 for v in textured)
    rows = [
        (1, synthesize_png(textured, 9, 8, 3)),
        (2, synthesize_png(shifted, 9, 8, 3, filters=[1, 2, 3, 4])),
        (3, synthesize_png(base, 9, 8, 3)),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    hashes = image_dhash(df)
    got = {r.media_id: (r.d0, r.d1, r.d2, r.d3) for r in hashes.collect()}
    assert got[1] == got[2]  # +3 on every channel: every gray shifts +3
    assert got[1] != got[3]
    pairs = dhash_pairs(hashes, radius=3).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_image_dhash_skip_policy(spark):
    """on_error='skip' drops undecodable payloads; 'fail' raises."""
    rows = [
        (1, synthesize_png(_gradient_pixels(9, 8), 9, 8, 3)),
        (2, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    ok = image_dhash(df, on_error="skip").collect()
    assert [r.media_id for r in ok] == [1]
    with pytest.raises(Exception):
        image_dhash(df, on_error="fail").collect()


def test_video_frame_hashes_and_pairs(spark):
    """Clips pair when ANY sampled frame matches: clip 2 shares only
    its middle frame with clip 1; clip 3 shares none.  Frame stride
    and max_frames bound the sampled set."""
    from minerva_etl_spark.operators.imagehash import (
        video_dedup_pairs,
        video_frame_hashes,
    )
    from minerva_etl_spark.operators.multimodal import synthesize_avi

    def frame(seed: int) -> bytes:
        return bytes(
            (seed * 29 + 17 * i + (i % 7) * 11) % 200
            for i in range(9 * 8 * 3)
        )

    clips = [
        (1, synthesize_avi([frame(1), frame(2), frame(3)], 9, 8)),
        (2, synthesize_avi([frame(4), frame(2), frame(5)], 9, 8)),
        (3, synthesize_avi([frame(6), frame(7)], 9, 8)),
    ]
    df = spark.createDataFrame(clips, "media_id bigint, payload binary")
    hashes = video_frame_hashes(df)
    assert hashes.count() == 8  # 3 + 3 + 2 sampled frames
    pairs = video_dedup_pairs(hashes, radius=0).collect()
    assert [(p.id_a, p.id_b, p.min_hamming, p.n_frame_matches)
            for p in pairs] == [(1, 2, 0, 1)]

    sampled = video_frame_hashes(df, every_n=2, max_frames=1)
    assert {(r.media_id, r.frame_idx) for r in sampled.collect()} == {
        (1, 0), (2, 0), (3, 0)
    }


def test_ingest_image_increment(spark, tmp_path):
    """Two image deliveries through a persisted hash state: history
    never rehashes; a twin of a history image dups to it, a
    delta-vs-delta twin dups to the LOWER delta id; incremental
    decisions equal a full recompute restricted to the delta."""
    from minerva_etl_spark.operators.imagehash import (
        dhash_pairs,
        image_dhash,
        ingest_image_increment,
    )
    from minerva_etl_spark.operators.multimodal import synthesize_png

    def img(seed: int, dc: int = 0) -> bytes:
        # seed-dependent STRIDE, not just offset: a pure additive
        # shift is invisible to dHash, so shifted fixtures would all
        # collide (hamming 1-2 / 1-9 / 2-9 here: 26 / 31 / 37)
        return synthesize_png(
            bytes((seed * 29 + i * (13 + seed * 2) + (i % 7) * 11)
                  % 200 + dc
                  for i in range(9 * 8 * 3)),
            9, 8, 3,
        )

    state = str(tmp_path / "img_state")
    poll1 = spark.createDataFrame(
        [(1, img(1)), (2, img(2))], "media_id bigint, payload binary"
    )
    d1 = {r.media_id: r for r in
          ingest_image_increment(spark, poll1, state).collect()}
    assert all(r.keep and r.near_dup_of is None for r in d1.values())

    poll2 = spark.createDataFrame(
        [(10, img(1, dc=3)),   # twin of history image 1
         (11, img(9)),         # genuinely new
         (12, img(9, dc=3))],  # twin of DELTA image 11
        "media_id bigint, payload binary",
    )
    d2 = {r.media_id: r for r in
          ingest_image_increment(spark, poll2, state).collect()}
    assert d2[10].near_dup_of == 1 and not d2[10].keep
    assert d2[11].keep and d2[11].near_dup_of is None
    assert d2[12].near_dup_of == 11 and not d2[12].keep

    # incremental == recompute: the full pair set restricted to delta
    both = poll1.unionByName(poll2)
    pairs = dhash_pairs(image_dhash(both), radius=3)
    full = {
        r.id_b: r.id_a
        for r in pairs.collect()
        if r.id_b >= 10  # delta rows (ids chosen above history range)
    }
    got = {m: r.near_dup_of for m, r in d2.items()
           if r.near_dup_of is not None}
    assert got == full

    # state retains every hash, kept and dropped alike
    assert spark.read.parquet(state).count() == 5


def test_ingest_video_increment(spark, tmp_path):
    """Two clip deliveries through the per-frame hash state: a delta
    clip sharing ONE frame with a history clip dups to it; a clip of
    all-new footage keeps; the state holds every sampled frame."""
    from minerva_etl_spark.operators.imagehash import (
        ingest_video_increment,
    )
    from minerva_etl_spark.operators.multimodal import synthesize_avi

    def frame(seed: int) -> bytes:
        return bytes((seed * 29 + i * (13 + seed * 2) + (i % 7) * 11)
                     % 200 for i in range(9 * 8 * 3))

    state = str(tmp_path / "vid_state")
    p1 = spark.createDataFrame(
        [(1, synthesize_avi([frame(1), frame(2)], 9, 8))],
        "media_id bigint, payload binary",
    )
    d1 = ingest_video_increment(spark, p1, state).collect()
    assert d1[0].keep

    p2 = spark.createDataFrame(
        [(2, synthesize_avi([frame(7), frame(2)], 9, 8)),  # shares f2
         (3, synthesize_avi([frame(8), frame(9)], 9, 8))],
        "media_id bigint, payload binary",
    )
    d2 = {r.media_id: r for r in
          ingest_video_increment(spark, p2, state).collect()}
    assert d2[2].near_dup_of == 1 and not d2[2].keep
    assert d2[3].keep
    assert spark.read.parquet(state).count() == 6  # 2 + 2 + 2 frames


def test_bucketed_hash_state_matches_and_exchange_free(tmp_path, spark):
    """The catalog-backed hash state: decisions equal the parquet-path
    variant on the same two deliveries, and the history side of the
    band join is a bucketed scan with NO exchange."""
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.imagehash import (
        _melt_bands,
        image_dhash,
        ingest_hash_increment,
        ingest_hash_increment_bucketed,
    )
    from minerva_etl_spark.operators.multimodal import synthesize_png

    def img(seed, dc=0):
        return synthesize_png(
            bytes((seed * 29 + i * (13 + seed * 2) + (i % 7) * 11)
                  % 200 + dc for i in range(9 * 8 * 3)),
            9, 8, 3,
        )

    p1 = spark.createDataFrame(
        [(i, img(i)) for i in range(1, 6)],
        "media_id bigint, payload binary",
    )
    p2 = spark.createDataFrame(
        [(10, img(2, dc=3)), (11, img(30)), (12, img(30, dc=3))],
        "media_id bigint, payload binary",
    )
    h1, h2 = image_dhash(p1), image_dhash(p2)

    tbl = "media_hash_bkt_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    ingest_hash_increment_bucketed(spark, h1, tbl)
    got_b = {r.media_id: (r.near_dup_of, r.keep) for r in
             ingest_hash_increment_bucketed(spark, h2, tbl).collect()}

    plain_state = str(tmp_path / "plain_state")
    ingest_hash_increment(spark, h1, plain_state)
    got_p = {r.media_id: (r.near_dup_of, r.keep) for r in
             ingest_hash_increment(spark, h2, plain_state).collect()}
    assert got_b == got_p
    assert got_b[10] == (2, False) and got_b[12] == (11, False)
    assert got_b[11] == (None, True)
    assert spark.table(tbl).count() == 8 * 4  # 4 band rows per hash

    # differential plan: the same band join against the same rows as
    # plain parquet needs one MORE exchange than the bucketed scan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = _melt_bands(h2.localCheckpoint(eager=True)).select(
            F.col("media_id").alias("id_a"), "band"
        )

        def join_plan(history):
            return (
                probe.hint("merge")
                .join(history.select("band", "media_id"), "band")
                ._jdf.queryExecution().executedPlan().toString()
            )

        bucketed = join_plan(spark.table(tbl))
        assert "Bucketed: true" in bucketed
        plain_dir = str(tmp_path / "plain_melt")
        spark.table(tbl).write.parquet(plain_dir)
        plain = join_plan(spark.read.parquet(plain_dir))
        assert plain.count("Exchange") == bucketed.count("Exchange") + 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_dhash_pairs_max_bucket_guard(spark):
    """A mega-cluster of identical hashes is excluded from the
    candidate join by max_bucket, while a normal twin pair still
    pairs — the pathological-bucket mitigation as code."""
    from minerva_etl_spark.operators.imagehash import dhash_pairs

    rows = (
        # 20 identical hashes: every band bucket holds 20 members
        [(i, 7, 8, 9, 10) for i in range(100, 120)]
        # one genuine twin pair in small buckets
        + [(1, 111, 222, 333, 444), (2, 111, 222, 333, 445)]
    )
    hashes = spark.createDataFrame(
        rows, "media_id bigint, d0 int, d1 int, d2 int, d3 int"
    )
    full = dhash_pairs(hashes, radius=3).count()
    assert full == 190 + 1  # C(20,2) mega-cluster pairs + the twin
    capped = dhash_pairs(hashes, radius=3, max_bucket=10).collect()
    assert [(p.id_a, p.id_b) for p in capped] == [(1, 2)]


def test_dhash_pairs_radius_contract():
    """The 4-band layout cannot promise recall past hamming 3."""
    with pytest.raises(AssertionError):
        dhash_pairs(None, radius=4)
