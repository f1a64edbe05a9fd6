"""Perceptual image dedup — dHash over REAL decoded pixels.

Near-duplicate images (re-encodes, brightness tweaks, metadata churn)
survive byte-level dedup; a difference hash collapses them: grayscale
the image, nearest-resize to a 9x8 grid, and emit one bit per
horizontally adjacent pixel pair (``gray[y][x] > gray[y][x+1]``) — 64
bits that are stable under re-encoding and mild photometric edits.

Engine-portable layout: the 64 bits are stored as FOUR 16-bit band
integers (``d0..d3``, bit ``i = y*8 + x`` lands in band ``i // 16`` at
position ``i % 16``).  That sidesteps 64-bit sign pitfalls across
engines AND is exactly the shape the pigeonhole band join needs — the
same recall contract as `operators/dedup.py::simhash_banded_pairs`:
with 4 bands, every pair within hamming radius 3 shares at least one
band, so the equi-join has PERFECT recall at radius <= 3 and the
exact ``bit_count`` verifier drops coincidental collisions.

Scale shape: decode is Arrow-batched ``mapInPandas`` (embarrassingly
parallel, zero shuffle); the candidate join is an equi-join on
(band index, band value) — never all-pairs.  Grayscale uses exact
integer arithmetic (``(299R + 587G + 114B) // 1000``) and the resize
is nearest-neighbor (``src = dst * size // 9``), so an oracle can
recompute every bit from a closed-form pixel formula.

Reference: extension (the reference engine treats media as opaque
blobs); SURVEY §2 "beyond the reference" charter.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

DHASH_W, DHASH_H = 9, 8  # grid: 8 comparisons per row x 8 rows = 64 bits
_BANDS, _BAND_BITS = 4, 16

DHASH_SCHEMA = (
    "media_id bigint, width int, height int, "
    "d0 int, d1 int, d2 int, d3 int"
)


def dhash_bands(width: int, height: int, channels: int, pixels) -> list[int]:
    """The 4x16-bit dHash bands of a decoded image (row-major
    interleaved samples) — pure integer arithmetic, no float anywhere,
    so any two engines agree bit-for-bit."""
    if width < 1 or height < 1:
        raise ValueError("empty image")

    def gray_at(sx: int, sy: int) -> int:
        base = (sy * width + sx) * channels
        if channels >= 3:
            r, g, b = pixels[base], pixels[base + 1], pixels[base + 2]
            return (299 * r + 587 * g + 114 * b) // 1000
        return pixels[base]  # gray / gray+alpha: first sample

    grid = [
        [
            gray_at(x * width // DHASH_W, y * height // DHASH_H)
            for x in range(DHASH_W)
        ]
        for y in range(DHASH_H)
    ]
    bands = [0] * _BANDS
    for y in range(DHASH_H):
        for x in range(DHASH_W - 1):
            if grid[y][x] > grid[y][x + 1]:
                i = y * (DHASH_W - 1) + x
                bands[i // _BAND_BITS] |= 1 << (i % _BAND_BITS)
    return bands


def image_dhash(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "fail",
) -> DataFrame:
    """Per-row REAL decode (magic-byte sniff -> PNG/JPEG/GIF codec)
    then dHash, Arrow-batched.  ``on_error='skip'`` drops undecodable
    payloads (the dirty-corpus contract of the media operators)."""
    from minerva_etl_spark.operators.multimodal import (
        _decode_or_policy,
        image_decode,
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                d = _decode_or_policy(
                    image_decode, int(mid), bytes(payload), on_error
                )
                if d is None:
                    continue
                bands = dhash_bands(
                    d["width"], d["height"], d["channels"], d["pixels"]
                )
                rows.append(
                    (int(mid), d["width"], d["height"], *bands)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "d0", "d1", "d2", "d3"
                ],
            )

    cols = media.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    )
    return cols.mapInPandas(run, schema=DHASH_SCHEMA)


VIDEO_HASH_SCHEMA = (
    "media_id bigint, frame_idx int, width int, height int, "
    "d0 int, d1 int, d2 int, d3 int"
)


def video_frame_hashes(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 1,
    max_frames: int = 8,
    on_error: str = "fail",
) -> DataFrame:
    """Frame-sampled video hashing: REAL container decode
    (`multimodal.avi_decode` — BI_RGB and MJPG streams), keep every
    ``every_n``-th frame up to ``max_frames``, and dHash each kept
    frame.  One row per (clip, sampled frame) — the input to
    :func:`video_dedup_pairs`.  Decode is Arrow-batched and
    shuffle-free; frame sampling bounds the per-clip cost."""
    from minerva_etl_spark.operators.multimodal import (
        _decode_or_policy,
        avi_decode,
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                d = _decode_or_policy(
                    avi_decode, int(mid), bytes(payload), on_error
                )
                if d is None:
                    continue
                kept = d["frames"][::every_n][:max_frames]
                for i, f in enumerate(kept):
                    bands = dhash_bands(d["width"], d["height"], 3, f)
                    rows.append(
                        (int(mid), i * every_n, d["width"], d["height"],
                         *bands)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "d0", "d1", "d2", "d3",
                ],
            )

    cols = media.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    )
    return cols.mapInPandas(run, schema=VIDEO_HASH_SCHEMA)


def video_dedup_pairs(
    frame_hashes: DataFrame, radius: int = 3
) -> DataFrame:
    """Near-dup CLIP pairs: two clips pair when ANY sampled frame of
    one is within hamming ``radius`` of any sampled frame of the
    other — the shared-footage rule (re-encodes, trims, and overlays
    keep most frames perceptually intact).  Same pigeonhole recall
    contract as :func:`dhash_pairs`, then a per-clip-pair aggregate:
    ``(id_a, id_b, min_hamming, n_frame_matches)``."""
    assert radius <= _BANDS - 1, (
        f"4-band dHash guarantees recall only to hamming {_BANDS - 1}"
    )
    h = frame_hashes.localCheckpoint(eager=True)
    melted = h.select(
        "media_id", "frame_idx", "d0", "d1", "d2", "d3",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(c), F.col(f"d{c}").cast("string"))
                for c in range(_BANDS)
            ])
        ).alias("band"),
    )
    left = melted.select(
        F.col("media_id").alias("id_a"),
        F.col("frame_idx").alias("fa"),
        *[F.col(f"d{c}").alias(f"a{c}") for c in range(_BANDS)],
        "band",
    )
    right = melted.select(
        F.col("media_id").alias("id_b"),
        F.col("frame_idx").alias("fb"),
        *[F.col(f"d{c}").alias(f"b{c}") for c in range(_BANDS)],
        "band",
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{c} ^ b{c}")) for c in range(_BANDS)
    )
    frame_pairs = (
        left.join(right, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("band")
        .distinct()
        .select(
            "id_a", "id_b", "fa", "fb",
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= radius)
    )
    return frame_pairs.groupBy("id_a", "id_b").agg(
        F.min("hamming").cast("int").alias("min_hamming"),
        F.count(F.lit(1)).alias("n_frame_matches"),
    )


def dhash_pairs(
    hashes: DataFrame, radius: int = 3, max_bucket: int | None = None
) -> DataFrame:
    """Near-dup image pairs within hamming ``radius`` — pigeonhole
    band equi-join (PERFECT recall for radius <= 3 with the 4-band
    layout, the `simhash_banded_pairs` contract) + exact
    ``bit_count`` verification.  Input is :func:`image_dhash` output;
    result is ``(id_a, id_b, hamming)`` with ``id_a < id_b``.

    ``max_bucket`` is the pathological-bucket guard for degenerate
    corpora (millions of solid-color banners hash identically, making
    one band bucket quadratic): band values shared by more than
    ``max_bucket`` hashes are dropped from the CANDIDATE stage.  A
    pair loses recall only if ALL FOUR of its bands are over-popular
    — i.e. both members sit in a mega-cluster, which exact dedup on
    the full 64-bit hash (a groupBy, not a join) identifies first.
    Default ``None`` keeps perfect recall."""
    assert radius <= _BANDS - 1, (
        f"4-band dHash guarantees recall only to hamming {_BANDS - 1}"
    )
    h = hashes.localCheckpoint(eager=True)  # tiny; reused on both sides
    melted = h.select(
        "media_id", "d0", "d1", "d2", "d3",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(c), F.col(f"d{c}").cast("string"))
                for c in range(_BANDS)
            ])
        ).alias("band"),
    )
    if max_bucket is not None:
        # one map-side-combinable count; the over-popular band list is
        # tiny by construction and broadcast into the anti join
        hot = (
            melted.groupBy("band")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > int(max_bucket))
            .select("band")
        )
        melted = melted.join(F.broadcast(hot), "band", "left_anti")
    left = melted.select(
        F.col("media_id").alias("id_a"),
        *[F.col(f"d{c}").alias(f"a{c}") for c in range(_BANDS)],
        "band",
    )
    right = melted.select(
        F.col("media_id").alias("id_b"),
        *[F.col(f"d{c}").alias(f"b{c}") for c in range(_BANDS)],
        "band",
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{c} ^ b{c}")) for c in range(_BANDS)
    )
    return (
        left.join(right, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("band")
        .distinct()
        .select(
            "id_a", "id_b", hamming.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= radius)
    )


# ------------------------------------------------------- incremental state
def image_hash_increment(
    delta_hashes: DataFrame,
    history_hashes: DataFrame,
    radius: int = 3,
) -> DataFrame:
    """Near-dup decisions for a DELTA of image hashes against all
    history WITHOUT rehashing (or re-pairing) history — the media twin
    of `operators/incremental.py::embedding_increment`, and the same
    recompute-equivalence rule: per delta image, ``near_dup_of`` is
    the LOWEST id among band-mates (history or lower-id delta) within
    hamming ``radius``; ``keep`` = no such neighbor.  First seen
    wins; decisions equal a full recompute over history ∪ delta
    restricted to the delta rows.

    Plan: both sides are (id, d0..d3) hash states — ~20 bytes per
    image, never pixels; candidates come from the pigeonhole band
    equi-join (perfect recall at radius <= 3); one
    map-side-combinable min per delta image."""
    assert radius <= _BANDS - 1, (
        f"4-band dHash guarantees recall only to hamming {_BANDS - 1}"
    )
    cols = ["media_id", "d0", "d1", "d2", "d3"]

    def melt(df: DataFrame, idn: str) -> DataFrame:
        return df.select(*cols).select(
            F.col("media_id").alias(idn),
            *[F.col(f"d{c}").alias(f"{idn[-1]}{c}") for c in range(_BANDS)],
            F.explode(
                F.array(*[
                    F.concat_ws(
                        ":", F.lit(c), F.col(f"d{c}").cast("string")
                    )
                    for c in range(_BANDS)
                ])
            ).alias("band"),
        )

    pool = history_hashes.select(*cols).unionByName(
        delta_hashes.select(*cols)
    )
    d = melt(delta_hashes, "id_a")
    h = melt(pool, "id_b")
    hamming = sum(
        F.bit_count(F.expr(f"a{c} ^ b{c}")) for c in range(_BANDS)
    )
    near = (
        d.join(h, "band")
        .filter(F.col("id_b") < F.col("id_a"))
        # no distinct: duplicate band collisions are harmless under
        # min() — the dedup exchange bought nothing (r16, guide §2.4)
        .filter(hamming <= F.lit(int(radius)))
        .groupBy("id_a")
        .agg(F.min("id_b").cast("bigint").alias("near_dup_of"))
        .withColumnRenamed("id_a", "media_id")
    )
    return (
        delta_hashes.select("media_id")
        .join(near, "media_id", "left")
        .select(
            "media_id",
            "near_dup_of",
            F.col("near_dup_of").isNull().alias("keep"),
        )
    )


def ingest_hash_increment(
    spark,
    delta_hashes: DataFrame,
    state_path: str,
    radius: int = 3,
) -> DataFrame:
    """One delivery cycle over ANY 64-bit band-hash frame
    (``media_id, d0..d3`` — image dHash, audio fingerprint, video
    frame hashes): decide the delta against the persisted hash state
    (bootstrap: everything kept), append the delta's hashes.  The
    store lease spans read-state -> decide -> append (the
    `ingest_increment` rule), so concurrent deliveries fully
    serialize.  The state keeps EVERY ingested hash, kept and dropped
    alike — dropping dups from the state would break
    recompute-equivalence for later deliveries that collide only with
    a dropped item."""
    from minerva_etl_spark.fsutil import StoreLease, parquet_exists

    delta = delta_hashes.select(
        "media_id", "d0", "d1", "d2", "d3"
    ).localCheckpoint(eager=True)
    with StoreLease(spark, state_path.rstrip("/") + ".__lease"):
        if parquet_exists(spark, state_path):
            history = spark.read.parquet(state_path)
            decisions = image_hash_increment(delta, history, radius)
        else:
            decisions = delta.select(
                "media_id",
                F.lit(None).cast("bigint").alias("near_dup_of"),
            ).withColumn("keep", F.lit(True))
        decisions = decisions.localCheckpoint(eager=True)
        delta.write.mode("append").parquet(state_path)
    return decisions


def ingest_image_increment(
    spark,
    media: DataFrame,
    state_path: str,
    payload_col: str = "payload",
    id_col: str = "media_id",
    radius: int = 3,
    on_error: str = "fail",
) -> DataFrame:
    """One image-delivery cycle: hash the delta (REAL decode) and run
    :func:`ingest_hash_increment` — history pixels are never
    re-decoded."""
    return ingest_hash_increment(
        spark,
        image_dhash(
            media, payload_col=payload_col, id_col=id_col,
            on_error=on_error,
        ),
        state_path,
        radius,
    )


def video_hash_increment(
    delta_frames: DataFrame,
    history_frames: DataFrame,
    radius: int = 3,
) -> DataFrame:
    """CLIP-level near-dup decisions for a delta of per-frame hashes
    against all history: a delta clip dups to the LOWEST clip id
    (history or lower-id delta) sharing ANY frame within hamming
    ``radius`` — :func:`video_dedup_pairs`'s shared-footage rule on
    the incremental protocol.  Both sides are (media_id, frame_idx,
    d0..d3) frames; history footage is never re-decoded."""
    assert radius <= _BANDS - 1, (
        f"4-band dHash guarantees recall only to hamming {_BANDS - 1}"
    )
    cols = ["media_id", "frame_idx", "d0", "d1", "d2", "d3"]

    def melt(df: DataFrame, idn: str) -> DataFrame:
        return df.select(*cols).select(
            F.col("media_id").alias(idn),
            *[F.col(f"d{c}").alias(f"{idn[-1]}{c}") for c in range(_BANDS)],
            F.explode(
                F.array(*[
                    F.concat_ws(
                        ":", F.lit(c), F.col(f"d{c}").cast("string")
                    )
                    for c in range(_BANDS)
                ])
            ).alias("band"),
        )

    pool = history_frames.select(*cols).unionByName(
        delta_frames.select(*cols)
    )
    d = melt(delta_frames, "id_a")
    h = melt(pool, "id_b")
    hamming = sum(
        F.bit_count(F.expr(f"a{c} ^ b{c}")) for c in range(_BANDS)
    )
    near = (
        d.join(h, "band")
        .filter(F.col("id_b") < F.col("id_a"))
        # no distinct: duplicate collisions are harmless under min()
        .filter(hamming <= F.lit(int(radius)))
        .groupBy("id_a")
        .agg(F.min("id_b").cast("bigint").alias("near_dup_of"))
        .withColumnRenamed("id_a", "media_id")
    )
    return (
        delta_frames.select("media_id").distinct()
        .join(near, "media_id", "left")
        .select(
            "media_id",
            "near_dup_of",
            F.col("near_dup_of").isNull().alias("keep"),
        )
    )


def ingest_video_increment(
    spark,
    media: DataFrame,
    state_path: str,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 1,
    max_frames: int = 8,
    radius: int = 3,
    on_error: str = "fail",
) -> DataFrame:
    """One video-delivery cycle: frame-hash the delta (REAL container
    decode, sampled), decide clips against the persisted per-frame
    state, append the delta's frame hashes — the same lease/retention
    contract as :func:`ingest_hash_increment`, with a per-frame state
    (~20 bytes x sampled frames per ever-ingested clip)."""
    from minerva_etl_spark.fsutil import StoreLease, parquet_exists

    delta = video_frame_hashes(
        media, payload_col=payload_col, id_col=id_col,
        every_n=every_n, max_frames=max_frames, on_error=on_error,
    ).select(
        "media_id", "frame_idx", "d0", "d1", "d2", "d3"
    ).localCheckpoint(eager=True)
    with StoreLease(spark, state_path.rstrip("/") + ".__lease"):
        if parquet_exists(spark, state_path):
            history = spark.read.parquet(state_path)
            decisions = video_hash_increment(delta, history, radius)
        else:
            decisions = delta.select("media_id").distinct().select(
                "media_id",
                F.lit(None).cast("bigint").alias("near_dup_of"),
            ).withColumn("keep", F.lit(True))
        decisions = decisions.localCheckpoint(eager=True)
        delta.write.mode("append").parquet(state_path)
    return decisions


def _melt_bands(df: DataFrame, id_out: str = "media_id") -> DataFrame:
    """(media_id, d0..d3) -> 4 rows (band, media_id, d0..d3) — the
    stored shape of the bucketed hash state."""
    return df.select(
        F.col("media_id").alias(id_out), "d0", "d1", "d2", "d3",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(c), F.col(f"d{c}").cast("string"))
                for c in range(_BANDS)
            ])
        ).alias("band"),
    )


def ingest_hash_increment_bucketed(
    spark,
    delta_hashes: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    path: str | None = None,
    radius: int = 3,
) -> DataFrame:
    """The catalog-backed variant of :func:`ingest_hash_increment`
    for 100 TB-of-history scale (the
    `frontier.ingest_frontier_increment_bucketed` strategy): the
    state lives PRE-MELTED as a table ``bucketBy(n_buckets, band)``,
    so each delivery's candidate join reads history WITHOUT an
    exchange — only the (small) delta shuffles to the bucket layout.
    Delta-vs-delta candidates come from a separate small self-join,
    so the union of sides never breaks the bucket advantage.  Same
    lease discipline, same decisions as the parquet-path variant
    (proven equal by test)."""
    from minerva_etl_spark.fsutil import StoreLease

    assert radius <= _BANDS - 1, (
        f"4-band dHash guarantees recall only to hamming {_BANDS - 1}"
    )
    delta = delta_hashes.select(
        "media_id", "d0", "d1", "d2", "d3"
    ).localCheckpoint(eager=True)
    dm = _melt_bands(delta)
    d_side = dm.select(
        F.col("media_id").alias("id_a"),
        *[F.col(f"d{c}").alias(f"a{c}") for c in range(_BANDS)],
        "band",
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{c} ^ b{c}")) for c in range(_BANDS)
    )

    def near_from(pool: DataFrame) -> DataFrame:
        h_side = pool.select(
            F.col("media_id").alias("id_b"),
            *[F.col(f"d{c}").alias(f"b{c}") for c in range(_BANDS)],
            "band",
        )
        return (
            d_side.join(h_side, "band")
            .filter(F.col("id_b") < F.col("id_a"))
            # no distinct: duplicates are harmless under the caller's
            # min() — and an exchange here would break the bucketed
            # history side's zero-shuffle property
            .filter(hamming <= F.lit(int(radius)))
            .select("id_a", "id_b")
        )

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    lease_scope = (path or f"{warehouse}/{table_name}") + ".__lease"
    with StoreLease(spark, lease_scope):
        cands = near_from(dm)  # delta-vs-delta (small self-join)
        if spark.catalog.tableExists(table_name):
            # history side: bucketed scan satisfies the band join
            # with ZERO exchanges on the big side
            cands = cands.unionByName(near_from(spark.table(table_name)))
        near = (
            cands.groupBy("id_a")
            .agg(F.min("id_b").cast("bigint").alias("near_dup_of"))
            .withColumnRenamed("id_a", "media_id")
        )
        decisions = (
            delta.select("media_id")
            .join(near, "media_id", "left")
            .select(
                "media_id",
                "near_dup_of",
                F.col("near_dup_of").isNull().alias("keep"),
            )
            .localCheckpoint(eager=True)
        )
        writer = (
            dm.select("band", "media_id", "d0", "d1", "d2", "d3")
            .write.mode("append")
            .bucketBy(n_buckets, "band")
            .sortBy("band")
            .format("parquet")
        )
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(table_name)
    return decisions
