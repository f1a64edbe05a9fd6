"""Gate rows: image/audio/video codecs + media dedup arc.

Mechanically split out of gate.py (r14); see gate.py for the registry.
"""
from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from minerva_etl_spark.catalog import directory
from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.operators import asof
from minerva_etl_spark.operators import dedup as D
from minerva_etl_spark.operators import multimodal as M
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.trigger import trigger as trigger_mod
from minerva_etl_spark.operators import kmeans as KM
from minerva_etl_spark.operators import similarity as S
from minerva_etl_spark.operators import skew as SK
from minerva_etl_spark.operators import split as SPL
from minerva_etl_spark.operators import text as X
from minerva_etl_spark.operators.aggregation import (
    TrendAggSpec,
    entity_aggregate,
    time_aggregate,
    time_aggregate_oracle_sql,
    _oracle_agg_sql,
)
from minerva_etl_spark.operators.attribute import compact_history, latest_per_entity
from minerva_etl_spark.operators.upsert import dedup_last_wins, insert_missing, merge_packages
from minerva_etl_spark.sources.tables import load_table

from minerva_etl_spark.gate_common import (
    _media_fixture_staged,
    _prep,
)



def q_image_dedup_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (`operators/imagehash.py`): every doc
    becomes a 9x8 GRAYSCALE PNG whose pixel(x, y) is one md5 byte —
    ``int(md5(f"{doc_id}:{x}:{y}")[:2], 16)`` — so every image is
    full-entropy and the pair output is EXACTLY the planted twins at
    ANY corpus size (the earlier mod-arithmetic formula left
    additive-shift classes whose coincidental pairs grew
    quadratically with n — measured at 7M pairs for a x16 corpus by
    `tools/scale_probe_r10b.py`).  Docs at doc_id % 4 = 0 gain a
    brightness twin (media_id + 100000, every sample ``min(v + 3,
    255)``) — a uniform shift preserves every dHash comparison
    except where the 255 clamp breaks uniformity.  The REAL PNG
    codec decodes the payloads back (gray color type exercises the
    1-channel dHash path), dHash bands are banded-joined (radius 3),
    and the oracle recomputes every bit via DuckDB's own md5 and
    brute-forces all pairs — proving perfect pigeonhole recall AND
    the codec round trip at once."""
    _prep(spark)
    from minerva_etl_spark.operators.imagehash import (
        dhash_pairs,
        image_dhash,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import hashlib

        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_png

        def px(d: int, x: int, y: int) -> int:
            return int(
                hashlib.md5(f"{d}:{x}:{y}".encode()).hexdigest()[:2], 16
            )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                base = [
                    px(d, x, y) for y in range(8) for x in range(9)
                ]
                rows.append((d, synthesize_png(base, 9, 8, 1)))
                if d % 4 == 0:
                    pert = [min(v + 3, 255) for v in base]
                    rows.append(
                        (d + 100000, synthesize_png(pert, 9, 8, 1))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = _media_fixture_staged(
        spark, sf_dir, "dhash_png",
        lambda: docs.mapInPandas(
            synth, schema="media_id bigint, payload binary"
        ),
    )
    hashes = image_dhash(media, on_error="fail")
    return dhash_pairs(hashes, radius=3)


_ORACLE_IMAGE_DHASH = """
WITH imgs AS (
  SELECT doc_id AS media_id, doc_id AS d, 0 AS pert FROM documents
  UNION ALL
  SELECT doc_id + 100000, doc_id, 3 FROM documents WHERE doc_id % 4 = 0
),
g AS (
  SELECT media_id, x.x AS x, y.y AS y,
         least(CAST(('0x' || substr(md5(
             CAST(d AS VARCHAR) || ':' || CAST(x.x AS VARCHAR)
             || ':' || CAST(y.y AS VARCHAR)), 1, 2)) AS INTEGER)
               + pert, 255) AS gray
  FROM imgs,
       UNNEST(generate_series(0, 8)) AS x(x),
       UNNEST(generate_series(0, 7)) AS y(y)
),
bits AS (
  SELECT a.media_id, (a.y * 8 + a.x) AS i,
         CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON a.media_id = b.media_id AND a.y = b.y
                    AND b.x = a.x + 1
  WHERE a.x < 8
),
bands AS (
  SELECT media_id, i // 16 AS band,
         CAST(sum(bit * (1 << (i % 16))) AS INTEGER) AS v
  FROM bits GROUP BY media_id, i // 16
),
hashes AS (
  SELECT media_id,
         max(CASE WHEN band = 0 THEN v END) AS d0,
         max(CASE WHEN band = 1 THEN v END) AS d1,
         max(CASE WHEN band = 2 THEN v END) AS d2,
         max(CASE WHEN band = 3 THEN v END) AS d3
  FROM bands GROUP BY media_id
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
          + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3))
         AS INTEGER) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
    + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3)) <= 3
"""


def q_video_dedup_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual video dedup
    (`operators/imagehash.py::video_frame_hashes`/`video_dedup_pairs`):
    every doc becomes a 3-frame 9x8 BI_RGB AVI with full-entropy
    frames — all three channels of pixel(f, x, y) equal the md5 byte
    ``int(md5(f"{doc_id}:{f}:{x}:{y}")[:2], 16)`` (equal channels
    make the integer grayscale exactly that byte), so the pair
    output is EXACTLY the planted twins at any corpus size (two
    earlier arithmetic formulas left additive-shift classes — 20k
    collision pairs at sf0.1 with one varying coefficient; see the
    image row's rationale).  Docs at doc_id % 4 = 0 gain a
    +3-brightness twin clip (media_id + 100000).  The REAL AVI
    container decode feeds per-frame dHash; clips pair when ANY
    frame pair lands within hamming 3; the oracle recomputes every
    frame bit via DuckDB's own md5 and brute-forces all frame
    pairs."""
    _prep(spark)
    from minerva_etl_spark.operators.imagehash import (
        video_dedup_pairs,
        video_frame_hashes,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import hashlib

        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_avi

        def gray(d: int, f: int, x: int, y: int) -> int:
            return int(hashlib.md5(
                f"{d}:{f}:{x}:{y}".encode()
            ).hexdigest()[:2], 16)

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)

                def clip(pert: int) -> bytes:
                    frames = []
                    for f in range(3):
                        frames.append(bytes(
                            v
                            for y in range(8)
                            for x in range(9)
                            for v in (
                                min(gray(d, f, x, y) + pert, 255),
                            ) * 3
                        ))
                    return synthesize_avi(frames, 9, 8)

                rows.append((d, clip(0)))
                if d % 4 == 0:
                    rows.append((d + 100000, clip(3)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = _media_fixture_staged(
        spark, sf_dir, "videodh",
        lambda: docs.mapInPandas(
            synth, schema="media_id bigint, payload binary"
        ),
    )
    hashes = video_frame_hashes(media, on_error="fail")
    return video_dedup_pairs(hashes, radius=3)


_ORACLE_VIDEO_DHASH = """
WITH clips AS (
  SELECT doc_id AS media_id, doc_id AS d, 0 AS pert FROM documents
  UNION ALL
  SELECT doc_id + 100000, doc_id, 3 FROM documents WHERE doc_id % 4 = 0
),
g AS (
  SELECT media_id, fr.f AS f, x.x AS x, y.y AS y,
         least(CAST(('0x' || substr(md5(
             CAST(d AS VARCHAR) || ':' || CAST(fr.f AS VARCHAR)
             || ':' || CAST(x.x AS VARCHAR)
             || ':' || CAST(y.y AS VARCHAR)), 1, 2)) AS INTEGER)
               + pert, 255) AS gray
  FROM clips,
       UNNEST(generate_series(0, 2)) AS fr(f),
       UNNEST(generate_series(0, 8)) AS x(x),
       UNNEST(generate_series(0, 7)) AS y(y)
),
bits AS (
  SELECT a.media_id, a.f, (a.y * 8 + a.x) AS i,
         CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON a.media_id = b.media_id AND a.f = b.f
                    AND a.y = b.y AND b.x = a.x + 1
  WHERE a.x < 8
),
bands AS (
  SELECT media_id, f, i // 16 AS band,
         CAST(sum(bit * (1 << (i % 16))) AS INTEGER) AS v
  FROM bits GROUP BY media_id, f, i // 16
),
hashes AS (
  SELECT media_id, f,
         max(CASE WHEN band = 0 THEN v END) AS d0,
         max(CASE WHEN band = 1 THEN v END) AS d1,
         max(CASE WHEN band = 2 THEN v END) AS d2,
         max(CASE WHEN band = 3 THEN v END) AS d3
  FROM bands GROUP BY media_id, f
),
fp AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b,
         bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
       + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3))
         AS hamming
  FROM hashes a JOIN hashes b ON a.media_id < b.media_id
)
SELECT id_a, id_b, CAST(min(hamming) AS INTEGER) AS min_hamming,
       count(*) AS n_frame_matches
FROM fp WHERE hamming <= 3 GROUP BY id_a, id_b
"""


def q_incremental_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IMAGE near-dup
    (`operators/imagehash.py::ingest_image_increment`): the media twin
    of the text/embedding incremental protocol — two real deliveries
    through a persisted (id, d0..d3) hash state.  Delivery 1 ingests
    the even docs' PNGs (the `image_dedup_dhash` md5-pixel fixture);
    delivery 2 brings the odd docs plus +3-brightness twins of the
    doc_id % 4 = 0 images (history members) and decides them via the
    pigeonhole band join against the state — history pixels are never
    re-decoded.  Oracle: full recompute over history ∪ delta
    restricted to delta rows."""
    _prep(spark)
    import os
    import shutil
    import tempfile

    from minerva_etl_spark.operators.imagehash import (
        ingest_image_increment,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(delta: bool):
        def run(batches):
            import hashlib

            import pandas as pd

            from minerva_etl_spark.operators.multimodal import (
                synthesize_png,
            )

            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    d = int(did)

                    def png(pert: int) -> bytes:
                        return synthesize_png(
                            [
                                min(int(hashlib.md5(
                                    f"{d}:{x}:{y}".encode()
                                ).hexdigest()[:2], 16) + pert, 255)
                                for y in range(8)
                                for x in range(9)
                            ], 9, 8, 1,
                        )

                    if not delta and d % 2 == 0:
                        rows.append((d, png(0)))
                    if delta and d % 2 == 1:
                        rows.append((d, png(0)))
                    if delta and d % 4 == 0:
                        rows.append((d + 100000, png(3)))
                yield pd.DataFrame(rows, columns=["media_id", "payload"])

        return run

    schema = "media_id bigint, payload binary"
    # deliveries staged like every other media fixture (r16): the row
    # times the increment protocol (state build + band-join decide),
    # not the per-pixel Python md5 synthesis — which otherwise re-ran
    # inside BOTH deliveries' lineages on every execution
    hist = _media_fixture_staged(
        spark, sf_dir, "incimg_hist",
        lambda: docs.mapInPandas(synth(False), schema=schema),
    )
    delta = _media_fixture_staged(
        spark, sf_dir, "incimg_delta",
        lambda: docs.mapInPandas(synth(True), schema=schema),
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_incimg_")
    state_path = os.path.join(root, "img_state")
    ingest_image_increment(spark, hist, state_path)
    out = ingest_image_increment(spark, delta, state_path)
    shutil.rmtree(root, ignore_errors=True)  # decisions are checkpointed
    return out


_ORACLE_INCREMENTAL_IMAGE = """
WITH imgs AS (
  SELECT doc_id AS media_id, doc_id AS d, 0 AS pert,
         CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS is_delta
  FROM documents
  UNION ALL
  SELECT doc_id + 100000, doc_id, 3, 1 FROM documents
  WHERE doc_id % 4 = 0
),
g AS (
  SELECT media_id, is_delta, x.x AS x, y.y AS y,
         least(CAST(('0x' || substr(md5(
             CAST(d AS VARCHAR) || ':' || CAST(x.x AS VARCHAR)
             || ':' || CAST(y.y AS VARCHAR)), 1, 2)) AS INTEGER)
               + pert, 255) AS gray
  FROM imgs,
       UNNEST(generate_series(0, 8)) AS x(x),
       UNNEST(generate_series(0, 7)) AS y(y)
),
bits AS (
  SELECT a.media_id, a.is_delta, (a.y * 8 + a.x) AS i,
         CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON a.media_id = b.media_id AND a.y = b.y
                    AND b.x = a.x + 1
  WHERE a.x < 8
),
bands AS (
  SELECT media_id, is_delta, i // 16 AS band,
         CAST(sum(bit * (1 << (i % 16))) AS INTEGER) AS v
  FROM bits GROUP BY media_id, is_delta, i // 16
),
hashes AS (
  SELECT media_id, is_delta,
         max(CASE WHEN band = 0 THEN v END) AS d0,
         max(CASE WHEN band = 1 THEN v END) AS d1,
         max(CASE WHEN band = 2 THEN v END) AS d2,
         max(CASE WHEN band = 3 THEN v END) AS d3
  FROM bands GROUP BY media_id, is_delta
),
near AS (
  SELECT a.media_id, CAST(min(b.media_id) AS BIGINT) AS near_dup_of
  FROM hashes a JOIN hashes b ON b.media_id < a.media_id
  WHERE a.is_delta = 1
    AND bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
      + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3)) <= 3
  GROUP BY a.media_id
)
SELECT h.media_id, n.near_dup_of,
       (n.near_dup_of IS NULL) AS keep
FROM hashes h LEFT JOIN near n USING (media_id)
WHERE h.is_delta = 1
"""


def q_incremental_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental VIDEO near-dup
    (`operators/imagehash.py::ingest_video_increment`): two clip
    deliveries through the persisted per-frame hash state — delivery
    1 ingests the even docs' 3-frame AVIs (the `video_dedup_dhash`
    md5-pixel fixture), delivery 2 brings the odd docs plus
    +3-brightness twin clips of the doc_id % 4 = 0 members; a delta
    clip dups to the lowest clip sharing ANY frame within hamming 3.
    History footage is never re-decoded.  Oracle: full recompute over
    history ∪ delta restricted to delta clips."""
    _prep(spark)
    import os
    import shutil
    import tempfile

    from minerva_etl_spark.operators.imagehash import (
        ingest_video_increment,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(delta: bool):
        def run(batches):
            import hashlib

            import pandas as pd

            from minerva_etl_spark.operators.multimodal import (
                synthesize_avi,
            )

            def gray(d: int, f: int, x: int, y: int) -> int:
                return int(hashlib.md5(
                    f"{d}:{f}:{x}:{y}".encode()
                ).hexdigest()[:2], 16)

            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    d = int(did)

                    def clip(pert: int) -> bytes:
                        frames = []
                        for f in range(3):
                            frames.append(bytes(
                                v
                                for y in range(8)
                                for x in range(9)
                                for v in (
                                    min(gray(d, f, x, y) + pert, 255),
                                ) * 3
                            ))
                        return synthesize_avi(frames, 9, 8)

                    if not delta and d % 2 == 0:
                        rows.append((d, clip(0)))
                    if delta and d % 2 == 1:
                        rows.append((d, clip(0)))
                    if delta and d % 4 == 0:
                        rows.append((d + 100000, clip(3)))
                yield pd.DataFrame(rows, columns=["media_id", "payload"])

        return run

    schema = "media_id bigint, payload binary"
    # deliveries staged like every other media fixture (r16) — the row
    # times decode + increment, not per-pixel Python md5 synthesis
    hist = _media_fixture_staged(
        spark, sf_dir, "incvid_hist",
        lambda: docs.mapInPandas(synth(False), schema=schema),
    )
    delta = _media_fixture_staged(
        spark, sf_dir, "incvid_delta",
        lambda: docs.mapInPandas(synth(True), schema=schema),
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_incvid_")
    state_path = os.path.join(root, "vid_state")
    ingest_video_increment(spark, hist, state_path)
    out = ingest_video_increment(spark, delta, state_path)
    shutil.rmtree(root, ignore_errors=True)  # decisions are checkpointed
    return out


_ORACLE_INCREMENTAL_VIDEO = """
WITH clips AS (
  SELECT doc_id AS media_id, doc_id AS d, 0 AS pert,
         CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS is_delta
  FROM documents
  UNION ALL
  SELECT doc_id + 100000, doc_id, 3, 1 FROM documents
  WHERE doc_id % 4 = 0
),
g AS (
  SELECT media_id, is_delta, fr.f AS f, x.x AS x, y.y AS y,
         least(CAST(('0x' || substr(md5(
             CAST(d AS VARCHAR) || ':' || CAST(fr.f AS VARCHAR)
             || ':' || CAST(x.x AS VARCHAR)
             || ':' || CAST(y.y AS VARCHAR)), 1, 2)) AS INTEGER)
               + pert, 255) AS gray
  FROM clips,
       UNNEST(generate_series(0, 2)) AS fr(f),
       UNNEST(generate_series(0, 8)) AS x(x),
       UNNEST(generate_series(0, 7)) AS y(y)
),
bits AS (
  SELECT a.media_id, a.is_delta, a.f, (a.y * 8 + a.x) AS i,
         CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON a.media_id = b.media_id AND a.f = b.f
                    AND a.y = b.y AND b.x = a.x + 1
  WHERE a.x < 8
),
bands AS (
  SELECT media_id, is_delta, f, i // 16 AS band,
         CAST(sum(bit * (1 << (i % 16))) AS INTEGER) AS v
  FROM bits GROUP BY media_id, is_delta, f, i // 16
),
hashes AS (
  SELECT media_id, is_delta, f,
         max(CASE WHEN band = 0 THEN v END) AS d0,
         max(CASE WHEN band = 1 THEN v END) AS d1,
         max(CASE WHEN band = 2 THEN v END) AS d2,
         max(CASE WHEN band = 3 THEN v END) AS d3
  FROM bands GROUP BY media_id, is_delta, f
),
near AS (
  SELECT a.media_id, CAST(min(b.media_id) AS BIGINT) AS near_dup_of
  FROM hashes a JOIN hashes b ON b.media_id < a.media_id
  WHERE a.is_delta = 1
    AND bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
      + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3)) <= 3
  GROUP BY a.media_id
)
SELECT c.media_id, n.near_dup_of,
       (n.near_dup_of IS NULL) AS keep
FROM (SELECT DISTINCT media_id FROM hashes WHERE is_delta = 1) c
LEFT JOIN near n USING (media_id)
"""


def q_audio_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio dedup (`operators/audiohash.py` +
    `imagehash.dhash_pairs` — one pigeonhole machine for every 64-bit
    perceptual hash): every doc becomes a 4160-sample PCM-16 WAV
    with full-entropy samples — eight samples per md5 block:
    sample(i) = (int(md5(f"{doc_id}:a:{i//8}")[(i%8)*4:(i%8)*4+4],
    16) % 997) - 498 — so the pair output is EXACTLY the planted
    twins at any corpus size (the earlier arithmetic envelope left
    residual structure; see the image row's rationale).
    Docs at doc_id % 4 = 0 gain a +2-DC twin (media_id + 100000)
    whose envelope SHAPE survives, so twins pair within radius 3.
    The REAL stdlib WAV codec round-trips the samples; the oracle
    recomputes every frame energy via DuckDB's own md5 and
    brute-forces all pairs."""
    _prep(spark)
    from minerva_etl_spark.operators.audiohash import audio_fingerprint
    from minerva_etl_spark.operators.imagehash import dhash_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import hashlib

        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_wav

        import numpy as np

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                # 8 samples per digest: '0x'+4-hex == big-endian u16
                # of digest bytes [2k, 2k+2) — one numpy pass per clip
                buf = b"".join(
                    hashlib.md5(f"{d}:a:{blk}".encode()).digest()
                    for blk in range(65 * 64 // 8)
                )
                u16 = np.frombuffer(buf, dtype=">u2").astype(np.int64)
                s = ((u16 % 997) - 498).tolist()
                rows.append((d, synthesize_wav(s, 8000)))
                if d % 4 == 0:
                    rows.append(
                        (d + 100000,
                         synthesize_wav([v + 2 for v in s], 8000))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = _media_fixture_staged(
        spark, sf_dir, "audiofp",
        lambda: docs.mapInPandas(
            synth, schema="media_id bigint, payload binary"
        ),
    )
    hashes = audio_fingerprint(media, on_error="fail")
    return dhash_pairs(
        hashes.select("media_id", "d0", "d1", "d2", "d3"), radius=3
    )


_ORACLE_AUDIO_FINGERPRINT = """
WITH clips AS (
  SELECT doc_id AS media_id, doc_id AS d, 0 AS dc FROM documents
  UNION ALL
  SELECT doc_id + 100000, doc_id, 2 FROM documents WHERE doc_id % 4 = 0
),
smp AS (
  SELECT media_id, i.i AS i,
         ((CAST(('0x' || substr(md5(
             CAST(d AS VARCHAR) || ':a:' || CAST(i.i // 8 AS VARCHAR)),
             (i.i % 8) * 4 + 1, 4)) AS INTEGER)) % 997) - 498 + dc AS s
  FROM clips, UNNEST(generate_series(0, 65*64 - 1)) AS i(i)
),
fe AS (
  SELECT media_id, i // 64 AS f, sum(s * s) AS e
  FROM smp GROUP BY media_id, i // 64
),
bits AS (
  SELECT a.media_id, a.f AS i,
         CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
  FROM fe a JOIN fe b ON a.media_id = b.media_id AND b.f = a.f + 1
  WHERE a.f < 64
),
bands AS (
  SELECT media_id, i // 16 AS band,
         CAST(sum(bit * (1 << (i % 16))) AS INTEGER) AS v
  FROM bits GROUP BY media_id, i // 16
),
hashes AS (
  SELECT media_id,
         max(CASE WHEN band = 0 THEN v END) AS d0,
         max(CASE WHEN band = 1 THEN v END) AS d1,
         max(CASE WHEN band = 2 THEN v END) AS d2,
         max(CASE WHEN band = 3 THEN v END) AS d3
  FROM bands GROUP BY media_id
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
          + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3))
         AS INTEGER) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
    + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3)) <= 3
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: documents' text bytes as opaque payloads →
    Arrow-batched mapInPandas feature extraction.  The decode is the
    deterministic byte-histogram stand-in (real codecs aren't in this
    image — operators/multimodal.py), which is exactly computable in
    SQL, so the full rows/schema/hash oracle applies."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = M.extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 4), 6).alias("f3"),
    )


# the fake decode is a plain byte-histogram, so it has an exact SQL
# oracle: per-byte bucket = byte >> 5, normalized by payload length
_ORACLE_MULTIMODAL = """
WITH d AS (SELECT doc_id, encode(text) AS b FROM documents),
bytes AS (
  SELECT doc_id,
         CAST(('0x' || substr(hex(b), i * 2 + 1, 2)) AS INTEGER) // 32
             AS bucket
  FROM d, unnest(range(octet_length(b))) AS t(i)
),
hist AS (
  SELECT doc_id,
         count(*) FILTER (WHERE bucket = 0) AS c0,
         count(*) FILTER (WHERE bucket = 3) AS c3,
         count(*) AS n
  FROM bytes GROUP BY doc_id
)
SELECT d.doc_id AS media_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_bytes,
       round(coalesce(h.c0 / CAST(h.n AS DOUBLE), 0.0), 6) AS f0,
       round(coalesce(h.c3 / CAST(h.n AS DOUBLE), 0.0), 6) AS f3
FROM d LEFT JOIN hist h USING (doc_id)
"""


def q_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (`operators/multimodal.py::wav_features`):
    per-document PCM synthesized deterministically from doc_id
    (n = 40 + doc_id % 23 samples of ((doc_id*31 + i*17) % 2003) -
    1001 at 8 kHz), packed into actual RIFF/WAVE bytes
    (`synthesize_wav`), then decoded back through the stdlib ``wave``
    reader inside Arrow-batched tasks.  The oracle recomputes
    duration/RMS straight from the generating formula — any byte-level
    synthesis or parse error hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_wav

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = 40 + d % 23
                samples = [
                    ((d * 31 + i * 17) % 2003) - 1001 for i in range(n)
                ]
                payloads.append(synthesize_wav(samples, 8000))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "wav_pcm",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return M.wav_features(media)


_ORACLE_WAV = """
WITH s AS (
  SELECT doc_id, ((doc_id * 31 + t.i * 17) % 2003) - 1001 AS v
  FROM documents,
       UNNEST(generate_series(0, 40 + doc_id % 23 - 1)) AS t(i)
)
SELECT doc_id AS media_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(1 AS INT) AS n_channels,
       CAST((count(*) * 1000) // 8000 AS BIGINT) AS duration_ms,
       floor(sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)) * 1000000
             + 0.5) / 1000000 AS rms
FROM s GROUP BY doc_id
"""


def q_wav_g711_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL telephony-audio decode (`operators/multimodal.py::
    ulaw_expand` / `alaw_expand` via the `_wav_parse_manual` RIFF
    fallback): per-doc G.711 WAVs — EVEN doc_ids μ-law (format code
    7), ODD doc_ids A-law (format code 6); the stdlib ``wave`` reader
    REJECTS both, so the manual chunk walk is the only path — with
    n = 40 + doc_id % 23 bytes of (doc_id*13 + i*7) % 256 at 8 kHz
    mono, decoded through the standard CCITT expansions inside
    Arrow-batched tasks.  The oracle replays BOTH exact integer
    expansions (μ: complement → sign/exp/mantissa → re-bias; A: XOR
    0x55 → segment/mantissa, inverted sign convention) and the RMS on
    the shared half-up grid — a single wrong bit in either expansion,
    or a format-code dispatch mixup, shifts samples and
    hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import (
            synthesize_wav_alaw,
            synthesize_wav_mulaw,
        )

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = 40 + d % 23
                raw = bytes((d * 13 + i * 7) % 256 for i in range(n))
                mk = synthesize_wav_mulaw if d % 2 == 0 \
                    else synthesize_wav_alaw
                payloads.append(mk(raw, 8000))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "wav_g711",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return M.wav_features(media)


# G.711 expansions in pure integer SQL.  μ-law: u = ~b = 255 - b,
# t = ((mant*8 + 132) << exp) - 132, negative when the sign bit is
# set.  A-law: a = b XOR 85; segment 0 is linear (mant*16 + 8), else
# ((mant*16 + 264) << (seg-1)); sign bit SET means POSITIVE.
_ORACLE_WAV_G711 = """
WITH b AS (
  SELECT doc_id,
         255 - ((doc_id * 13 + t.i * 7) % 256) AS u,
         xor((doc_id * 13 + t.i * 7) % 256, 85) AS a
  FROM documents,
       UNNEST(generate_series(0, 40 + doc_id % 23 - 1)) AS t(i)
), m AS (
  SELECT doc_id, u, a,
         (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132 AS mu_mag,
         CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
              ELSE ((a % 16) * 16 + 264) << ((a // 16) % 8 - 1)
         END AS al_mag
  FROM b
), s AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN CASE WHEN u >= 128 THEN -mu_mag ELSE mu_mag END
              ELSE CASE WHEN a >= 128 THEN al_mag ELSE -al_mag END
         END AS v
  FROM m
)
SELECT doc_id AS media_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(1 AS INT) AS n_channels,
       CAST((count(*) * 1000) // 8000 AS BIGINT) AS duration_ms,
       floor(sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)) * 1000000
             + 0.5) / 1000000 AS rms
FROM s GROUP BY doc_id
"""


def q_wav_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain audio features (`operators/multimodal.py::
    wav_spectral`, numpy rfft inside Arrow-batched tasks): per-doc
    16-bit PCM WAVs carrying a two-tone fixture with an INTEGER number
    of cycles per tone — n = 64 + (doc_id%3)*16 samples, tone 1 at
    bin k1 = 3 + doc_id % 11 (amplitude 12000), tone 2 at bin
    k2 = k1 + 2 + doc_id % 7 (amplitude 4000) — so the DFT
    concentrates each tone exactly in its bin (quantization noise is
    ~3 orders of magnitude below either peak) and the oracle predicts
    the two strongest bins and their frequencies (bin * rate / n)
    closed-form.  A bin-indexing, rate-mapping, or rfft-layout bug
    hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import math

        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_wav

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = 64 + (d % 3) * 16
                k1 = 3 + d % 11
                k2 = k1 + 2 + d % 7
                samples = [
                    math.floor(
                        12000 * math.sin(2 * math.pi * k1 * i / n)
                        + 4000 * math.sin(2 * math.pi * k2 * i / n)
                        + 0.5
                    )
                    for i in range(n)
                ]
                payloads.append(synthesize_wav(samples, 8000))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "wav_spec",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return M.wav_spectral(media)


_ORACLE_WAV_SPECTRAL = """
SELECT doc_id AS media_id,
       CAST(64 + (doc_id % 3) * 16 AS BIGINT) AS n_samples,
       CAST(8000 AS INT) AS sample_rate,
       CAST(3 + doc_id % 11 AS INT) AS dominant_bin,
       CAST((3 + doc_id % 11) * 8000 AS DOUBLE)
         / (64 + (doc_id % 3) * 16) AS dominant_freq,
       CAST(5 + doc_id % 11 + doc_id % 7 AS INT) AS second_bin,
       CAST((5 + doc_id % 11 + doc_id % 7) * 8000 AS DOUBLE)
         / (64 + (doc_id % 3) * 16) AS second_freq
FROM documents
"""


def q_exif_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF census over a JPEG column (`operators/exif.py::
    exif_scan`, r13 — the metadata/privacy pass before images enter
    a training set): every doc becomes a real baseline JPEG; docs NOT
    at doc_id % 7 == 0 gain a spec-shaped APP1 Exif (byte order
    alternating II/MM by parity, formula make/model/orientation/
    datetime, a GPS sub-IFD pointer at doc_id % 3 == 0); % 7 == 0
    docs stay EXIF-less and must yield NULL metadata (census, not
    filter).  The oracle rebuilds every field closed-form; a TIFF
    byte-order, offset-vs-inline, or GPS-pointer bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.exif import (
        exif_scan,
        insert_app1,
        synthesize_exif_app1,
    )
    from minerva_etl_spark.operators.jpeg import synthesize_jpeg

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 5, 4 + d % 3
                px = bytes(
                    [(d * 37) % 256, (d * 59 + 11) % 256,
                     (d * 83 + 29) % 256] * (w * h)
                )
                payload = synthesize_jpeg(
                    px, w, h, quality=75, subsampling="4:2:0"
                )
                if d % 7 != 0:
                    app1 = synthesize_exif_app1(
                        make=f"Cam{d % 5}",
                        model=f"Model X {d % 11}",
                        orientation=1 + d % 8,
                        datetime=f"2026:02:03 04:05:{d % 60:02d}",
                        gps=(1.0, 2.0) if d % 3 == 0 else None,
                        byte_order="II" if d % 2 == 0 else "MM",
                    )
                    payload = insert_app1(payload, app1)
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "exif",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return exif_scan(payloads)


_ORACLE_EXIF_SCAN = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE 'Cam' || CAST(doc_id % 5 AS VARCHAR) END AS make,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE 'Model X ' || CAST(doc_id % 11 AS VARCHAR)
       END AS model,
       CAST(CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE 1 + doc_id % 8 END AS INT) AS orientation,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE '2026:02:03 04:05:'
              || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
       END AS exif_datetime,
       CASE WHEN doc_id % 7 = 0 THEN FALSE
            ELSE doc_id % 3 = 0 END AS has_gps,
       CAST(CASE WHEN doc_id % 7 = 0 THEN 0
            WHEN doc_id % 3 = 0 THEN 5 ELSE 4 END AS INT) AS n_tags
FROM documents
"""


def q_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode (`operators/gif.py::gif_features`): per-doc
    animated GIFs synthesized deterministically — w = 5 + doc_id % 4,
    h = 4 + doc_id % 3, an 8-colour palette (i*41, i*59, i*83) % 256,
    first-frame index(x, y) = (doc_id*7 + y*31 + x*13) % 8, stored
    INTERLACED when doc_id is odd, 1 + doc_id % 3 frames (later
    frames shift the formula by f*17, proving the frame walk skips
    them for features but counts them) — then decoded back through
    the real LZW + deinterlace + palette path inside Arrow-batched
    tasks.  The oracle recomputes first-frame per-channel means from
    the generating formula: a bit-packing, width-growth, interlace,
    or palette bug hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.gif import synthesize_gif

        palette = [
            ((i * 41) % 256, (i * 59) % 256, (i * 83) % 256)
            for i in range(8)
        ]
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 5 + d % 4, 4 + d % 3
                frames = [
                    [
                        (d * 7 + f * 17 + y * 31 + x * 13) % 8
                        for y in range(h)
                        for x in range(w)
                    ]
                    for f in range(1 + d % 3)
                ]
                payloads.append(
                    synthesize_gif(
                        frames, palette, w, h, interlace=(d % 2 == 1)
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "gif",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    from minerva_etl_spark.operators.gif import gif_features

    return gif_features(media).select(
        "media_id",
        "width",
        "height",
        "n_frames",
        "n_channels",
        F.col("channel_means")[0].alias("mean_c0"),
        F.col("channel_means")[1].alias("mean_c1"),
        F.col("channel_means")[2].alias("mean_c2"),
    )


_ORACLE_GIF = """
WITH dims AS (
  SELECT doc_id, 5 + doc_id % 4 AS w, 4 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h,
         (doc_id * 7 + y.y * 31 + x.x * 13) % 8 AS idx
  FROM dims,
       UNNEST(generate_series(0, w - 1)) AS x(x),
       UNNEST(generate_series(0, h - 1)) AS y(y)
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(1 + doc_id % 3 AS INT) AS n_frames,
       CAST(3 AS INT) AS n_channels,
       floor(CAST(sum((idx * 41) % 256) AS DOUBLE) / count(*)
             * 1000000 + 0.5) / 1000000 AS mean_c0,
       floor(CAST(sum((idx * 59) % 256) AS DOUBLE) / count(*)
             * 1000000 + 0.5) / 1000000 AS mean_c1,
       floor(CAST(sum((idx * 83) % 256) AS DOUBLE) / count(*)
             * 1000000 + 0.5) / 1000000 AS mean_c2
FROM px GROUP BY doc_id, w, h
"""


def q_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (`operators/multimodal.py::png_features`):
    per-document 8-bit RGB pixels synthesized deterministically from
    doc_id (w = 6 + doc_id % 5, h = 4 + doc_id % 3, value(x, y, ch) =
    (doc_id*7 + y*31 + x*13 + ch*101) % 256), encoded into actual PNG
    bytes with per-row filter type (doc_id + y) % 5 — so ALL five
    inverse filters (Sub/Up/Average/Paeth included) run in the decode
    path — then parsed back chunk-by-chunk + inflated inside
    Arrow-batched tasks.  The oracle recomputes the per-channel means
    straight from the generating formula: any byte-level synthesis,
    filter, or parse bug hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_png

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 5, 4 + d % 3
                px = bytes(
                    (d * 7 + y * 31 + x * 13 + ch * 101) % 256
                    for y in range(h)
                    for x in range(w)
                    for ch in range(3)
                )
                filters = [(d + y) % 5 for y in range(h)]
                payloads.append(synthesize_png(px, w, h, 3, filters))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "png_feat",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    # gate projection: the 3-element channel_means array is pivoted
    # into scalar double columns (driver canonicalizer cannot sort
    # raw array cells — the lifecycle_array_trend rule)
    return M.png_features(media).select(
        "media_id",
        "width",
        "height",
        "n_channels",
        F.col("channel_means")[0].alias("mean_c0"),
        F.col("channel_means")[1].alias("mean_c1"),
        F.col("channel_means")[2].alias("mean_c2"),
    )


_ORACLE_PNG = """
WITH dims AS (
  SELECT doc_id, 6 + doc_id % 5 AS w, 4 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, ch.c AS c,
         (doc_id * 7 + y.y * 31 + x.x * 13 + ch.c * 101) % 256 AS v
  FROM dims,
       UNNEST(generate_series(0, w - 1)) AS x(x),
       UNNEST(generate_series(0, h - 1)) AS y(y),
       UNNEST(generate_series(0, 2)) AS ch(c)
), chmean AS (
  SELECT doc_id, w, h, c,
         floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5)
             / 1000000 AS m
  FROM px GROUP BY doc_id, w, h, c
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(3 AS INT) AS n_channels,
       max(CASE WHEN c = 0 THEN m END) AS mean_c0,
       max(CASE WHEN c = 1 THEN m END) AS mean_c1,
       max(CASE WHEN c = 2 THEN m END) AS mean_c2
FROM chmean GROUP BY doc_id, w, h
"""


def q_avi_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode (`operators/multimodal.py::avi_features`):
    per-document uncompressed AVI synthesized deterministically from
    doc_id (w = 4 + doc_id % 3, h = 3 + doc_id % 2, n_frames =
    2 + doc_id % 3, pixel(f, x, y, ch) = (doc_id*11 + f*53 + y*31 +
    x*13 + ch*101) % 256, 12 fps), packed into actual RIFF 'AVI '
    bytes (bottom-up BGR DIB frames, padded rows), then decoded back
    through the container walk inside Arrow-batched tasks.  The oracle
    recomputes the all-frames per-channel means from the generating
    formula — any byte-level container, row-order, or BGR/RGB bug
    hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_avi

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h, nf = 4 + d % 3, 3 + d % 2, 2 + d % 3
                frames = [
                    bytes(
                        (d * 11 + f * 53 + y * 31 + x * 13 + ch * 101) % 256
                        for y in range(h)
                        for x in range(w)
                        for ch in range(3)
                    )
                    for f in range(nf)
                ]
                payloads.append(synthesize_avi(frames, w, h, fps=12))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "avi",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    # gate projection: channel_means pivoted to scalar doubles
    # (driver canonicalizer cannot sort raw array cells)
    return M.avi_features(media).select(
        "media_id",
        "width",
        "height",
        "fps",
        "n_frames",
        F.col("channel_means")[0].alias("mean_c0"),
        F.col("channel_means")[1].alias("mean_c1"),
        F.col("channel_means")[2].alias("mean_c2"),
    )


_ORACLE_AVI = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h,
         2 + doc_id % 3 AS nf
  FROM documents
), px AS (
  SELECT doc_id, w, h, nf, ch.c AS c,
         (doc_id * 11 + f.f * 53 + y.y * 31 + x.x * 13 + ch.c * 101)
             % 256 AS v
  FROM dims,
       UNNEST(generate_series(0, nf - 1)) AS f(f),
       UNNEST(generate_series(0, h - 1)) AS y(y),
       UNNEST(generate_series(0, w - 1)) AS x(x),
       UNNEST(generate_series(0, 2)) AS ch(c)
), chmean AS (
  SELECT doc_id, w, h, nf, c,
         floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5)
             / 1000000 AS m
  FROM px GROUP BY doc_id, w, h, nf, c
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(12 AS INT) AS fps,
       CAST(nf AS INT) AS n_frames,
       max(CASE WHEN c = 0 THEN m END) AS mean_c0,
       max(CASE WHEN c = 1 THEN m END) AS mean_c1,
       max(CASE WHEN c = 2 THEN m END) AS mean_c2
FROM chmean GROUP BY doc_id, w, h, nf
"""


def q_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy image decode (`operators/jpeg.py::jpeg_decode` via
    `multimodal.jpeg_features`): per-document solid-colour RGB
    (r = doc_id*37 % 256, g = doc_id*59+11 % 256, b = doc_id*83+29
    % 256; w = 6 + doc_id % 5, h = 4 + doc_id % 3) encoded into actual
    baseline JPEG bytes at quality 75 with 4:2:0 subsampling — SOI/
    DQT/SOF0/DHT/SOS markers, Huffman entropy coding, DCT + quant —
    then decoded back through the full marker walk + Huffman + dequant
    + IDCT + chroma upsample + YCbCr→RGB inside Arrow-batched tasks.

    A solid colour makes the LOSSY chain exactly recomputable: every
    8×8 block is constant, so only the DC coefficient survives
    (DC = 8·(c-128)), and the oracle replays YCbCr forward transform →
    half-up DC quantise/dequantise at the quality-75 Annex-K step →
    IDCT (dequant/8) → inverse YCbCr, all in closed form.  Any marker,
    Huffman-table, quant-table, subsample, or colour-transform bug
    hash-mismatches.  Padding/MCU-crop is exercised because w, h are
    not multiples of 16."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.jpeg import synthesize_jpeg

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 5, 4 + d % 3
                px = bytes(
                    [(d * 37) % 256, (d * 59 + 11) % 256,
                     (d * 83 + 29) % 256] * (w * h)
                )
                payloads.append(
                    synthesize_jpeg(px, w, h, quality=75,
                                    subsampling="4:2:0")
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "jpeg",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    # gate projection: channel_means pivoted to scalar doubles
    # (driver canonicalizer cannot sort raw array cells)
    return M.jpeg_features(media).select(
        "media_id",
        "width",
        "height",
        "n_channels",
        F.col("channel_means")[0].alias("mean_c0"),
        F.col("channel_means")[1].alias("mean_c1"),
        F.col("channel_means")[2].alias("mean_c2"),
    )


# The exact decoded value of a solid-colour baseline JPEG: forward
# YCbCr (half-up), per-component DC quantise → dequantise at the
# quality-scaled Annex-K DC step (16 luma / 17 chroma, libjpeg scale
# formula), IDCT of a DC-only block (= dequant/8), inverse YCbCr —
# every float expression written with the same literals and
# associativity as the codec so the doubles agree bit-for-bit; the
# +1e-7 half-up nudges mirror jpeg.py (see its module docstring).
_ORACLE_JPEG = """
WITH qt AS (
  SELECT GREATEST(1, LEAST(255, (16 * (200 - 2 * 75) + 50) // 100)) AS ql,
         GREATEST(1, LEAST(255, (17 * (200 - 2 * 75) + 50) // 100)) AS qc
), src AS (
  SELECT doc_id,
         (doc_id * 37) % 256 AS r,
         (doc_id * 59 + 11) % 256 AS g,
         (doc_id * 83 + 29) % 256 AS b,
         6 + doc_id % 5 AS w,
         4 + doc_id % 3 AS h
  FROM documents
), ycc AS (
  SELECT doc_id, w, h,
    LEAST(255, GREATEST(0,
      floor(0.299e0 * r + 0.587e0 * g + 0.114e0 * b + 0.5e0))) AS y,
    LEAST(255, GREATEST(0,
      floor(128 - 0.168736e0 * r - 0.331264e0 * g + 0.5e0 * b + 0.5e0))) AS cb,
    LEAST(255, GREATEST(0,
      floor(128 + 0.5e0 * r - 0.418688e0 * g - 0.081312e0 * b + 0.5e0))) AS cr
  FROM src
), rec AS (
  SELECT doc_id, w, h,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (y - 128)) / ql + 0.5e0 + 1e-7) * ql / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS yq,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (cb - 128)) / qc + 0.5e0 + 1e-7) * qc / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS cbq,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (cr - 128)) / qc + 0.5e0 + 1e-7) * qc / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS crq
  FROM ycc, qt
), rgb AS (
  SELECT doc_id, w, h,
    LEAST(255, GREATEST(0,
      floor(yq + 1.402e0 * (crq - 128) + 0.5e0))) AS r2,
    LEAST(255, GREATEST(0,
      floor(yq - 0.344136e0 * (cbq - 128) - 0.714136e0 * (crq - 128)
            + 0.5e0))) AS g2,
    LEAST(255, GREATEST(0,
      floor(yq + 1.772e0 * (cbq - 128) + 0.5e0))) AS b2
  FROM rec
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(3 AS INT) AS n_channels,
       CAST(r2 AS DOUBLE) AS mean_c0,
       CAST(g2 AS DOUBLE) AS mean_c1,
       CAST(b2 AS DOUBLE) AS mean_c2
FROM rgb
"""


def q_video_features_mjpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPRESSED video decode (r14 — the r13 verdict's ask 4):
    MJPG-in-AVI, the one video codec implementable without ffmpeg —
    each '00dc' frame is a real baseline JPEG decoded by
    `operators/jpeg.py::jpeg_decode` inside `multimodal.avi_decode`'s
    RIFF walk.  Per document: 2 + d%3 solid-colour frames whose
    colour VARIES per frame index k, JPEG-encoded at quality 75 into
    a real AVI (RIFF/hdrl/strh/strf/movi) — `avi_features` then
    decodes every frame and means over all frames' pixels.  Solid
    colours make the lossy chain exactly recomputable per frame (the
    `jpeg_features` closed form), so the oracle replays forward
    YCbCr → DC quantise/dequantise → inverse YCbCr per (doc, frame)
    and averages across frames on the same half-up 6-dp grid.  A
    container-walk, stream-geometry, Huffman, quant, upsample, or
    frame-order bug hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import (
            synthesize_avi,
        )

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 5, 4 + d % 3
                nf = 2 + d % 3
                frames = [
                    bytes(
                        [
                            (d * 37 + 11 * k) % 256,
                            (d * 59 + 7 * k + 11) % 256,
                            (d * 83 + 13 * k + 29) % 256,
                        ]
                        * (w * h)
                    )
                    for k in range(nf)
                ]
                payloads.append(
                    synthesize_avi(
                        frames, w, h, fps=10, codec="MJPG", quality=75
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "mjpg",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return M.avi_features(media).select(
        "media_id",
        "width",
        "height",
        "fps",
        "n_frames",
        F.col("channel_means")[0].alias("mean_c0"),
        F.col("channel_means")[1].alias("mean_c1"),
        F.col("channel_means")[2].alias("mean_c2"),
    )


# per-frame closed form identical to _ORACLE_JPEG (solid colour →
# DC-only blocks), then the cross-frame average on avi_features'
# half-up 6-dp grid: floor(sum/n * 1e6 + 0.5)/1e6 with sum the exact
# integer pixel sum (value × w×h summed over frames)
_ORACLE_VIDEO_MJPEG = """
WITH qt AS (
  SELECT GREATEST(1, LEAST(255, (16 * (200 - 2 * 75) + 50) // 100)) AS ql,
         GREATEST(1, LEAST(255, (17 * (200 - 2 * 75) + 50) // 100)) AS qc
), fr AS (
  SELECT doc_id,
         6 + doc_id % 5 AS w,
         4 + doc_id % 3 AS h,
         2 + doc_id % 3 AS nf,
         unnest(generate_series(0, CAST(1 + doc_id % 3 AS INT))) AS k
  FROM documents
), src AS (
  SELECT doc_id, w, h, nf, k,
         (doc_id * 37 + 11 * k) % 256 AS r,
         (doc_id * 59 + 7 * k + 11) % 256 AS g,
         (doc_id * 83 + 13 * k + 29) % 256 AS b
  FROM fr
), ycc AS (
  SELECT doc_id, w, h, nf, k,
    LEAST(255, GREATEST(0,
      floor(0.299e0 * r + 0.587e0 * g + 0.114e0 * b + 0.5e0))) AS y,
    LEAST(255, GREATEST(0,
      floor(128 - 0.168736e0 * r - 0.331264e0 * g + 0.5e0 * b + 0.5e0))) AS cb,
    LEAST(255, GREATEST(0,
      floor(128 + 0.5e0 * r - 0.418688e0 * g - 0.081312e0 * b + 0.5e0))) AS cr
  FROM src
), rec AS (
  SELECT doc_id, w, h, nf, k,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (y - 128)) / ql + 0.5e0 + 1e-7) * ql / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS yq,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (cb - 128)) / qc + 0.5e0 + 1e-7) * qc / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS cbq,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (cr - 128)) / qc + 0.5e0 + 1e-7) * qc / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS crq
  FROM ycc, qt
), rgb AS (
  SELECT doc_id, w, h, nf,
    LEAST(255, GREATEST(0,
      floor(yq + 1.402e0 * (crq - 128) + 0.5e0))) AS r2,
    LEAST(255, GREATEST(0,
      floor(yq - 0.344136e0 * (cbq - 128) - 0.714136e0 * (crq - 128)
            + 0.5e0))) AS g2,
    LEAST(255, GREATEST(0,
      floor(yq + 1.772e0 * (cbq - 128) + 0.5e0))) AS b2
  FROM rec
), agg AS (
  SELECT doc_id, w, h, nf,
         SUM(r2) * w * h AS sr,
         SUM(g2) * w * h AS sg,
         SUM(b2) * w * h AS sb
  FROM rgb GROUP BY doc_id, w, h, nf
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(10 AS INT) AS fps,
       CAST(nf AS INT) AS n_frames,
       floor(CAST(sr AS DOUBLE) / (w * h * nf) * 1e6 + 0.5e0) / 1e6
         AS mean_c0,
       floor(CAST(sg AS DOUBLE) / (w * h * nf) * 1e6 + 0.5e0) / 1e6
         AS mean_c1,
       floor(CAST(sb AS DOUBLE) / (w * h * nf) * 1e6 + 0.5e0) / 1e6
         AS mean_c2
FROM agg
"""


def q_image_features_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format image column (`operators/multimodal.py::
    image_features`; r14 widens the cycle to THREE codecs so this row
    vouches the GIF leg too): doc_id % 3 == 0 carries the
    formula-patterned PNG fixture (the `png_features` generator),
    % 3 == 1 a solid-colour JPEG (the `jpeg_features` generator),
    % 3 == 2 an animated GIF (the `gif_features` palette formula,
    interlaced when odd, extra frames shifting the formula to prove
    the frame walk) — ONE binary column, per-payload magic-byte
    dispatch inside the Arrow batch, the realistic crawl shape.  The
    oracle unions the three closed-form recomputations keyed by
    doc_id % 3, so a sniffing bug, a cross-codec mixup, or any codec
    regressing hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.gif import synthesize_gif
        from minerva_etl_spark.operators.jpeg import synthesize_jpeg
        from minerva_etl_spark.operators.multimodal import synthesize_png

        palette = [
            ((i * 41) % 256, (i * 59) % 256, (i * 83) % 256)
            for i in range(8)
        ]
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 5, 4 + d % 3
                if d % 3 == 0:
                    px = bytes(
                        (d * 7 + y * 31 + x * 13 + ch * 101) % 256
                        for y in range(h)
                        for x in range(w)
                        for ch in range(3)
                    )
                    filters = [(d + y) % 5 for y in range(h)]
                    payloads.append(synthesize_png(px, w, h, 3, filters))
                elif d % 3 == 1:
                    px = bytes(
                        [(d * 37) % 256, (d * 59 + 11) % 256,
                         (d * 83 + 29) % 256] * (w * h)
                    )
                    payloads.append(
                        synthesize_jpeg(px, w, h, quality=75,
                                        subsampling="4:2:0")
                    )
                else:
                    frames = [
                        [
                            (d * 7 + f * 17 + y * 31 + x * 13) % 8
                            for y in range(h)
                            for x in range(w)
                        ]
                        for f in range(1 + d % 2)
                    ]
                    payloads.append(
                        synthesize_gif(
                            frames, palette, w, h,
                            interlace=(d % 2 == 1),
                        )
                    )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "img_mixed",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return M.image_features(media).select(
        "media_id",
        "format",
        "width",
        "height",
        "n_channels",
        F.col("channel_means")[0].alias("mean_c0"),
        F.col("channel_means")[1].alias("mean_c1"),
        F.col("channel_means")[2].alias("mean_c2"),
    )


# even docs: the PNG generating-formula means; odd docs: the JPEG
# solid-colour closed form (same chains as _ORACLE_PNG / _ORACLE_JPEG,
# restricted by parity and unioned)
_ORACLE_IMAGE_MIXED = """
WITH dims AS (
  SELECT doc_id, 6 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
  FROM documents WHERE doc_id % 3 = 0
), px AS (
  SELECT doc_id, w, h, ch.c AS c,
         (doc_id * 7 + y.y * 31 + x.x * 13 + ch.c * 101) % 256 AS v
  FROM dims,
       UNNEST(generate_series(0, w - 1)) AS x(x),
       UNNEST(generate_series(0, h - 1)) AS y(y),
       UNNEST(generate_series(0, 2)) AS ch(c)
), chmean AS (
  SELECT doc_id, w, h, c,
         floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5e0)
             / 1000000 AS m
  FROM px GROUP BY doc_id, w, h, c
), png_rows AS (
  SELECT doc_id AS media_id,
         'png' AS format,
         CAST(w AS INT) AS width,
         CAST(h AS INT) AS height,
         CAST(3 AS INT) AS n_channels,
         max(CASE WHEN c = 0 THEN m END) AS mean_c0,
         max(CASE WHEN c = 1 THEN m END) AS mean_c1,
         max(CASE WHEN c = 2 THEN m END) AS mean_c2
  FROM chmean GROUP BY doc_id, w, h
), qt AS (
  SELECT GREATEST(1, LEAST(255, (16 * (200 - 2 * 75) + 50) // 100)) AS ql,
         GREATEST(1, LEAST(255, (17 * (200 - 2 * 75) + 50) // 100)) AS qc
), src AS (
  SELECT doc_id,
         (doc_id * 37) % 256 AS r,
         (doc_id * 59 + 11) % 256 AS g,
         (doc_id * 83 + 29) % 256 AS b,
         6 + doc_id % 5 AS w,
         4 + doc_id % 3 AS h
  FROM documents WHERE doc_id % 3 = 1
), ycc AS (
  SELECT doc_id, w, h,
    LEAST(255, GREATEST(0,
      floor(0.299e0 * r + 0.587e0 * g + 0.114e0 * b + 0.5e0))) AS y,
    LEAST(255, GREATEST(0,
      floor(128 - 0.168736e0 * r - 0.331264e0 * g + 0.5e0 * b + 0.5e0))) AS cb,
    LEAST(255, GREATEST(0,
      floor(128 + 0.5e0 * r - 0.418688e0 * g - 0.081312e0 * b + 0.5e0))) AS cr
  FROM src
), rec AS (
  SELECT doc_id, w, h,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (y - 128)) / ql + 0.5e0 + 1e-7) * ql / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS yq,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (cb - 128)) / qc + 0.5e0 + 1e-7) * qc / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS cbq,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (cr - 128)) / qc + 0.5e0 + 1e-7) * qc / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS crq
  FROM ycc, qt
), jpeg_rows AS (
  SELECT doc_id AS media_id,
         'jpeg' AS format,
         CAST(w AS INT) AS width,
         CAST(h AS INT) AS height,
         CAST(3 AS INT) AS n_channels,
         CAST(LEAST(255, GREATEST(0,
           floor(yq + 1.402e0 * (crq - 128) + 0.5e0))) AS DOUBLE) AS mean_c0,
         CAST(LEAST(255, GREATEST(0,
           floor(yq - 0.344136e0 * (cbq - 128) - 0.714136e0 * (crq - 128)
                 + 0.5e0))) AS DOUBLE) AS mean_c1,
         CAST(LEAST(255, GREATEST(0,
           floor(yq + 1.772e0 * (cbq - 128) + 0.5e0))) AS DOUBLE) AS mean_c2
  FROM rec
)
, gdims AS (
  SELECT doc_id, 6 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
  FROM documents WHERE doc_id % 3 = 2
), gpx AS (
  SELECT doc_id, w, h,
         (doc_id * 7 + y.y * 31 + x.x * 13) % 8 AS idx
  FROM gdims,
       UNNEST(generate_series(0, w - 1)) AS x(x),
       UNNEST(generate_series(0, h - 1)) AS y(y)
), gch AS (
  SELECT doc_id, w, h, c.c AS c,
         CASE c.c WHEN 0 THEN (idx * 41) % 256
                  WHEN 1 THEN (idx * 59) % 256
                  ELSE (idx * 83) % 256 END AS v
  FROM gpx, UNNEST(generate_series(0, 2)) AS c(c)
), gmean AS (
  SELECT doc_id, w, h, c,
         floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5e0)
             / 1000000 AS m
  FROM gch GROUP BY doc_id, w, h, c
), gif_rows AS (
  SELECT doc_id AS media_id,
         'gif' AS format,
         CAST(w AS INT) AS width,
         CAST(h AS INT) AS height,
         CAST(3 AS INT) AS n_channels,
         max(CASE WHEN c = 0 THEN m END) AS mean_c0,
         max(CASE WHEN c = 1 THEN m END) AS mean_c1,
         max(CASE WHEN c = 2 THEN m END) AS mean_c2
  FROM gmean GROUP BY doc_id, w, h
)
SELECT * FROM png_rows UNION ALL SELECT * FROM jpeg_rows
UNION ALL SELECT * FROM gif_rows
"""


def q_tiff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-TIFF decode (`operators/tiff.py`, r14 — the
    scanned-document leg of the image arc): per-document multi-strip
    TIFFs cycling gray-II vs RGB-MM by parity and ALL THREE
    compressions by doc_id % 3 — PackBits (0), TIFF-variant LZW with
    the horizontal-differencing predictor alternating (1), and
    uncompressed (2) — plus a SECOND page (different formula seed) on
    odd docs: the decoder must count pages but decode only the first,
    assemble strips, invert PackBits/LZW (MSB-first, early change)
    and the predictor.  Decode is LOSSLESS, so the oracle replays the
    generating-formula means directly; a byte-order, strip-assembly,
    compression, predictor, or page-walk bug hash-mismatches.  Gray
    rows pivot to mean_c0 with NULL c1/c2 (the honest single-channel
    shape)."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.tiff import synthesize_tiff

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 5, 4 + d % 3
                ch = 1 if d % 2 else 3
                pages = []
                for k in range(1 + d % 2):
                    px = bytes(
                        (d + k * 17 + y * 31 + x * 13 + c * 101) % 256
                        for y in range(h)
                        for x in range(w)
                        for c in range(ch)
                    )
                    pages.append((px, w, h, ch))
                comp = {0: 32773, 1: 5, 2: 1}[d % 3]
                payloads.append(
                    synthesize_tiff(
                        pages,
                        byte_order="II" if d % 2 else "MM",
                        compression=comp,
                        rows_per_strip=3,
                        predictor=2 if d % 6 == 1 else 1,
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    from minerva_etl_spark.operators.tiff import tiff_features

    media = _media_fixture_staged(
        spark, sf_dir, "tiff",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return tiff_features(media).select(
        "media_id",
        "width",
        "height",
        "n_channels",
        "n_pages",
        "byte_order",
        # F.get: NULL past the end (ANSI-safe) — gray rows carry a
        # 1-element means array
        F.get("channel_means", 0).alias("mean_c0"),
        F.get("channel_means", 1).alias("mean_c1"),
        F.get("channel_means", 2).alias("mean_c2"),
    )


_ORACLE_TIFF = """
WITH dims AS (
  SELECT doc_id,
         6 + doc_id % 5 AS w,
         4 + doc_id % 3 AS h,
         CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END AS ch,
         CASE WHEN doc_id % 2 = 1 THEN 'II' ELSE 'MM' END AS bo,
         1 + doc_id % 2 AS np
  FROM documents
), px AS (
  SELECT doc_id, w, h, ch, c.c AS c,
         (doc_id + y.y * 31 + x.x * 13 + c.c * 101) % 256 AS v
  FROM dims,
       UNNEST(generate_series(0, w - 1)) AS x(x),
       UNNEST(generate_series(0, h - 1)) AS y(y),
       UNNEST(generate_series(0, ch - 1)) AS c(c)
), m AS (
  SELECT doc_id, c,
         floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5e0)
             / 1000000 AS mv
  FROM px GROUP BY doc_id, c
)
SELECT d.doc_id AS media_id,
       CAST(d.w AS INT) AS width,
       CAST(d.h AS INT) AS height,
       CAST(d.ch AS INT) AS n_channels,
       CAST(d.np AS INT) AS n_pages,
       d.bo AS byte_order,
       max(CASE WHEN m.c = 0 THEN m.mv END) AS mean_c0,
       max(CASE WHEN m.c = 1 THEN m.mv END) AS mean_c1,
       max(CASE WHEN m.c = 2 THEN m.mv END) AS mean_c2
FROM dims d JOIN m ON d.doc_id = m.doc_id
GROUP BY d.doc_id, d.w, d.h, d.ch, d.np, d.bo
"""


def q_wav_adpcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode (`operators/adpcm.py` via the
    `_wav_parse_manual` RIFF fallback, r14): per-doc single-block
    mono IMA-ADPCM WAVs (format code 0x11) — nibble stream
    (d*7 + k*3) % 16, header predictor ((d*131) % 4096) - 2048, step
    index d % 89 — decoded through the 89-step state machine inside
    Arrow tasks.  The decoder is STATEFUL per sample, and the oracle
    replays it EXACTLY: a DuckDB ``list_reduce`` carrying
    [step_index, s0..sk] through the same integer step table, then
    the RMS on the shared half-up grid.  One wrong clamp, table
    entry, nibble order, or sign bit diverges the entire suffix and
    hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.adpcm import (
            synthesize_wav_ima,
        )

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n_nib = 2 * (20 + d % 8)
                nibs = [(d * 7 + k * 3) % 16 for k in range(n_nib)]
                payloads.append(
                    synthesize_wav_ima(
                        nibs,
                        predictor=((d * 131) % 4096) - 2048,
                        step_index=d % 89,
                        sample_rate=8000,
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "wav_adpcm",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return M.wav_features(media)


def _oracle_wav_adpcm() -> str:
    """The IMA state machine replayed in DuckDB: ``list_reduce`` over
    the nibble stream with accumulator layout [idx, s0, s1, ...] —
    fresh list per step (NO struct-field accumulator: DuckDB mutates
    reduce structs field-by-field, which double-applies expressions
    that re-read earlier fields)."""
    from minerva_etl_spark.operators.adpcm import (
        INDEX_TABLE,
        STEP_TABLE,
    )

    st = "[" + ",".join(map(str, STEP_TABLE)) + "]"
    it = "[" + ",".join(map(str, INDEX_TABLE)) + "]"
    df = (
        "((tbl.st[acc[1] + 1] // 8)"
        " + CASE WHEN (x[1] & 1) = 1 THEN tbl.st[acc[1] + 1] // 4"
        " ELSE 0 END"
        " + CASE WHEN (x[1] & 2) = 2 THEN tbl.st[acc[1] + 1] // 2"
        " ELSE 0 END"
        " + CASE WHEN (x[1] & 4) = 4 THEN tbl.st[acc[1] + 1]"
        " ELSE 0 END)"
    )
    p2 = (
        f"LEAST(32767, GREATEST(-32768, acc[-1] + "
        f"CASE WHEN (x[1] & 8) = 8 THEN -{df} ELSE {df} END))"
    )
    ni = "LEAST(88, GREATEST(0, acc[1] + tbl.it[(x[1] & 15) + 1]))"
    lam = f"(acc, x) -> list_concat(list_concat([{ni}], acc[2:]), [{p2}])"
    return f"""
WITH tbl AS (SELECT {st} AS st, {it} AS it),
cfg AS (
  SELECT doc_id AS d,
         ((doc_id * 131) % 4096) - 2048 AS pred0,
         doc_id % 89 AS idx0,
         2 * (20 + doc_id % 8) AS n_nib
  FROM documents
),
dec AS (
  SELECT d, n_nib,
    list_reduce(
      list_prepend([idx0, pred0],
        list_transform(generate_series(0, n_nib - 1),
                       k -> [(d*7 + k*3) % 16])),
      {lam})[2:] AS samples
  FROM cfg, tbl
)
SELECT d AS media_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(n_nib + 1 AS BIGINT) AS n_frames,
       CAST(1 AS INT) AS n_channels,
       CAST(((n_nib + 1) * 1000) // 8000 AS BIGINT) AS duration_ms,
       floor(sqrt(CAST(list_sum(list_transform(samples,
                 v -> CAST(v*v AS HUGEINT))) AS DOUBLE)
                  / (n_nib + 1)) * 1000000 + 0.5) / 1000000 AS rms
FROM dec
"""


def q_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode (`operators/bmp.py`, r14): odd doc_ids carry
    24-bit BI_RGB with the PNG generating formula (top-down storage
    when d % 4 == 1 — both row orders load-bearing), even doc_ids an
    8-bit palettized image on the GIF palette formula, RLE8-compressed
    when d % 4 == 0 (runs + EOL/EOB escapes).  Decode is LOSSLESS and
    palette resolution is deterministic, so the oracle replays both
    legs closed-form; routed through the MIXED image dispatcher
    (`multimodal.image_features`) so the sniff edge is pinned too."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.bmp import synthesize_bmp

        palette = [
            ((i * 41) % 256, (i * 59) % 256, (i * 83) % 256)
            for i in range(8)
        ]
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 5, 4 + d % 3
                if d % 2 == 1:
                    px = bytes(
                        (d * 7 + y * 31 + x * 13 + c * 101) % 256
                        for y in range(h)
                        for x in range(w)
                        for c in range(3)
                    )
                    payloads.append(
                        synthesize_bmp(
                            px, w, h, bits=24,
                            topdown=(d % 4 == 1),
                        )
                    )
                else:
                    idx = bytes(
                        (d * 7 + y * 31 + x * 13) % 8
                        for y in range(h)
                        for x in range(w)
                    )
                    payloads.append(
                        synthesize_bmp(
                            idx, w, h, bits=8, palette=palette,
                            rle=(d % 4 == 0),
                        )
                    )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _media_fixture_staged(
        spark, sf_dir, "bmp",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return M.image_features(media).select(
        "media_id",
        "format",
        "width",
        "height",
        "n_channels",
        F.get("channel_means", 0).alias("mean_c0"),
        F.get("channel_means", 1).alias("mean_c1"),
        F.get("channel_means", 2).alias("mean_c2"),
    )


_ORACLE_BMP = """
WITH dims AS (
  SELECT doc_id, 6 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
  FROM documents
), rgb24 AS (
  SELECT doc_id, w, h, c.c AS c,
         (doc_id * 7 + y.y * 31 + x.x * 13 + c.c * 101) % 256 AS v
  FROM dims,
       UNNEST(generate_series(0, w - 1)) AS x(x),
       UNNEST(generate_series(0, h - 1)) AS y(y),
       UNNEST(generate_series(0, 2)) AS c(c)
  WHERE doc_id % 2 = 1
), pal8 AS (
  SELECT doc_id, w, h, c.c AS c,
         CASE c.c
           WHEN 0 THEN (((doc_id * 7 + y.y * 31 + x.x * 13) % 8) * 41)
                      % 256
           WHEN 1 THEN (((doc_id * 7 + y.y * 31 + x.x * 13) % 8) * 59)
                      % 256
           ELSE (((doc_id * 7 + y.y * 31 + x.x * 13) % 8) * 83) % 256
         END AS v
  FROM dims,
       UNNEST(generate_series(0, w - 1)) AS x(x),
       UNNEST(generate_series(0, h - 1)) AS y(y),
       UNNEST(generate_series(0, 2)) AS c(c)
  WHERE doc_id % 2 = 0
), px AS (
  SELECT * FROM rgb24 UNION ALL SELECT * FROM pal8
), m AS (
  SELECT doc_id, w, h, c,
         floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5e0)
             / 1000000 AS mv
  FROM px GROUP BY doc_id, w, h, c
)
SELECT doc_id AS media_id,
       'bmp' AS format,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(3 AS INT) AS n_channels,
       max(CASE WHEN c = 0 THEN mv END) AS mean_c0,
       max(CASE WHEN c = 1 THEN mv END) AS mean_c1,
       max(CASE WHEN c = 2 THEN mv END) AS mean_c2
FROM m GROUP BY doc_id, w, h
"""


def q_tiff_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG-in-TIFF decode (`operators/tiff.py` compression 7, r14 —
    the scanner hand-off format: every strip a complete baseline JPEG
    bitstream decoded by `operators/jpeg.py` inside the IFD/strip
    walk): per document a single page of SOLID-COLOUR BANDS, one per
    2-row strip, colour varying per band index — solid bands make the
    lossy chain exactly recomputable, so the oracle replays the
    quality-75 DC closed form per (doc, band) and weights the means
    by band height on the half-up 6-dp grid.  A strip-boundary,
    geometry-crosscheck, or either-codec bug hash-mismatches."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.tiff import synthesize_tiff

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 5, 4 + d % 3
                px = bytearray()
                for y in range(h):
                    k = y // 2
                    px += bytes(
                        (
                            (d * 37 + 11 * k) % 256,
                            (d * 59 + 7 * k + 11) % 256,
                            (d * 83 + 13 * k + 29) % 256,
                        )
                    ) * w
                payloads.append(
                    synthesize_tiff(
                        [(bytes(px), w, h, 3)],
                        byte_order="MM" if d % 2 else "II",
                        compression=7,
                        rows_per_strip=2,
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    from minerva_etl_spark.operators.tiff import tiff_features

    media = _media_fixture_staged(
        spark, sf_dir, "tiffjpeg",
        lambda: docs.mapInPandas(
            synth, "media_id bigint, payload binary"
        ),
    )
    return tiff_features(media).select(
        "media_id",
        "width",
        "height",
        "n_channels",
        "byte_order",
        F.get("channel_means", 0).alias("mean_c0"),
        F.get("channel_means", 1).alias("mean_c1"),
        F.get("channel_means", 2).alias("mean_c2"),
    )


# per-band quality-75 DC closed form (the _ORACLE_JPEG math, DOUBLE
# literals), weighted by band height: band k covers min(2, h - 2k)
# rows
_ORACLE_TIFF_JPEG = """
WITH qt AS (
  SELECT GREATEST(1, LEAST(255, (16 * (200 - 2 * 75) + 50) // 100)) AS ql,
         GREATEST(1, LEAST(255, (17 * (200 - 2 * 75) + 50) // 100)) AS qc
), fr AS (
  SELECT doc_id,
         6 + doc_id % 5 AS w,
         4 + doc_id % 3 AS h,
         unnest(generate_series(
             0, CAST((4 + doc_id % 3 + 1) // 2 - 1 AS INT))) AS k
  FROM documents
), src AS (
  SELECT doc_id, w, h, k,
         LEAST(2, h - 2 * k) AS band_rows,
         (doc_id * 37 + 11 * k) % 256 AS r,
         (doc_id * 59 + 7 * k + 11) % 256 AS g,
         (doc_id * 83 + 13 * k + 29) % 256 AS b
  FROM fr WHERE 2 * k < h
), ycc AS (
  SELECT doc_id, w, h, band_rows,
    LEAST(255, GREATEST(0,
      floor(0.299e0 * r + 0.587e0 * g + 0.114e0 * b + 0.5e0))) AS y,
    LEAST(255, GREATEST(0,
      floor(128 - 0.168736e0 * r - 0.331264e0 * g + 0.5e0 * b
            + 0.5e0))) AS cb,
    LEAST(255, GREATEST(0,
      floor(128 + 0.5e0 * r - 0.418688e0 * g - 0.081312e0 * b
            + 0.5e0))) AS cr
  FROM src
), rec AS (
  SELECT doc_id, w, h, band_rows,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (y - 128)) / ql + 0.5e0 + 1e-7) * ql / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS yq,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (cb - 128)) / qc + 0.5e0 + 1e-7) * qc / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS cbq,
    LEAST(255, GREATEST(0, floor(
      floor((8.0e0 * (cr - 128)) / qc + 0.5e0 + 1e-7) * qc / 8.0e0
      + 128 + 0.5e0 + 1e-7))) AS crq
  FROM ycc, qt
), rgb AS (
  SELECT doc_id, w, h, band_rows,
    LEAST(255, GREATEST(0,
      floor(yq + 1.402e0 * (crq - 128) + 0.5e0))) AS r2,
    LEAST(255, GREATEST(0,
      floor(yq - 0.344136e0 * (cbq - 128) - 0.714136e0 * (crq - 128)
            + 0.5e0))) AS g2,
    LEAST(255, GREATEST(0,
      floor(yq + 1.772e0 * (cbq - 128) + 0.5e0))) AS b2
  FROM rec
), agg AS (
  SELECT doc_id, w, h,
         SUM(r2 * band_rows) * w AS sr,
         SUM(g2 * band_rows) * w AS sg,
         SUM(b2 * band_rows) * w AS sb
  FROM rgb GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(3 AS INT) AS n_channels,
       CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order,
       floor(CAST(sr AS DOUBLE) / (w * h) * 1000000 + 0.5e0)
           / 1000000 AS mean_c0,
       floor(CAST(sg AS DOUBLE) / (w * h) * 1000000 + 0.5e0)
           / 1000000 AS mean_c1,
       floor(CAST(sb AS DOUBLE) / (w * h) * 1000000 + 0.5e0)
           / 1000000 AS mean_c2
FROM agg
"""
