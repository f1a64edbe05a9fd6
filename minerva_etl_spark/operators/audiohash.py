"""Perceptual audio fingerprint — frame-energy dHash over REAL WAV
decode.

The audio twin of `operators/imagehash.py`: re-encoded or
level-shifted audio survives byte-level dedup, but the SHAPE of its
energy envelope doesn't change.  Decode the clip (PCM-8/16 and both
G.711 laws via `multimodal.wav_samples`), fold channels to a mono sum
(integer-exact), split into 65 equal frames, and emit one bit per
adjacent frame pair (``energy[f] > energy[f+1]``) — 64 bits of
envelope shape, invariant to container/codec churn and robust to
small offsets.

The bits land in the SAME 4x16-bit band layout as the image dHash, so
`imagehash.dhash_pairs` is the pair join — one shared pigeonhole
machine for every 64-bit perceptual hash in the engine (perfect
recall at hamming radius 3, exact ``bit_count`` verify, never
all-pairs).

Everything is integer arithmetic (energies are exact sums of
squares), so an oracle can recompute every bit from a closed-form
sample formula.  Scale: decode is Arrow-batched ``mapInPandas``
(zero shuffle); clips shorter than 66 samples are rejected (no 65
frames to compare).

Reference: extension (the reference engine treats media as opaque
blobs); SURVEY §2 "beyond the reference" charter.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

FRAMES = 65  # 64 adjacent comparisons = 64 bits
_BANDS, _BAND_BITS = 4, 16

AUDIO_HASH_SCHEMA = (
    "media_id bigint, n_samples bigint, sample_rate int, "
    "d0 int, d1 int, d2 int, d3 int"
)


def energy_bands(samples, n_channels: int = 1) -> list[int]:
    """The 4x16-bit frame-energy dHash bands of an integer sample
    stream.  Interleaved multi-channel input folds to a mono SUM
    (exact; an average would need a rounding convention).  Frame f
    covers mono indices ``[f*n//65, (f+1)*n//65)``."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if n_channels > 1:
        arr = arr[: (len(arr) // n_channels) * n_channels]
        mono = arr.reshape(-1, n_channels).sum(axis=1)
    else:
        mono = arr
    n = len(mono)
    if n < FRAMES + 1:
        raise ValueError(
            f"clip has {n} mono samples; need >= {FRAMES + 1} for "
            f"{FRAMES} frames"
        )
    bounds = np.arange(FRAMES, dtype=np.int64) * n // FRAMES
    # int64 sums of int64 squares: exact (samples are <= 21 bits after
    # any realistic channel fold, so squares stay far from overflow)
    energies = np.add.reduceat(mono * mono, bounds)
    gt = energies[:-1] > energies[1:]
    bands = [0] * _BANDS
    for f in np.nonzero(gt)[0]:
        bands[int(f) // _BAND_BITS] |= 1 << (int(f) % _BAND_BITS)
    return bands


def audio_fingerprint(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "fail",
) -> DataFrame:
    """Per-row REAL WAV decode then the frame-energy hash,
    Arrow-batched.  ``on_error='skip'`` drops undecodable or
    too-short payloads (the dirty-corpus contract).  Output feeds
    `imagehash.dhash_pairs` directly."""
    from minerva_etl_spark.operators.multimodal import (
        _decode_or_policy,
        wav_samples,
    )

    def one(payload: bytes) -> tuple:
        samples, rate, n_channels = wav_samples(payload)
        bands = energy_bands(samples, n_channels)
        return len(samples), rate, bands

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                d = _decode_or_policy(one, int(mid), bytes(payload), on_error)
                if d is None:
                    continue
                n_samples, rate, bands = d
                rows.append((int(mid), n_samples, rate, *bands))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "sample_rate",
                    "d0", "d1", "d2", "d3",
                ],
            )

    cols = media.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    )
    return cols.mapInPandas(run, schema=AUDIO_HASH_SCHEMA)


def ingest_audio_increment(
    spark,
    media: DataFrame,
    state_path: str,
    payload_col: str = "payload",
    id_col: str = "media_id",
    radius: int = 3,
    on_error: str = "fail",
) -> DataFrame:
    """One audio-delivery cycle through the shared persisted-hash
    protocol (`imagehash.ingest_hash_increment`): fingerprint the
    delta (REAL WAV decode), decide it against the state, append —
    history clips are never re-decoded.  Keep audio and image states
    in SEPARATE paths: the band layout is identical, so a shared
    state would happily cross-match an image against a clip."""
    from minerva_etl_spark.operators.imagehash import (
        ingest_hash_increment,
    )

    return ingest_hash_increment(
        spark,
        audio_fingerprint(
            media, payload_col=payload_col, id_col=id_col,
            on_error=on_error,
        ),
        state_path,
        radius,
    )
