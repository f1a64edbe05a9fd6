"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pipeline treats media as ``binary`` payload columns with a metadata
struct (mime type, dimensions, duration); decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` operators so
payload bytes never round-trip through the driver and each task touches
only its partition's batches — the correct 100 TB shape.

Codec status: **audio is REAL** — :func:`wav_decode` parses RIFF/WAVE
payloads with the stdlib ``wave`` module (no external libs needed) and
:func:`wav_features` runs it Arrow-batched; fixtures come from
:func:`synthesize_wav`.  Image/video decode remains STUBBED (no
PIL/ffmpeg in this image): the generic ``decoder`` argument defaults
to :func:`deterministic_fake_decode`, clearly marked; swap in a real
decoder with the same signature on a cluster with the libs installed.
Everything around the codecs — schemas, batch iteration, partitioning,
output contracts — is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, mime string, width int, height int"
)

# feature as double: the extractor computes float64; declaring float32
# here would silently truncate and break exact oracle comparison (cast
# down at the sink if a float32 embedding column is the target)
FEATURE_SCHEMA = "media_id bigint, feature array<double>, n_bytes bigint"


def real_decode_stub(payload: bytes) -> "object":
    """Placeholder for a real image/audio decoder (PIL.Image.open /
    soundfile.read).  Not available in this environment."""
    raise NotImplementedError(
        "media codecs are not installed in this image; pass a decoder "
        "to extract_features(..., decoder=...) on a real cluster"
    )


def deterministic_fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in 'decode': 8 byte-histogram buckets,
    normalized.  Keeps the operator testable end-to-end."""
    if not payload:
        return [0.0] * 8
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    n = float(len(payload))
    return [c / n for c in buckets]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = deterministic_fake_decode,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-row feature extraction via mapInPandas (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].apply(
                lambda p: decoder(bytes(p)) if p is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "feature": feats,
                    "n_bytes": pdf[payload_col].apply(
                        lambda p: len(p) if p is not None else 0
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """A real RIFF/WAVE file (16-bit PCM mono) from integer samples —
    pure stdlib (``struct``), used to build deterministic audio
    fixtures inside this sandbox.  Output opens in any WAV reader."""
    import struct

    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def wav_decode(payload: bytes) -> dict:
    """REAL audio decode, pure stdlib: parse a RIFF/WAVE payload with
    the ``wave`` module and compute (sample_rate, n_frames,
    duration_ms, rms) from the PCM frames.  16-bit mono is what the
    pipeline's fixtures emit; multi-channel files fold all channels
    into the RMS (frames are raw interleaved samples).

    The RMS keeps the sum of squares in exact integer arithmetic and
    rounds only the final double — the property that lets an oracle
    recompute it bit-identically from the generating formula.
    """
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n_frames = w.getnframes()
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n_frames)
    if width != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got {width * 8}-bit")
    vals = struct.unpack(f"<{len(raw) // 2}h", raw)
    n = len(vals)
    sumsq = sum(v * v for v in vals)  # exact: int arithmetic
    # half-up 6-dp grid, NOT round(): Python round() is banker's
    # rounding — a third rule no SQL engine uses (same pin as the
    # logreg weight grid); duration floors so integer division agrees
    # everywhere (Python round() vs SQL round() disagree at .5 ties)
    import math

    rms = math.floor((sumsq / n) ** 0.5 * 1e6 + 0.5) / 1e6 if n else 0.0
    return {
        "sample_rate": rate,
        "n_frames": n_frames * n_channels,
        "duration_ms": (n_frames * 1000) // rate if rate else 0,
        "rms": rms,
    }


WAV_FEATURE_SCHEMA = (
    "media_id bigint, sample_rate int, n_frames bigint, "
    "duration_ms bigint, rms double"
)


def wav_features(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-row REAL WAV decode via mapInPandas (Arrow batches) — the
    non-stub audio path: payload bytes parse through the stdlib
    ``wave`` reader inside each task; nothing visits the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                d = wav_decode(bytes(p))
                rows.append(
                    (
                        mid,
                        d["sample_rate"],
                        d["n_frames"],
                        d["duration_ms"],
                        d["rms"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_frames",
                    "duration_ms",
                    "rms",
                ],
            )

    return media.mapInPandas(run, schema=WAV_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling shape: split a payload into up to ``max_frames``
    fixed-stride chunks, one output row per chunk (the video
    frame-sample contract; chunking stands in for codec frame
    extraction).  Built-ins only — no Python in the hot path."""
    # coalesce: least() skips nulls, so a null length would yield
    # max_frames instead of zero
    n_frames = F.least(
        F.ceil(
            F.coalesce(F.length(payload_col), F.lit(0)) / F.lit(every_n_bytes)
        ).cast("int"),
        F.lit(max_frames),
    )
    return (
        media.withColumn("__n", n_frames)
        .filter(F.col("__n") > 0)  # sequence(0,-1) would count backwards
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .select(
            F.col(id_col),
            "frame_idx",
            F.substring(
                F.col(payload_col),
                F.col("frame_idx") * every_n_bytes + 1,
                every_n_bytes,
            ).alias("frame_bytes"),
        )
    )
