"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pipeline treats media as ``binary`` payload columns with a metadata
struct (mime type, dimensions, duration); decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` operators so
payload bytes never round-trip through the driver and each task touches
only its partition's batches — the correct 100 TB shape.

The actual codec calls are STUBBED (no PIL/ffmpeg in this image): the
``decoder`` argument defaults to :func:`deterministic_fake_decode`,
clearly marked; swap in a real decoder function with the same signature
on a cluster with the libs installed.  Everything around the stub —
schemas, batch iteration, partitioning, output contracts — is real and
tested.
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
