"""A REAL ffmpeg-backed decoder for the `--decoder` injection seam.

The engine's pure-stdlib codecs stop at intra-frame formats (PNG, GIF,
baseline JPEG, BI_RGB/MJPG AVI) — inter-frame video (H.264, VP9, AV1)
and compressed audio (AAC, Opus) need an external decoder, and the
documented seam for that is ``extract_features(df, decoder=...)`` /
``minerva-spark media features --decoder pkg.mod:fn``
(minerva_etl_spark/operators/multimodal.py, cli.py `cmd_media`).

This module is the end-to-end recipe for clusters that DO have ffmpeg
on the executor image:

    spark-submit --py-files examples/ffmpeg_decoder.py ... \
        minerva-spark media features \
            --input  s3://bucket/videos.parquet \
            --output s3://bucket/video_features.parquet \
            --decoder ffmpeg_decoder:decode

The callable contract is the one ``extract_features`` declares:
``bytes -> list[float]`` — it runs Arrow-batched inside each task via
``mapInPandas``, so one ffmpeg subprocess per payload, fully parallel
across executor cores, no driver involvement.  The feature layout here
(3 channel means + 8-bucket luma histogram + frame count, 12 floats)
mirrors ``avi_features``' channel-mean semantics; swap in your own
tail (CLIP embedding, keyframe hashes, ...) behind the same signature.

Payloads are staged to a task-local temp file rather than piped on
stdin: MP4/MOV containers routinely place the moov atom at the end,
which an unseekable pipe cannot serve, while a temp file decodes every
container ffmpeg knows.  The file lives in the executor's scratch dir
and is removed before the function returns.

No ffmpeg here (this image ships none) -> a clear RuntimeError naming
the dependency, raised at decode time so the module stays importable
for `--decoder` argument validation and for the skip-if-absent tests
in tests/test_ffmpeg_example.py.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

#: sampled-frame budget per payload: bounds ffmpeg CPU per row so one
#: hour-long video cannot stall its task; raise for recall-sensitive
#: feature tails.
MAX_FRAMES = 8

#: thumbnail edge for the sampled frames — 16x16 RGB keeps the raw
#: pixel transfer per payload at MAX_FRAMES*768 bytes regardless of
#: source resolution.
THUMB = 16

N_LUMA_BUCKETS = 8


def _require(binary: str) -> str:
    path = shutil.which(binary)
    if path is None:
        raise RuntimeError(
            f"ffmpeg_decoder: '{binary}' not found on PATH — install "
            "ffmpeg on the executor image (e.g. apt-get install "
            "ffmpeg) or bake it into the container to use this "
            "decoder; the engine's built-in codecs (PNG/GIF/baseline "
            "JPEG/PCM WAV/DIB+MJPG AVI) need no external binary"
        )
    return path


def decode(payload: bytes) -> list[float]:
    """Decode ANY ffmpeg-supported media payload into a fixed 12-float
    feature vector: ``[mean_r, mean_g, mean_b, luma_hist[0..7],
    n_frames_sampled]``, channels in 0..1.

    Samples up to :data:`MAX_FRAMES` frames scaled to
    :data:`THUMB`x:data:`THUMB` RGB; deterministic for a given payload
    and ffmpeg build.  Raises RuntimeError when ffmpeg is absent and
    ValueError when ffmpeg cannot decode the payload (route through
    ``on_error``-style filtering upstream if the column is dirty).
    """
    ffmpeg = _require("ffmpeg")
    fd, path = tempfile.mkstemp(suffix=".bin")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        proc = subprocess.run(
            [
                ffmpeg, "-v", "error", "-nostdin",
                "-i", path,
                "-frames:v", str(MAX_FRAMES),
                "-vf", f"scale={THUMB}:{THUMB}",
                "-f", "rawvideo", "-pix_fmt", "rgb24",
                "pipe:1",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            check=False,
        )
    finally:
        os.unlink(path)
    frame_bytes = THUMB * THUMB * 3
    raw = proc.stdout
    if proc.returncode != 0 or len(raw) < frame_bytes:
        raise ValueError(
            "ffmpeg could not decode payload: "
            + proc.stderr.decode(errors="replace")[:400]
        )
    n_frames = len(raw) // frame_bytes
    raw = raw[: n_frames * frame_bytes]

    sums = [0, 0, 0]
    hist = [0] * N_LUMA_BUCKETS
    for i in range(0, len(raw), 3):
        r, g, b = raw[i], raw[i + 1], raw[i + 2]
        sums[0] += r
        sums[1] += g
        sums[2] += b
        # BT.601 integer luma, bucketed into 8 bands of 32
        luma = (77 * r + 150 * g + 29 * b) >> 8
        hist[min(luma >> 5, N_LUMA_BUCKETS - 1)] += 1
    n_px = len(raw) // 3
    return (
        [s / n_px / 255.0 for s in sums]
        + [h / n_px for h in hist]
        + [float(n_frames)]
    )
