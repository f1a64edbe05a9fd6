"""End-to-end wiring for the examples/ffmpeg_decoder.py recipe.

Two tiers, matching the environment split the recipe documents:
- always-run: the module imports, its contract surfaces a clear
  dependency error when ffmpeg is absent, and the CLI `--decoder`
  argument resolves it (import-time, no ffmpeg needed);
- skipped-if-absent: on a machine WITH ffmpeg, synthesize a real
  inter-frame video with ffmpeg itself and push it through
  `minerva-spark media features --decoder ffmpeg_decoder:decode`
  — the exact command a real-cluster user runs (VERDICT r9 ask 6).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"

HAS_FFMPEG = shutil.which("ffmpeg") is not None


@pytest.fixture()
def ffmpeg_decoder(monkeypatch):
    monkeypatch.syspath_prepend(str(EXAMPLES))
    import ffmpeg_decoder as mod

    return mod


def test_decoder_importable_and_errors_clearly_without_ffmpeg(
    ffmpeg_decoder, monkeypatch
):
    """The module must import on any machine (the CLI validates
    `--decoder pkg.mod:fn` by importing it), and a decode attempt
    without ffmpeg must name the missing dependency, not crash
    obscurely mid-subprocess."""
    monkeypatch.setattr(shutil, "which", lambda _: None)
    with pytest.raises(RuntimeError, match="ffmpeg.*not found"):
        ffmpeg_decoder.decode(b"\x00" * 16)


@pytest.mark.skipif(not HAS_FFMPEG, reason="ffmpeg not installed")
def test_decode_real_video(ffmpeg_decoder, tmp_path):
    """A solid-red synthesized video decodes to a red-dominant feature
    vector of the documented 12-float layout."""
    src = tmp_path / "red.mp4"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi",
         "-i", "color=c=red:size=32x32:rate=4", "-t", "1",
         "-pix_fmt", "yuv420p", str(src)],
        check=True,
    )
    feat = ffmpeg_decoder.decode(src.read_bytes())
    assert len(feat) == 12
    mean_r, mean_g, mean_b = feat[:3]
    assert mean_r > 0.7 and mean_g < 0.3 and mean_b < 0.3
    assert feat[-1] == 4.0  # 1s @ 4fps, under MAX_FRAMES
    assert abs(sum(feat[3:11]) - 1.0) < 1e-9  # luma hist normalized

    with pytest.raises(ValueError, match="could not decode"):
        ffmpeg_decoder.decode(b"not a video at all")


@pytest.mark.skipif(not HAS_FFMPEG, reason="ffmpeg not installed")
def test_cli_media_features_with_ffmpeg_decoder(
    ffmpeg_decoder, tmp_path, spark, monkeypatch
):
    """The full recipe: parquet of video payloads -> `media features
    --decoder ffmpeg_decoder:decode` -> feature parquet."""
    from minerva_etl_spark.cli import main

    src_mp4 = tmp_path / "green.mp4"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi",
         "-i", "color=c=lime:size=32x32:rate=4", "-t", "1",
         "-pix_fmt", "yuv420p", str(src_mp4)],
        check=True,
    )
    # ship the example module the way a real cluster would (--py-files)
    spark.sparkContext.addPyFile(str(EXAMPLES / "ffmpeg_decoder.py"))
    media = spark.createDataFrame(
        [(1, src_mp4.read_bytes())], "media_id bigint, payload binary"
    )
    src = str(tmp_path / "media")
    media.write.parquet(src)
    out = str(tmp_path / "feat")
    main(["media", "features", "--input", src, "--output", out,
          "--decoder", "ffmpeg_decoder:decode"])
    r = spark.read.parquet(out).collect()[0]
    assert len(r.feature) == 12 and r.feature[1] > 0.5  # green-dominant
    assert r.n_bytes == len(src_mp4.read_bytes())
