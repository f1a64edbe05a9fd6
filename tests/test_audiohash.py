"""Perceptual audio fingerprint: frame-energy dHash bands over real
WAV decode, paired through the shared pigeonhole join."""

from __future__ import annotations

import pytest

from minerva_etl_spark.operators.audiohash import (
    FRAMES,
    audio_fingerprint,
    energy_bands,
)
from minerva_etl_spark.operators.imagehash import dhash_pairs
from minerva_etl_spark.operators.multimodal import synthesize_wav


def test_energy_bands_envelope_shapes():
    """Constant amplitude -> every adjacent energy equal -> all bits
    0; strictly decaying amplitude -> every comparison true."""
    n = FRAMES * 4
    flat = [100] * n
    assert energy_bands(flat) == [0, 0, 0, 0]
    decay = [1000 - 15 * (i * FRAMES // n) for i in range(n)]
    assert energy_bands(decay) == [0xFFFF] * 4

    # frame partition: with n divisible by FRAMES each frame is equal
    # width, so one loud sample in frame 0 sets exactly bit 0
    spike = [0] * n
    spike[0] = 500
    assert energy_bands(spike) == [1, 0, 0, 0]


def test_energy_bands_stereo_fold_and_short():
    """Stereo folds to an exact mono sum; too-short clips reject."""
    n = (FRAMES + 1) * 2
    left = [7 * (i % 13) for i in range(n)]
    right = [3 * (i % 11) for i in range(n)]
    inter = [v for pair in zip(left, right) for v in pair]
    mono = [a + b for a, b in zip(left, right)]
    assert energy_bands(inter, n_channels=2) == energy_bands(mono)
    with pytest.raises(ValueError):
        energy_bands([1] * FRAMES)  # FRAMES samples = one short


def test_ingest_audio_increment(spark, tmp_path):
    """Two audio deliveries through the shared persisted-hash
    protocol: a DC-offset twin of a history clip dups to it."""
    from minerva_etl_spark.operators.audiohash import (
        ingest_audio_increment,
    )

    n = FRAMES * 64
    base = [((i * 7) % 97) - 48 + (150 if (i // 64) % 5 < 2 else 0)
            for i in range(n)]
    state = str(tmp_path / "wav_state")
    p1 = spark.createDataFrame(
        [(1, synthesize_wav(base, 8000))],
        "media_id bigint, payload binary",
    )
    d1 = ingest_audio_increment(spark, p1, state).collect()
    assert d1[0].keep

    p2 = spark.createDataFrame(
        [(2, synthesize_wav([v + 2 for v in base], 8000)),
         (3, synthesize_wav(base[::-1], 8000))],
        "media_id bigint, payload binary",
    )
    d2 = {r.media_id: r for r in
          ingest_audio_increment(spark, p2, state).collect()}
    assert d2[2].near_dup_of == 1 and not d2[2].keep
    assert d2[3].keep
    assert spark.read.parquet(state).count() == 3


def test_audio_fingerprint_and_pairs(spark):
    """Real PCM-16 decode feeds the hash; a small-DC-offset twin lands
    within radius 3 of the original; a reversed-envelope clip does
    not; on_error='skip' drops a corrupt payload."""
    n = FRAMES * 64
    base = [((i * 7) % 97) - 48 + (200 if (i // 64) % 9 < 4 else 0)
            for i in range(n)]
    shifted = [v + 2 for v in base]
    rows = [
        (1, synthesize_wav(base, 8000)),
        (2, synthesize_wav(shifted, 8000)),
        (3, synthesize_wav(base[::-1], 8000)),
        (9, b"RIFFgarbage"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    hashes = audio_fingerprint(df, on_error="skip")
    got = {r.media_id: r for r in hashes.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_samples == n and got[1].sample_rate == 8000
    pairs = dhash_pairs(
        hashes.select("media_id", "d0", "d1", "d2", "d3"), radius=3
    ).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
