"""IMA-ADPCM codec (`operators/adpcm.py`): decoder state machine,
encoder round trip, WAV container wiring, stereo interleave, honest
rejects."""

import struct

import pytest

from minerva_etl_spark.operators.adpcm import (
    STEP_TABLE,
    ima_decode_nibbles,
    ima_encode,
    synthesize_wav_ima,
)


def test_tables_and_basic_steps():
    assert len(STEP_TABLE) == 89 and STEP_TABLE[0] == 7
    assert STEP_TABLE[88] == 32767
    # nibble 0 from rest: tiny +diff (step>>3), index walks down
    vals = ima_decode_nibbles([0, 0], 100, 8)
    assert vals[0] == 100
    assert vals[1] == 100 + (STEP_TABLE[8] >> 3)
    # sign bit subtracts
    down = ima_decode_nibbles([8 | 4], 1000, 10)
    assert down[1] < 1000
    # clamping at both rails
    hi = ima_decode_nibbles([7] * 40, 32000, 88)
    assert max(hi) == 32767
    lo = ima_decode_nibbles([15] * 40, -32000, 88)
    assert min(lo) == -32768
    with pytest.raises(ValueError, match="step index"):
        ima_decode_nibbles([0], 0, 89)


def test_encode_decode_roundtrip_tracks_signal():
    import math

    sig = [int(8000 * math.sin(i / 5)) for i in range(200)]
    nibs, pred, idx = ima_encode(sig, step_index=20)
    dec = ima_decode_nibbles(nibs, pred, idx)
    assert len(dec) == len(sig)
    # ADPCM is lossy but must track within the local step size
    err = max(abs(a - b) for a, b in zip(sig[20:], dec[20:]))
    assert err < 1500
    # constant signals are exact (predictor carries sample 0)
    nibs2, p2, i2 = ima_encode([123] * 50)
    assert ima_decode_nibbles(nibs2, p2, i2) == [123] * 50


def test_wav_container_roundtrip_and_features(spark):
    from minerva_etl_spark.operators.multimodal import (
        wav_decode,
        wav_features,
        wav_samples,
    )

    nibs = [(7 * k) % 16 for k in range(48)]
    payload = synthesize_wav_ima(nibs, predictor=-500, step_index=30,
                                 sample_rate=8000)
    assert payload[:4] == b"RIFF"
    vals, rate, ch = wav_samples(payload)
    assert rate == 8000 and ch == 1
    assert list(vals) == ima_decode_nibbles(nibs, -500, 30)
    d = wav_decode(payload)
    assert d["n_frames"] == 49
    df = spark.createDataFrame(
        [(1, payload)], "media_id bigint, payload binary"
    )
    row = wav_features(df).collect()[0]
    assert row.n_frames == 49 and row.sample_rate == 8000
    exp = sum(v * v for v in vals)
    import math

    assert row.rms == math.floor(
        (exp / 49) ** 0.5 * 1e6 + 0.5
    ) / 1e6


def test_stereo_interleave():
    from minerva_etl_spark.operators.adpcm import decode_ima_wav

    # hand-build one stereo block: L header, R header, L 4-byte
    # group, R 4-byte group (8 nibbles each)
    block = (
        struct.pack("<hBB", 100, 5, 0)
        + struct.pack("<hBB", -200, 12, 0)
        + bytes([0x00] * 4)  # L: eight 0-nibbles
        + bytes([0x88] * 4)  # R: eight 8-nibbles (sign -> down)
    )
    vals = decode_ima_wav(block, 2, len(block))
    # frame 0 = the two predictors
    assert vals[0] == 100 and vals[1] == -200
    left = vals[2::2]
    right = vals[3::2]
    assert len(left) == len(right) == 8
    assert all(a <= b for a, b in zip(right, [-200] + list(right)))
    assert left[0] == 100 + (STEP_TABLE[5] >> 3)
    with pytest.raises(ValueError, match="channels"):
        decode_ima_wav(block, 3, len(block))
    with pytest.raises(ValueError, match="step index"):
        decode_ima_wav(
            struct.pack("<hBB", 0, 99, 0) + b"\x00\x00", 1, 6
        )


def test_wav_spectral_flows_through_adpcm(spark):
    """wav_spectral rides the same decode front end, so ADPCM
    payloads get spectral features with no API change."""
    from minerva_etl_spark.operators.multimodal import wav_spectral

    nibs = [(5 * k) % 16 for k in range(64)]
    payload = synthesize_wav_ima(nibs, predictor=0, step_index=40,
                                 sample_rate=8000)
    df = spark.createDataFrame(
        [(1, payload)], "media_id bigint, payload binary"
    )
    row = wav_spectral(df).collect()[0]
    assert row.n_samples == 65
    assert row.dominant_bin is not None
