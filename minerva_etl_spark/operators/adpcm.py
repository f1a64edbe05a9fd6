"""IMA ADPCM (DVI4) WAV codec — the compressed-audio leg of the
media arc (round 14).

IMA ADPCM (WAVE format tag 0x0011; public IMA "Recommended Practices
for Enhancing Digital Audio Compatibility" spec, also RFC 3551 §4.5.1
DVI4): 4-bit differential samples against an 89-entry step-size
table, packed two nibbles per byte (low nibble first) in blocks that
each start with a 4-byte per-channel state header (int16 predictor =
sample 0, uint8 step index, reserved).  The decoder is pure integer
state-machine arithmetic — which means a DuckDB oracle can replay it
EXACTLY with ``list_reduce`` over the nibble stream, the strongest
oracle a stateful codec can have.

Decode is wired into `multimodal._wav_parse_manual` (format 0x11), so
`wav_decode` / `wav_features` / `wav_spectral` handle ADPCM payloads
with no API change.  Mono and stereo (standard 4-byte-per-channel
interleave) are supported; other layouts reject honestly.

The writers: :func:`synthesize_wav_ima` packs a caller-provided
NIBBLE stream (the oracle-replayable fixture shape), and
:func:`ima_encode` is a real encoder (mirror-image state machine) for
round-trip tests.
"""

from __future__ import annotations

import struct

__all__ = [
    "STEP_TABLE",
    "INDEX_TABLE",
    "ima_decode_nibbles",
    "ima_encode",
    "decode_ima_wav",
    "synthesize_wav_ima",
]

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]

INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _step_nibble(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """One decoder step: (new_pred, new_idx)."""
    step = STEP_TABLE[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = _clamp16(pred - diff if nibble & 8 else pred + diff)
    idx = idx + INDEX_TABLE[nibble]
    idx = 0 if idx < 0 else (88 if idx > 88 else idx)
    return pred, idx


def ima_decode_nibbles(
    nibbles: list[int], predictor: int, step_index: int
) -> list[int]:
    """Decode a nibble stream given the block-header state.  Returns
    the sample list INCLUDING the header predictor as sample 0 (the
    WAV block convention)."""
    pred, idx = _clamp16(predictor), step_index
    if not 0 <= idx <= 88:
        raise ValueError(f"step index {idx} out of range 0..88")
    out = [pred]
    for n in nibbles:
        pred, idx = _step_nibble(n & 0xF, pred, idx)
        out.append(pred)
    return out


def ima_encode(
    samples: list[int], step_index: int = 0
) -> tuple[list[int], int, int]:
    """Real IMA encoder: ``samples[0]`` becomes the header predictor;
    the rest quantize to nibbles through the mirror-image state
    machine.  Returns ``(nibbles, predictor, step_index)``."""
    if not samples:
        raise ValueError("cannot encode an empty sample list")
    pred = _clamp16(int(samples[0]))
    idx = step_index
    nibbles: list[int] = []
    for s in samples[1:]:
        step = STEP_TABLE[idx]
        diff = int(s) - pred
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        nibbles.append(nib)
        pred, idx = _step_nibble(nib, pred, idx)
    return nibbles, _clamp16(int(samples[0])), step_index


def synthesize_wav_ima(
    nibbles: list[int],
    predictor: int,
    step_index: int,
    sample_rate: int = 8000,
) -> bytes:
    """A real single-block mono IMA-ADPCM WAV from a nibble stream +
    header state.  Nibble count must be even (two per byte, low
    nibble first).  Deterministic bytes."""
    if len(nibbles) % 2:
        raise ValueError("nibble count must be even (2 per byte)")
    body = bytearray()
    body += struct.pack(
        "<hBB", _clamp16(predictor), step_index, 0
    )
    for i in range(0, len(nibbles), 2):
        body.append((nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4))
    block_align = len(body)
    samples_per_block = len(nibbles) + 1
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, sample_rate,
        (sample_rate * block_align) // max(1, samples_per_block),
        block_align, 4, 2, samples_per_block,
    )
    data = bytes(body)
    out = b"RIFF"
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return out + struct.pack("<I", len(payload)) + payload


def decode_ima_wav(
    raw: bytes, n_channels: int, block_align: int
) -> tuple:
    """Decode the ``data`` chunk of an IMA-ADPCM WAVE: per block, a
    4-byte state header per channel, then nibble data — mono packed
    sequentially, stereo interleaved in 4-byte groups per channel.
    Returns interleaved 16-bit samples (header predictors included as
    each block's first frame)."""
    if n_channels not in (1, 2):
        raise ValueError(
            f"IMA ADPCM: {n_channels} channels unsupported (1 or 2)"
        )
    if block_align < 4 * n_channels:
        raise ValueError("IMA ADPCM block smaller than its headers")
    out: list[int] = []
    for b0 in range(0, len(raw), block_align):
        block = raw[b0 : b0 + block_align]
        if len(block) < 4 * n_channels:
            raise ValueError("truncated IMA ADPCM block")
        preds = []
        idxs = []
        for c in range(n_channels):
            p, i, _r = struct.unpack_from("<hBB", block, c * 4)
            if i > 88:
                raise ValueError(f"step index {i} out of range")
            preds.append(p)
            idxs.append(i)
        out.extend(preds)  # frame 0 of the block
        data = block[4 * n_channels :]
        if n_channels == 1:
            for byte in data:
                for nib in (byte & 0xF, byte >> 4):
                    preds[0], idxs[0] = _step_nibble(
                        nib, preds[0], idxs[0]
                    )
                    out.append(preds[0])
        else:
            # stereo: alternating 4-byte groups L,R,L,R...; each
            # group carries 8 nibbles of its channel; frames then
            # interleave L/R
            frames_l: list[int] = []
            frames_r: list[int] = []
            sink = [frames_l, frames_r]
            for g0 in range(0, len(data) - (len(data) % 8), 4):
                ch = (g0 // 4) % 2
                for byte in data[g0 : g0 + 4]:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[ch], idxs[ch] = _step_nibble(
                            nib, preds[ch], idxs[ch]
                        )
                        sink[ch].append(preds[ch])
            for lv, rv in zip(frames_l, frames_r):
                out.extend((lv, rv))
    return tuple(out)
