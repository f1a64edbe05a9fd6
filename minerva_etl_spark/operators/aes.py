"""Pure-stdlib AES-128/192/256 + CBC — the cipher behind the PDF
standard security handler's AESV2 (/V 4) and AESV3 (/V 5) crypt
filters (round 11).

FIPS-197 exactly: the S-box is computed from the GF(2^8) inverse +
affine map (less error-prone than transcribing 256 literals and
self-checking: ``SBOX[0x53] == 0xED``), key expansion per §5.2,
MixColumns via xtime.  Known-answer tests in `tests/test_pdf.py`
pin the FIPS-197 Appendix C vectors for both key sizes.

Performance posture: pure Python runs ~100 KB/s-class — fine for the
KB-scale page streams this decrypts inside Arrow tasks (the same
budget the RC4 loop already spends); swap in `cryptography` via the
same decoder-injection seam as the media codecs if a cluster needs
bulk AES throughput.
"""

from __future__ import annotations

from functools import lru_cache

__all__ = [
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "aes_ecb_encrypt_block",
    "aes_ecb_decrypt_block",
]

# Fast path: the `cryptography` package (OpenSSL-backed) when the
# environment has it — the 2.B KDF alone runs ~20k block operations
# per password check, which pure Python serves in seconds and OpenSSL
# in microseconds.  The pure-Python implementation below stays as the
# zero-dependency fallback, and the test suite cross-validates the
# two on every vector, so a swap can never change bytes.
try:  # pragma: no cover - environment-dependent
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _Cipher,
        algorithms as _algorithms,
        modes as _modes,
    )

    _HAVE_OPENSSL = True
except ImportError:  # pragma: no cover
    _HAVE_OPENSSL = False


def _build_sbox() -> tuple[bytes, bytes]:
    # GF(2^8) inverses via exp/log tables over generator 3
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for c in range(256):
        inv = 0 if c == 0 else exp[255 - log[c]]
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[c] = s ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
assert _SBOX[0x53] == 0xED and _SBOX[0] == 0x63  # FIPS-197 sanity


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


@lru_cache(maxsize=256)
def _expand_key(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24, or 32 bytes")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:  # RotWord + SubWord + Rcon
            t = bytes(
                [_SBOX[t[1]] ^ rcon, _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]]]
            )
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [
        b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)
    ]


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    if _HAVE_OPENSSL:
        enc = _Cipher(_algorithms.AES(key), _modes.ECB()).encryptor()
        return enc.update(block) + enc.finalize()
    return _py_encrypt_block(key, block)


def aes_ecb_decrypt_block(key: bytes, block: bytes) -> bytes:
    if _HAVE_OPENSSL:
        dec = _Cipher(_algorithms.AES(key), _modes.ECB()).decryptor()
        return dec.update(block) + dec.finalize()
    return _py_decrypt_block(key, block)


def _py_encrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, nr + 1):
        s = bytearray(_SBOX[b] for b in s)  # SubBytes
        # ShiftRows (state is column-major: byte r + 4c)
        s = bytearray(
            s[(i + 4 * (i % 4)) % 16] for i in range(16)
        )
        if rnd < nr:  # MixColumns
            m = bytearray(16)
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                m[4 * c + 0] = (
                    _mul(col[0], 2) ^ _mul(col[1], 3) ^ col[2] ^ col[3]
                )
                m[4 * c + 1] = (
                    col[0] ^ _mul(col[1], 2) ^ _mul(col[2], 3) ^ col[3]
                )
                m[4 * c + 2] = (
                    col[0] ^ col[1] ^ _mul(col[2], 2) ^ _mul(col[3], 3)
                )
                m[4 * c + 3] = (
                    _mul(col[0], 3) ^ col[1] ^ col[2] ^ _mul(col[3], 2)
                )
            s = m
        s = bytearray(a ^ b for a, b in zip(s, rk[rnd]))  # AddRoundKey
    return bytes(s)


def _py_decrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[nr]))
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows
        s = bytearray(
            s[(i - 4 * (i % 4)) % 16] for i in range(16)
        )
        s = bytearray(_INV_SBOX[b] for b in s)  # InvSubBytes
        s = bytearray(a ^ b for a, b in zip(s, rk[rnd]))  # AddRoundKey
        if rnd > 0:  # InvMixColumns
            m = bytearray(16)
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                m[4 * c + 0] = (
                    _mul(col[0], 14) ^ _mul(col[1], 11)
                    ^ _mul(col[2], 13) ^ _mul(col[3], 9)
                )
                m[4 * c + 1] = (
                    _mul(col[0], 9) ^ _mul(col[1], 14)
                    ^ _mul(col[2], 11) ^ _mul(col[3], 13)
                )
                m[4 * c + 2] = (
                    _mul(col[0], 13) ^ _mul(col[1], 9)
                    ^ _mul(col[2], 14) ^ _mul(col[3], 11)
                )
                m[4 * c + 3] = (
                    _mul(col[0], 11) ^ _mul(col[1], 13)
                    ^ _mul(col[2], 9) ^ _mul(col[3], 14)
                )
            s = m
    return bytes(s)


def aes_cbc_encrypt(
    key: bytes, iv: bytes, data: bytes, pad: bool = True
) -> bytes:
    """CBC encrypt; ``pad=True`` applies PKCS#7 (the PDF stream
    layout); ``pad=False`` requires block-aligned input (the AESV3
    key-wrap calls)."""
    if pad:
        n = 16 - (len(data) % 16)
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded CBC input must be block-aligned")
    if _HAVE_OPENSSL:
        enc = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _py_encrypt_block(key, block)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(
    key: bytes, iv: bytes, data: bytes, unpad: bool = True
) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC ciphertext must be block-aligned")
    if _HAVE_OPENSSL:
        dec = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).decryptor()
        out = bytearray(dec.update(data) + dec.finalize())
    else:
        out = bytearray()
        prev = iv
        for i in range(0, len(data), 16):
            block = data[i : i + 16]
            out += bytes(
                a ^ b
                for a, b in zip(_py_decrypt_block(key, block), prev)
            )
            prev = block
    if unpad:
        if not out:
            raise ValueError("empty CBC plaintext")
        n = out[-1]
        if not 1 <= n <= 16 or out[-n:] != bytes([n]) * n:
            raise ValueError("bad PKCS#7 padding")
        del out[-n:]
    return bytes(out)
