"""AES block cipher (FIPS-197) + CBC mode, pure stdlib.

Built from the public specification (FIPS PUB 197, 2001) so the PDF
reader's standard-security-handler support (kgspark.sources) can extend
past RC4 to /AESV2 (AES-128-CBC, PDF 1.6+ V=4 R=4) and /AESV3
(AES-256-CBC, PDF 2.0 / ISO 32000-2 V=5 R=6) — the same files the
reference reads via PyPDF2 (ref knowledgeGraph.py:67-73). The S-box is
DERIVED at import time from the GF(2^8) inverse + affine transform the
spec defines (§5.1.1) rather than transcribed, so the implementation is
self-evidently spec-sourced; correctness is pinned to the FIPS-197
Appendix C known-answer vectors in tests/test_codecs.py.

Pure-Python throughput (~100 KB/s) is fine for the decode path it
serves: per-document streams inside an Arrow-batched pandas UDF, not a
bulk data plane. Nothing here is used for protection — decrypt-for-read
of files the caller already possesses, plus the encrypt direction the
hardened R=6 key-derivation hash (Algorithm 2.B) and the spec-built test
fixtures require.
"""

from __future__ import annotations


def _gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiply modulo the AES polynomial x^8+x^4+x^3+x+1."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse table via exp/log over generator 3
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    sbox = [0] * 256
    for v in range(256):
        inv = 0 if v == 0 else exp[(255 - log[v]) % 255]
        # affine transform (FIPS-197 §5.1.1)
        s = inv
        for shift in (1, 2, 3, 4):
            s ^= ((inv << shift) | (inv >> (8 - shift))) & 0xFF
        sbox[v] = s ^ 0x63
    inv_sbox = [0] * 256
    for v, s in enumerate(sbox):
        inv_sbox[s] = v
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_gf_mul(_RCON[-1], 2))


def _expand_key(key: bytes) -> list[list[int]]:
    """Key expansion (§5.2) -> list of round keys, each 16 ints."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    return [
        [b for word in w[4 * r:4 * r + 4] for b in word]
        for r in range(nr + 1)
    ]


def _mix_single(col: list[int], inv: bool) -> list[int]:
    a, b, c, d = col
    if not inv:
        return [
            _gf_mul(a, 2) ^ _gf_mul(b, 3) ^ c ^ d,
            a ^ _gf_mul(b, 2) ^ _gf_mul(c, 3) ^ d,
            a ^ b ^ _gf_mul(c, 2) ^ _gf_mul(d, 3),
            _gf_mul(a, 3) ^ b ^ c ^ _gf_mul(d, 2),
        ]
    return [
        _gf_mul(a, 14) ^ _gf_mul(b, 11) ^ _gf_mul(c, 13) ^ _gf_mul(d, 9),
        _gf_mul(a, 9) ^ _gf_mul(b, 14) ^ _gf_mul(c, 11) ^ _gf_mul(d, 13),
        _gf_mul(a, 13) ^ _gf_mul(b, 9) ^ _gf_mul(c, 14) ^ _gf_mul(d, 11),
        _gf_mul(a, 11) ^ _gf_mul(b, 13) ^ _gf_mul(c, 9) ^ _gf_mul(d, 14),
    ]


# state is a flat 16-list in COLUMN-major order (spec state s[r][c] =
# state[r + 4c]), matching the byte order of the input block directly.

_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def encrypt_block(key_or_schedule, block: bytes) -> bytes:
    ks = (
        key_or_schedule
        if isinstance(key_or_schedule, list)
        else _expand_key(key_or_schedule)
    )
    nr = len(ks) - 1
    s = [block[i] ^ ks[0][i] for i in range(16)]
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        s = [s[_SHIFT[i]] for i in range(16)]
        if rnd != nr:
            out = []
            for c in range(4):
                out.extend(_mix_single(s[4 * c:4 * c + 4], inv=False))
            s = out
        s = [s[i] ^ ks[rnd][i] for i in range(16)]
    return bytes(s)


def decrypt_block(key_or_schedule, block: bytes) -> bytes:
    ks = (
        key_or_schedule
        if isinstance(key_or_schedule, list)
        else _expand_key(key_or_schedule)
    )
    nr = len(ks) - 1
    s = [block[i] ^ ks[nr][i] for i in range(16)]
    for rnd in range(nr - 1, -1, -1):
        s = [s[_INV_SHIFT[i]] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = [s[i] ^ ks[rnd][i] for i in range(16)]
        if rnd != 0:
            out = []
            for c in range(4):
                out.extend(_mix_single(s[4 * c:4 * c + 4], inv=True))
            s = out
    return bytes(s)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC encrypt; pad=True applies PKCS#7 (PDF crypt filters use
    the always-present 1..16-byte variant, RFC 2898 §6.1.1)."""
    if pad:
        k = 16 - (len(data) % 16)
        data = data + bytes([k]) * k
    if len(data) % 16:
        raise ValueError("cbc_encrypt: unpadded data must be 16-aligned")
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = encrypt_block(ks, blk)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                unpad: bool = True) -> bytes:
    if len(data) % 16 or not data:
        raise ValueError("cbc_decrypt: ciphertext must be 16-aligned")
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(ks, blk), prev))
        prev = blk
    if unpad:
        k = out[-1]
        if not 1 <= k <= 16:
            raise ValueError("cbc_decrypt: bad PKCS#7 padding")
        del out[-k:]
    return bytes(out)
