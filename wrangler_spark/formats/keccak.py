"""Keccak-f[1600] sponge — pure stdlib, from the published FIPS 202 /
Keccak reference specification.

Python's hashlib ships SHA-3 (padding byte 0x06) but not the original
Keccak submission (padding byte 0x01) that the reference's hash matrix
exposes as KECCAK-224/256/288/384/512
(``transformation/MessageHash.java:54-103``, BouncyCastle digests). The
permutation is identical — only the multi-rate padding byte differs — so
this sponge is validated against hashlib's sha3_* by swapping the pad.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y] (x = column, y = row)
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rol(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _M64 if n else v


def _keccak_f(a: list[list[int]]) -> None:
    for rc in _RC:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & _M64)
        # iota
        a[0][0] ^= rc


def keccak_digest(data: bytes, bits: int, pad_byte: int = 0x01) -> bytes:
    """Sponge with capacity 2*bits; pad_byte 0x01 = original Keccak,
    0x06 = SHA-3 (used only to self-validate against hashlib)."""
    rate = (1600 - 2 * bits) // 8
    a = [[0] * 5 for _ in range(5)]

    # pad10*1
    padded = bytearray(data)
    padded.append(pad_byte)
    while len(padded) % rate:
        padded.append(0)
    padded[-1] |= 0x80

    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8 : i * 8 + 8], "little")
            x, y = i % 5, i // 5
            a[x][y] ^= lane
        _keccak_f(a)

    # squeeze (all digest sizes here fit in one rate block)
    out = bytearray()
    while len(out) < bits // 8:
        for i in range(rate // 8):
            x, y = i % 5, i // 5
            out += a[x][y].to_bytes(8, "little")
            if len(out) >= bits // 8:
                break
        else:
            _keccak_f(a)
            continue
        break
    return bytes(out[: bits // 8])
