"""Vectorized variable-width bit packing on NumPy arrays.

Encoders emit a sequence of (value, nbits) fields (nbits <= 64); packing
expands them into a bit vector with one ``np.repeat`` and packs with
``np.packbits`` — no per-value Python in the encode path. Decoding of
variable-width codes is inherently sequential and only used for round-trip
verification and point reads, so it is a plain cursor loop.
"""

from __future__ import annotations

import numpy as np

_SMEAR_SHIFTS = (1, 2, 4, 8, 16, 32)

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount for uint64 arrays (numpy<2 lacks bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & _M1
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 (vectorized bit smear + popcount)."""
    y = x.astype(np.uint64, copy=True)
    for s in _SMEAR_SHIFTS:
        y |= y >> np.uint64(s)
    return 64 - popcount64(y)


def ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 (64 where x == 0)."""
    x = x.astype(np.uint64)
    low = x & (~x + np.uint64(1))  # lowest set bit
    out = popcount64(low - np.uint64(1))
    out[x == np.uint64(0)] = 64
    return out


def pack_fields(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack fields of ``nbits[i]`` low bits of ``values[i]``, MSB-first."""
    values = values.astype(np.uint64)
    nbits = nbits.astype(np.int64)
    keep = nbits > 0
    values, nbits = values[keep], nbits[keep]
    total = int(nbits.sum())
    if total == 0:
        return b""
    offs = np.cumsum(nbits) - nbits
    k = np.arange(total, dtype=np.int64) - np.repeat(offs, nbits)
    shift = (np.repeat(nbits, nbits) - 1 - k).astype(np.uint64)
    bits = ((np.repeat(values, nbits) >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


class BitReader:
    """Sequential MSB-first reader over a packed byte string."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        chunk = self._bits[self.pos : self.pos + n]
        self.pos += n
        out = 0
        for b in chunk:
            out = (out << 1) | int(b)
        return out

    def remaining(self) -> int:
        return len(self._bits) - self.pos
