"""Gorilla-style XOR compression for float64 series (vectorized encode).

Format (a simplification of the Facebook Gorilla paper's value stream —
Pelkonen et al., PVLDB 2015 — without the previous-window reuse, which is an
inherently sequential decision; this variant is fully vectorizable and
self-describing):

- 64 bits: first value, raw IEEE-754 bits
- per subsequent value, XOR with the previous value:
  - '0'                                     if XOR == 0
  - '1' + 6-bit leading-zero count (0..63)
        + 6-bit (meaningful-length - 1)     otherwise, then the meaningful
          bits (between the first and last set bit of the XOR)

Typical rolled-up metric series compress 3-6x; constant runs compress ~64x.
"""

from __future__ import annotations

import numpy as np

from .bitpack import BitReader, clz64, ctz64, pack_fields


def encode_values(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    if n == 0:
        return b""
    if n == 1:
        return pack_fields(v, np.array([64]))
    xor = v[1:] ^ v[:-1]
    nz = xor != 0
    lz = np.minimum(clz64(xor), 63)
    tz = ctz64(xor)
    mlen = np.where(nz, 64 - lz - tz, 1).astype(np.int64)

    # fields: first value; then per value a control field and (if nz) a
    # header+mantissa field pair
    n_fields = 1 + 3 * (n - 1)
    vals = np.zeros(n_fields, dtype=np.uint64)
    bits = np.zeros(n_fields, dtype=np.int64)
    vals[0], bits[0] = v[0], 64
    # control bit
    vals[1::3] = nz.astype(np.uint64)
    bits[1::3] = 1
    # header: 6-bit lz + 6-bit (mlen-1), only when nz
    header = (lz.astype(np.uint64) << np.uint64(6)) | (mlen - 1).astype(np.uint64)
    vals[2::3] = np.where(nz, header, 0)
    bits[2::3] = np.where(nz, 12, 0)
    # mantissa: meaningful bits of xor
    vals[3::3] = np.where(nz, xor >> tz.astype(np.uint64), 0)
    bits[3::3] = np.where(nz, mlen, 0)
    return pack_fields(vals, bits)


def decode_values(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0)
    r = BitReader(data)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    prev = int(out[0])
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        header = r.read(12)
        lz = header >> 6
        mlen = (header & 0x3F) + 1
        mant = r.read(mlen)
        tz = 64 - lz - mlen
        prev ^= mant << tz
        out[i] = prev
    return out.view(np.float64)
