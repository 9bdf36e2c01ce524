"""Chimp XOR compression for float64 series (vectorized encode).

Implements the value-stream scheme of Chimp (Liakos, Papakonstantinopoulou,
Fragkoulis — PVLDB 2022): like Gorilla it XORs consecutive values, but it
(a) spends a 2-bit flag instead of Gorilla's variable control bits,
(b) rounds the leading-zero count DOWN to one of 8 classes so the header
is 3 bits instead of 6, and (c) specializes the frequent "few trailing
zeros" case by reusing the PREVIOUS value's leading-zero class, writing
no header at all. On real telemetry Chimp beats Gorilla because decimal
doubles rarely have long trailing-zero runs — Gorilla's 6+6 header is
pure overhead there.

Flags:

- ``00`` xor == 0 (value repeats)
- ``01`` xor != 0 and trailing zeros > 6: 3-bit lz class + 6-bit
  (center length - 1) + center bits (both lz and tz dropped)
- ``10`` xor != 0, tz <= 6, lz class == previous stored class: the
  (64 - prev_class) low bits of the xor, NO header
- ``11`` xor != 0, tz <= 6, class changed: 3-bit lz class + the
  (64 - class) low bits

The "previous stored class" chain looks sequential but telescopes: every
non-zero xor STORES its own class (flag 10 requires equality with the
carried class, flag 01/11 overwrite it), so the carried class at any
position is simply the class of the PREVIOUS non-zero xor — a forward
fill, fully vectorizable (same trick as this package's Gorilla variant,
which drops the paper's sequential previous-window reuse).

Reference behavior (public): the Chimp paper + its published Java
implementation's flag/class tables. LZ classes: {0,8,12,16,18,20,22,24}
(counts above 24 clamp to 24; counts between boundaries round down).
"""

from __future__ import annotations

import numpy as np

from .bitpack import BitReader, clz64, ctz64, pack_fields

#: leading-zero class boundaries (index = the 3-bit header value)
LZ_CLASSES = np.array([0, 8, 12, 16, 18, 20, 22, 24], dtype=np.int64)


def _lz_class_idx(lz: np.ndarray) -> np.ndarray:
    """Index of the largest class boundary <= lz (round DOWN)."""
    return np.maximum(
        np.searchsorted(LZ_CLASSES, np.minimum(lz, 24), side="right") - 1, 0
    )


def encode_values(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    if n == 0:
        return b""
    if n == 1:
        return pack_fields(v, np.array([64]))
    xor = v[1:] ^ v[:-1]
    nz = xor != 0
    lz = clz64(xor)
    tz = ctz64(xor)
    cls_idx = _lz_class_idx(lz)
    cls_lz = LZ_CLASSES[cls_idx]

    # carried class = class of the previous non-zero xor (forward fill);
    # the first non-zero xor has no predecessor -> forced flag 11
    prev_cls = np.full(n - 1, -1, dtype=np.int64)
    nz_pos = np.flatnonzero(nz)
    if len(nz_pos) > 1:
        prev_cls[nz_pos[1:]] = cls_lz[nz_pos[:-1]]

    many_tz = nz & (tz > 6)
    reuse = nz & ~many_tz & (cls_lz == prev_cls)
    fresh = nz & ~many_tz & ~reuse

    flag = np.zeros(n - 1, dtype=np.uint64)
    flag[many_tz] = 1
    flag[reuse] = 2
    flag[fresh] = 3

    center_len = np.where(many_tz, 64 - cls_lz - tz, 0).astype(np.int64)
    # fields per delta: flag(2) + header + payload
    n_fields = 1 + 3 * (n - 1)
    vals = np.zeros(n_fields, dtype=np.uint64)
    bits = np.zeros(n_fields, dtype=np.int64)
    vals[0], bits[0] = v[0], 64
    vals[1::3] = flag
    bits[1::3] = 2
    # header: 01 -> 3-bit class + 6-bit (center_len - 1); 11 -> 3-bit class
    hdr_01 = (cls_idx.astype(np.uint64) << np.uint64(6)) | np.where(
        many_tz, center_len - 1, 0
    ).astype(np.uint64)
    vals[2::3] = np.where(many_tz, hdr_01, np.where(fresh, cls_idx, 0))
    bits[2::3] = np.where(many_tz, 9, np.where(fresh, 3, 0))
    # payload: 01 -> center bits; 10/11 -> (64 - class) low bits
    low_bits = 64 - cls_lz
    vals[3::3] = np.where(
        many_tz,
        xor >> tz.astype(np.uint64),
        np.where(nz, xor, 0),
    )
    bits[3::3] = np.where(
        many_tz, center_len, np.where(reuse | fresh, low_bits, 0)
    )
    return pack_fields(vals, bits)


def decode_values(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0)
    r = BitReader(data)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    prev = int(out[0])
    prev_cls = -1
    for i in range(1, n):
        flag = r.read(2)
        if flag == 0:
            out[i] = prev
            continue
        if flag == 1:  # many trailing zeros: class + center
            hdr = r.read(9)
            cls = int(LZ_CLASSES[hdr >> 6])
            clen = (hdr & 0x3F) + 1
            center = r.read(clen)
            xor = center << (64 - cls - clen)
            prev_cls = cls
        elif flag == 2:  # reuse previous class
            xor = r.read(64 - prev_cls)
        else:  # fresh class
            prev_cls = int(LZ_CLASSES[r.read(3)])
            xor = r.read(64 - prev_cls)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)
