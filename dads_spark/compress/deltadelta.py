"""Delta-of-delta timestamp compression (vectorized encode).

Per the Gorilla paper's timestamp stream (Pelkonen et al., PVLDB 2015),
adapted to int64 epoch units:

- 64 bits: first timestamp (two's-complement)
- 64 bits: first delta (two's-complement)
- per subsequent timestamp, D = delta_i - delta_{i-1}:
  - '0'                      D == 0
  - '10'   + 7 bits          D in [-63, 64]        (stored D + 63)
  - '110'  + 9 bits          D in [-255, 256]      (stored D + 255)
  - '1110' + 12 bits         D in [-2047, 2048]    (stored D + 2047)
  - '1111' + 64 bits         otherwise (two's-complement)

Regular (gap-free) buckets compress to ~1 bit per timestamp.
"""

from __future__ import annotations

import numpy as np

from .bitpack import BitReader, pack_fields

_U64 = np.uint64
_RANGES = (
    (-63, 64, 7, 63, 0b10, 2),
    (-255, 256, 9, 255, 0b110, 3),
    (-2047, 2048, 12, 2047, 0b1110, 4),
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return b""
    head_vals = [t[:1].view(np.uint64)[0]]
    head_bits = [64]
    if n == 1:
        return pack_fields(np.array(head_vals), np.array(head_bits))
    deltas = np.diff(t)
    head_vals.append(deltas[:1].view(np.uint64)[0])
    head_bits.append(64)
    if n == 2:
        return pack_fields(np.array(head_vals, dtype=np.uint64), np.array(head_bits))

    dod = np.diff(deltas)
    m = len(dod)
    ctrl = np.full(m, 0b1111, dtype=np.uint64)
    ctrl_bits = np.full(m, 4, dtype=np.int64)
    payload = dod.view(np.uint64).copy()  # two's complement for the wide case
    payload_bits = np.full(m, 64, dtype=np.int64)
    assigned = dod == 0
    ctrl[assigned] = 0
    ctrl_bits[assigned] = 1
    payload_bits[assigned] = 0
    for lo, hi, nbits, offset, code, code_bits in _RANGES:
        sel = ~assigned & (dod >= lo) & (dod <= hi)
        ctrl[sel] = code
        ctrl_bits[sel] = code_bits
        payload[sel] = (dod[sel] + offset).astype(np.uint64)
        payload_bits[sel] = nbits
        assigned |= sel

    vals = np.empty(2 + 2 * m, dtype=np.uint64)
    bits = np.empty(2 + 2 * m, dtype=np.int64)
    vals[:2] = head_vals
    bits[:2] = head_bits
    vals[2::2] = ctrl
    bits[2::2] = ctrl_bits
    vals[3::2] = payload
    bits[3::2] = payload_bits
    return pack_fields(vals, bits)


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    r = BitReader(data)
    out = np.empty(n, dtype=np.int64)
    out[0] = np.uint64(r.read(64)).astype(np.int64)
    if n == 1:
        return out
    delta = int(np.uint64(r.read(64)).astype(np.int64))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = int(np.uint64(r.read(64)).astype(np.int64))
        delta += dod
        out[i] = out[i - 1] + delta
    return out
