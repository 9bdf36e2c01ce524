"""Run-length encoding for float64 series, bit-pattern exact.

The right codec when a rolled-up series is STEPWISE — sparse gauges,
LOCF-filled tiers, quota counters that change rarely: Gorilla spends
one control bit per point on a constant run; RLE spends 12 bytes per
RUN. Complements the XOR family in ``VALUE_CODECS`` (the
columnar-encoding advisor in ops/profile.py picks per column).

Runs are detected on the raw IEEE-754 BIT PATTERN (uint64 view), not
float equality, so NaN runs and signed zeros round-trip bit-exactly —
the same discipline as the XOR codecs.

Layout (little-endian, self-describing given n):
    u32 n_runs, then n_runs x u32 run lengths, then n_runs x u64 raw
    value bits. Struct-of-arrays so encode AND decode are single
    NumPy primitives (diff/flatnonzero + repeat) — no per-point Python.

Reference analog: none; spec source is the north rule's compression
clause (Gorilla/delta-of-delta) — this is the flat-series fast path
beside it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_values", "decode_values"]


def encode_values(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    if n == 0:
        return b""
    starts = np.concatenate(([0], np.flatnonzero(v[1:] != v[:-1]) + 1))
    lengths = np.diff(np.concatenate((starts, [n]))).astype(np.uint32)
    head = np.array([len(starts)], dtype=np.uint32)
    return (
        head.tobytes()
        + lengths.tobytes()
        + v[starts].tobytes()
    )


def decode_values(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.float64)
    if not data:
        # a truncated/zero-byte payload must fail like every other length
        # mismatch (the len(out) != n check below is unreachable here)
        raise ValueError(f"rle: empty payload, expected {n} points")
    n_runs = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
    lengths = np.frombuffer(data[4: 4 + 4 * n_runs], dtype=np.uint32)
    bits = np.frombuffer(
        data[4 + 4 * n_runs: 4 + 4 * n_runs + 8 * n_runs], dtype=np.uint64
    )
    out = np.repeat(bits, lengths.astype(np.int64))
    if len(out) != n:
        raise ValueError(f"rle: decoded {len(out)} points, expected {n}")
    return out.view(np.float64).copy()
