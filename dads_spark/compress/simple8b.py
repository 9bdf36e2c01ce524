"""Simple-8b integer compression (Anh & Moffat 2010) — the third codec.

The standard TSDB integer codec (TimescaleDB / InfluxDB use this exact
layout for timestamp deltas and integer gauges): each 64-bit word
carries a 4-bit selector plus as many equal-width integers as fit in
the remaining 60 bits. Selectors 0/1 run-length-encode long runs of
ones (240/120 per word — the all-regular-timestamps fast path after
delta coding); selectors 2..15 pack (60x1, 30x2, 20x3, 15x4, 12x5,
10x6, 8x7, 7x8, 6x10, 5x12, 4x15, 3x20, 2x30, 1x60) bits. Values must
fit 60 bits; the encoder is the standard greedy (take the densest
selector whose width covers the next n values), which is optimal for
this selector family.

Unlike the XOR codecs, words are self-contained — decode needs no
carried state per value, so random access within a blob is possible at
word granularity (the property TSDBs exploit for partial scans).

Complements ``deltadelta`` (bit-granular) with the word-aligned layout;
both are exact and self-describing. Encode is a per-word loop (each
iteration consumes 1-240 values — the word structure is inherently
sequential), decode is a tight loop over words.
"""

from __future__ import annotations

import numpy as np

from .bitpack import clz64

#: selector -> (count, bits). Selectors 0/1 are RLE-of-ones (bits 0).
MODES = [
    (240, 0), (120, 0), (60, 1), (30, 2), (20, 3), (15, 4), (12, 5),
    (10, 6), (8, 7), (7, 8), (6, 10), (5, 12), (4, 15), (3, 20),
    (2, 30), (1, 60),
]
_MAX = (1 << 60) - 1


def encode_ints(values: np.ndarray) -> bytes:
    """Pack non-negative ints (< 2^60) into simple-8b words."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) and int(v.max()) > _MAX:
        raise ValueError("simple8b values must fit in 60 bits")
    words: list[int] = []
    i, n = 0, len(v)
    # bit_length per value, vectorized once (zero still needs 1 bit)
    nbits = np.maximum(64 - clz64(v), 1) if n else np.empty(0, np.int64)
    while i < n:
        # RLE of ones first: count the run
        if v[i] == 1:
            run = 1
            while i + run < n and run < 240 and v[i + run] == 1:
                run += 1
            if run >= 120:
                take = min(run, 240)
                if take >= 240:
                    words.append(0 << 60)
                    i += 240
                    continue
                words.append(1 << 60)
                i += 120
                continue
        # densest selector whose width covers the next cnt values (the
        # standard greedy); at the tail, the first selector whose count
        # reaches the end and whose width covers the remainder
        packed = False
        for sel in range(2, 16):
            cnt, bits = MODES[sel]
            j = min(i + cnt, n)
            full = j - i == cnt
            if not full and j != n:
                continue
            if int(nbits[i:j].max()) <= bits:
                w = sel << 60
                shift = 60
                for k in range(i, j):
                    shift -= bits
                    w |= int(v[k]) << shift
                words.append(w)
                i = j
                packed = True
                break
        assert packed, "unreachable: selector 15 fits any 60-bit value"
    out = np.array(words, dtype=np.uint64)
    return out.byteswap().tobytes()  # big-endian words


def decode_ints(data: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    pos = 0
    words = np.frombuffer(data, dtype=">u8")
    for w in words:
        w = int(w)
        sel = w >> 60
        cnt, bits = MODES[sel]
        if sel < 2:  # RLE of ones
            take = min(cnt, n - pos)
            out[pos : pos + take] = 1
            pos += take
            continue
        payload = w & _MAX
        shift = 60
        mask = (1 << bits) - 1
        for _ in range(cnt):
            if pos >= n:
                break
            shift -= bits
            out[pos] = (payload >> shift) & mask
            pos += 1
    if pos != n:
        raise ValueError(f"decoded {pos} values, expected {n}")
    return out
