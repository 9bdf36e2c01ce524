"""ALP-style adaptive decimal re-scaling for doubles — the fourth codec.

The ALP observation (Afroozeh & Boncz, SIGMOD 2023, "ALP: Adaptive
Lossless floating-Point Compression", public paper): most doubles that
land in analytical storage were DECIMALS at birth (prices, rounded
sums, sensor readings with fixed precision), so `round(v * 10^e)`
recovers a small integer for almost every value, and the ones it
doesn't fit are stored verbatim as exceptions. The integers then
compress with any good integer codec — here ``simple8b`` (zigzag for
sign), giving ~2 bytes/value on 2-decimal telemetry where XOR codecs
(Gorilla/Chimp) pay near-full mantissa entropy because rounded
decimals have NOISY binary mantissas that never align.

This is a faithful simplification of ALP's scheme (single best
exponent per block, chosen by exhaustive scan of e in 0..18 for
maximum exact coverage with smallest digits; the paper additionally
splits a second factor 10^f out of the exponent and picks per-vector
candidates from a sampled ranking — compression-ratio tuning, not a
correctness difference). LOSSLESS BY CONSTRUCTION: the encoder's
exactness test replays the decoder's exact arithmetic
(int64(round(v*10^e)) -> float64 -> / 10^e; division, because
decimals are BORN as int/10^e and the reciprocal multiply is inexact)
and compares BITS, so
-0.0, NaN payloads, infinities, and any value the re-scaling can't
reproduce bit-identically are shipped as raw exceptions.

Layout: [e u8][n_exc u32][s8_len u32][simple8b zigzag digits]
[exception positions u32 * n_exc][exception doubles f64 * n_exc].
"""

from __future__ import annotations

import numpy as np

from . import simple8b as s8

_POW = np.array([10.0**e for e in range(19)])
_LIMIT = float(2**51)


def _zigzag(d: np.ndarray) -> np.ndarray:
    return ((d << np.int64(1)) ^ (d >> np.int64(63))).view(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    zi = z.view(np.int64)
    return (zi >> np.int64(1)) ^ -(zi & np.int64(1))


def encode_values(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return np.uint8(0).tobytes() + np.zeros(2, np.uint32).tobytes()
    bits = v.view(np.uint64)
    best_e, best_ok, best_d = 0, None, None
    finite = np.isfinite(v)
    for e in range(19):
        with np.errstate(invalid="ignore", over="ignore"):
            d = np.rint(v * _POW[e])
        inrange = finite & (np.abs(d) < _LIMIT)
        di = np.where(inrange, d, 0.0).astype(np.int64)
        # the exactness test IS the decoder's arithmetic, compared in bits
        rec = di.astype(np.float64) / _POW[e]
        ok = inrange & (rec.view(np.uint64) == bits)
        c = int(ok.sum())
        if best_ok is None or c > best_ok:
            best_e, best_ok, best_d = e, c, np.where(ok, di, 0)
            if c == n:
                break
    # bit-level misses (-0.0, NaN payloads) become exceptions
    rec = best_d.astype(np.float64) / _POW[best_e]
    exc_pos = np.flatnonzero(rec.view(np.uint64) != bits).astype(np.uint32)
    digits = best_d.copy()
    digits[exc_pos] = 0
    payload = s8.encode_ints(_zigzag(digits))
    return b"".join(
        (
            np.uint8(best_e).tobytes(),
            np.uint32(len(exc_pos)).tobytes(),
            np.uint32(len(payload)).tobytes(),
            payload,
            exc_pos.tobytes(),
            v[exc_pos.astype(np.int64)].tobytes(),
        )
    )


def decode_values(blob: bytes, n: int) -> np.ndarray:
    e = int(np.frombuffer(blob, np.uint8, 1, 0)[0])
    n_exc = int(np.frombuffer(blob, np.uint32, 1, 1)[0])
    s8_len = int(np.frombuffer(blob, np.uint32, 1, 5)[0])
    if n == 0:
        return np.empty(0, np.float64)
    digits = _unzigzag(s8.decode_ints(blob[9 : 9 + s8_len], n))
    out = digits.astype(np.float64) / _POW[e]
    if n_exc:
        off = 9 + s8_len
        pos = np.frombuffer(blob, np.uint32, n_exc, off).astype(np.int64)
        raw = np.frombuffer(blob, np.float64, n_exc, off + 4 * n_exc)
        out[pos] = raw
    return out
