"""Equivalents of the reference's offline script toolkit.

The reference ships three helper scripts around its binary format
(SURVEY.md §3 E3); each has a counterpart here so a reference user keeps
their workflow:

- ``convert_text_to_binary`` — script/sequence-converter/convert.py:8-29
  (one decimal per line -> big-endian doubles).
- ``replicate_series``      — script/sequence-converter/replicate.py:12-39
  (tile a fixture to K/M/B points for scale tests).
- ``score_diff``            — script/value-diff/result_diff.py:5-33
  (line-by-line comparison of two score files: max/avg absolute diff).
"""

from __future__ import annotations

import numpy as np

from .binary import read_binary_series, write_binary_series


def convert_text_to_binary(text_path: str, bin_path: str) -> int:
    """Text series (one decimal per line) -> reference binary format.
    Returns the number of values written."""
    vals = np.loadtxt(text_path, dtype=np.float64, ndmin=1)
    write_binary_series(bin_path, vals)
    return len(vals)


def replicate_series(src_path: str, dst_path: str, n_points: int) -> int:
    """Tile a binary series until it reaches ``n_points`` values (the
    reference's K/M/B scale-up tool). Returns the final length."""
    base = read_binary_series(src_path)
    if len(base) == 0:
        raise ValueError("empty source series")
    reps = -(-n_points // len(base))
    out = np.tile(base, reps)[:n_points]
    write_binary_series(dst_path, out)
    return len(out)


def score_diff(path_a: str, path_b: str) -> dict:
    """Line-by-line score comparison: same shape as the reference's
    result_diff.py report (count, max_diff, avg_diff)."""
    a = np.loadtxt(path_a, dtype=np.float64, ndmin=1)
    b = np.loadtxt(path_b, dtype=np.float64, ndmin=1)
    if len(a) != len(b):
        return {"count": 0, "length_mismatch": (len(a), len(b))}
    d = np.abs(a - b)
    return {
        "count": int(len(d)),
        "max_diff": float(d.max()) if len(d) else 0.0,
        "avg_diff": float(d.mean()) if len(d) else 0.0,
        "n_exact": int((d == 0).sum()),
    }
