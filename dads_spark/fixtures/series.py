"""Deterministic univariate benchmark series with planted discords.

Follows the reference's fixture methodology (F2 in FIXTURES.md): seeded sine
with Gaussian noise plus two planted anomalies — a random-walk splice and an
amplitude spike (reference scale method: script/sequence-converter/
replicate.py tiles fixtures; we synthesize directly at the requested n).
"""

from __future__ import annotations

import numpy as np


def benchmark_series(
    n: int = 10_000,
    seed: int = 42,
    discord_splice_at: int | None = None,
    discord_spike_at: int | None = None,
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    x = np.sin(2.0 * np.pi * t / 100.0) + rng.normal(0.0, 0.01, n)

    splice_at = discord_splice_at if discord_splice_at is not None else int(n * 0.3)
    spike_at = discord_spike_at if discord_spike_at is not None else int(n * 0.7)

    splice_len = 75
    if 0 <= splice_at and splice_at + splice_len <= n:
        walk = np.cumsum(rng.normal(0.0, 0.15, splice_len))
        x[splice_at : splice_at + splice_len] = x[splice_at] + walk

    spike_len = 30
    if 0 <= spike_at and spike_at + spike_len <= n:
        x[spike_at : spike_at + spike_len] *= 3.0

    return x
