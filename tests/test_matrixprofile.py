"""Matrix-profile kernel parity vs brute force + grouped Spark operator."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dads_spark.fixtures import benchmark_series
from dads_spark.rollup.matrixprofile import (
    discords_grouped,
    matrix_profile,
    matrix_profile_grouped,
    sliding_stats,
    top_discords,
)


def brute_mp(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """O(n^2 m) literal z-normalized nearest-neighbor profile."""
    n = len(x)
    w = n - m + 1
    excl = int(np.ceil(m / 2))
    subs = np.lib.stride_tricks.sliding_window_view(x, m).astype(float)
    mu = subs.mean(axis=1, keepdims=True)
    sd = subs.std(axis=1, keepdims=True)
    z = (subs - mu) / np.where(sd == 0, 1.0, sd)
    mp = np.full(w, np.inf)
    mpi = np.zeros(w, dtype=np.int64)
    for i in range(w):
        d = np.sqrt(((z[i] - z) ** 2).sum(axis=1))
        d[np.abs(np.arange(w) - i) <= excl] = np.inf
        mpi[i] = int(np.argmin(d))
        mp[i] = d[mpi[i]]
    return mp, mpi


def test_kernel_matches_brute_force():
    rng = np.random.default_rng(7)
    x = np.cumsum(rng.normal(size=240))
    mp, mpi = matrix_profile(x, 16)
    bmp, _ = brute_mp(x, 16)
    assert mp == pytest.approx(bmp, rel=1e-6, abs=1e-6)


def test_sliding_stats_exact():
    rng = np.random.default_rng(3)
    x = rng.normal(size=100)
    mu, sig = sliding_stats(x, 10)
    subs = np.lib.stride_tricks.sliding_window_view(x, 10)
    assert mu == pytest.approx(subs.mean(axis=1))
    assert sig == pytest.approx(subs.std(axis=1), abs=1e-9)


def test_top_discord_finds_planted_anomaly():
    # benchmark_series plants discords at 0.3n and 0.7n
    n = 4000
    x = benchmark_series(n)
    mp, _ = matrix_profile(x, 50)
    picks = top_discords(mp, 50, k=2)
    planted = {int(0.3 * n), int(0.7 * n)}
    for p in picks:
        assert any(abs(p - t) <= 60 for t in planted), (picks, planted)


def test_grouped_matches_kernel(spark):
    rng = np.random.default_rng(11)
    frames = []
    for key in ["a", "b"]:
        x = np.cumsum(rng.normal(size=300))
        frames.append(
            pd.DataFrame({"k": key, "t": np.arange(300), "v": x})
        )
    df = spark.createDataFrame(pd.concat(frames))
    got = matrix_profile_grouped(df, ["k"], "t", "v", 20).toPandas()
    for key, grp in pd.concat(frames).groupby("k"):
        want_mp, want_idx = matrix_profile(grp["v"].to_numpy(), 20)
        sub = got[got.k == key].sort_values("idx")
        assert sub.mp.to_numpy() == pytest.approx(want_mp, rel=1e-9)
        assert (sub.mp_idx.to_numpy() == want_idx).all()


def test_discords_grouped_short_series_empty(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 10, "t": range(10), "v": [1.0] * 10})
    )
    out = discords_grouped(df, ["k"], "t", "v", m=8, k=2)
    assert out.count() == 0


def test_top_motifs_planted_pair(spark):
    from dads_spark.rollup import motifs_grouped

    rng = np.random.default_rng(12)
    x = rng.normal(0, 1, 400)
    pattern = np.sin(np.linspace(0, 4 * np.pi, 32)) * 3
    x[50:82] = pattern + rng.normal(0, 0.01, 32)
    x[300:332] = pattern + rng.normal(0, 0.01, 32)
    df = spark.createDataFrame(
        [("s", i, float(v)) for i, v in enumerate(x)],
        "k string, idx long, v double",
    )
    out = (
        motifs_grouped(df, ["k"], "idx", "v", m=32, k=2)
        .orderBy("rank")
        .collect()
    )
    top = out[0]
    assert abs(top["idx_a"] - 50) <= 2 and abs(top["idx_b"] - 300) <= 2
    assert top["idx_a"] < top["idx_b"]  # canonical orientation
    assert top["mp"] < 1.0  # near-identical planted shapes


def test_top_motifs_matches_brute_oracle():
    from dads_spark.oracles import brute_matrix_profile_idx, top_motifs_oracle
    from dads_spark.rollup.matrixprofile import matrix_profile, top_motifs

    rng = np.random.default_rng(4)
    x = np.cumsum(rng.normal(0, 1, 300))
    m = 16
    mp_s, mpi_s = matrix_profile(x, m)
    mp_b, mpi_b = brute_matrix_profile_idx(x, m)
    assert np.allclose(mp_s, mp_b, atol=1e-8)
    got = {tuple(sorted(p)) for p in top_motifs(mp_s, mpi_s, m, 3)}
    want = {tuple(sorted(p)) for p in top_motifs_oracle(mp_b, mpi_b, m, 3)}
    assert got == want
