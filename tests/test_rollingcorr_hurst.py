"""Rolling Pearson correlation and Hurst R/S exponent — exact arithmetic."""

from __future__ import annotations

import math

import numpy as np

from dads_spark.rollup import hurst_rs, rolling_corr


def _corr_df(spark, xs, ys, key="k"):
    rows = [(key, i + 1, int(a), int(b)) for i, (a, b) in enumerate(zip(xs, ys))]
    return spark.createDataFrame(rows, "k string, t long, x long, y long")


def _r_q6(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return 0
    r = num / (math.sqrt(dx) * math.sqrt(dy))
    return int(np.sign(r)) * int(math.floor(abs(r) * 1e6 + 0.5))


def test_rolling_corr_perfect_and_inverse(spark):
    xs = list(range(1, 31))
    out = {
        r["t"]: r["r_q6"]
        for r in rolling_corr(
            _corr_df(spark, xs, xs), ["k"], "t", "x", "y", window_n=5
        ).collect()
    }
    assert set(out) == set(range(5, 31))  # partial head frames dropped
    assert all(v == 1_000_000 for v in out.values())
    inv = rolling_corr(
        _corr_df(spark, xs, [-v for v in xs]), ["k"], "t", "x", "y", 5
    ).collect()
    assert all(r["r_q6"] == -1_000_000 for r in inv)


def test_rolling_corr_matches_scalar_replica(spark):
    rng = np.random.default_rng(9)
    xs = rng.integers(0, 200, 120).tolist()
    ys = [int(v + d) for v, d in zip(xs, rng.integers(-40, 40, 120))]
    w = 24
    out = {
        r["t"]: r["r_q6"]
        for r in rolling_corr(
            _corr_df(spark, xs, ys), ["k"], "t", "x", "y", w
        ).collect()
    }
    for t in range(w, 121):
        assert out[t] == _r_q6(xs[t - w : t], ys[t - w : t]), t


def test_rolling_corr_degenerate_zero(spark):
    xs = [5] * 10  # constant x -> dx = 0 -> r_q6 = 0
    ys = list(range(10))
    out = rolling_corr(_corr_df(spark, xs, ys), ["k"], "t", "x", "y", 4)
    assert all(r["r_q6"] == 0 for r in out.collect())


def _hurst_scalar(xs, sizes):
    """Scalar replica of the documented integer R/S arithmetic."""
    per_n = {}
    for n in sizes:
        rss = []
        for s0 in range(0, (len(xs) // n) * n, n):
            seg = xs[s0 : s0 + n]
            S, Q = sum(seg), sum(v * v for v in seg)
            d = n * Q - S * S
            if d <= 0:
                continue
            c, cum = [], 0
            for i, v in enumerate(seg, start=1):
                cum += v
                c.append(n * cum - i * S)
            r = max(c) - min(c)
            rss.append(int(math.floor(r / math.sqrt(d) * 1e6 + 0.5)))
        if rss:
            k = len(rss)
            per_n[n] = (k, (2 * sum(rss) + k) // (2 * k))
    pts = []
    for n, (_, mean_q6) in per_n.items():
        if mean_q6 <= 0:
            continue
        xq = int(math.floor(math.log(n) * 1e3 + 0.5))
        ln_y = math.log(float(mean_q6)) - math.log(1e6)
        yq = int(np.sign(ln_y)) * int(math.floor(abs(ln_y) * 1e3 + 0.5))
        pts.append((xq, yq))
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    num, den = k * sxy - sx * sy, k * sxx - sx * sx
    h = num / den
    hq = int(np.sign(h)) * int(math.floor(abs(h) * 1e6 + 0.5))
    return per_n, hq


def test_hurst_exact_vs_scalar_replica(spark):
    rng = np.random.default_rng(21)
    xs = rng.integers(0, 50, 600).tolist()
    df = spark.createDataFrame(
        [("k", i + 1, v) for i, v in enumerate(xs)], "k string, t long, x long"
    )
    out = hurst_rs(df, ["k"], "t", "x", sizes=(16, 32, 64, 128)).collect()
    want_per_n, want_h = _hurst_scalar(xs, (16, 32, 64, 128))
    got = {r["seg_len"]: (r["n_segments"], r["mean_rs_q6"]) for r in out}
    assert got == want_per_n
    assert all(r["hurst_q6"] == want_h for r in out)


def test_hurst_regimes(spark):
    # iid noise -> H near 0.5; a strong trend -> H near 1
    rng = np.random.default_rng(4)
    rows = [("iid", i + 1, int(v)) for i, v in enumerate(rng.integers(0, 100, 1024))]
    rows += [("trend", i + 1, i + int(v)) for i, v in enumerate(rng.integers(0, 5, 1024))]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = hurst_rs(df, ["k"], "t", "x").collect()
    h = {r["k"]: r["hurst_q6"] for r in out}
    assert 350_000 < h["iid"] < 680_000
    assert h["trend"] > 850_000
    # every row of a key carries the same slope; 4 sizes x 2 keys rows
    assert len(out) == 8
