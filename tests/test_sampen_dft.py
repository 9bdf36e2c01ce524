"""Sample entropy (banded self-join) and daily-DFT cycle strength."""

from __future__ import annotations

import math

import numpy as np

from dads_spark.rollup import dft_daily, sample_entropy
from dads_spark.rollup.periodicity import COS24_Q6


def _series_df(spark, series):
    """series: {key: [int values]} -> (key, hw, cnt) DataFrame."""
    rows = [
        (k, i, int(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "k string, hw long, cnt long")


def _sampen_naive(vals, r=2):
    """Textbook Richman-Moorman m=2 counts over t = 1..N-2."""
    tpl = [
        (vals[t], vals[t + 1], vals[t + 2]) for t in range(len(vals) - 2)
    ]
    b = a = 0
    for i in range(len(tpl)):
        for j in range(i + 1, len(tpl)):
            if (
                abs(tpl[i][0] - tpl[j][0]) <= r
                and abs(tpl[i][1] - tpl[j][1]) <= r
            ):
                b += 1
                if abs(tpl[i][2] - tpl[j][2]) <= r:
                    a += 1
    return len(tpl), b, a


def test_sampen_constant_series_is_zero(spark):
    n = 20
    df = _series_df(spark, {"c": [7] * n})
    r = sample_entropy(df, ["k"], "hw", "cnt").collect()[0]
    m = n - 2
    assert r["n_templates"] == m
    assert r["b_count"] == m * (m - 1) // 2
    assert r["a_count"] == m * (m - 1) // 2
    assert r["sampen_q3"] == 0


def test_sampen_matches_naive_on_random_series(spark):
    rng = np.random.default_rng(11)
    series = {
        "poisson": list(rng.poisson(12, 120)),
        "spread": list(rng.integers(0, 500, 120)),
        "steps": [int(5 * (i // 10)) for i in range(90)],
    }
    out = {
        r["k"]: r
        for r in sample_entropy(
            _series_df(spark, series), ["k"], "hw", "cnt"
        ).collect()
    }
    for k, vals in series.items():
        m, b, a = _sampen_naive(vals)
        assert out[k]["n_templates"] == m, k
        assert out[k]["b_count"] == b, k
        assert out[k]["a_count"] == a, k
        if a > 0 and b > 0:
            want = math.floor((math.log(b) - math.log(a)) * 1000 + 0.5)
            assert out[k]["sampen_q3"] == want, k
        else:
            assert out[k]["sampen_q3"] is None, k


def test_sampen_no_close_pairs_yields_null(spark):
    # values 0, 100, 200, ... — no two templates within r=2 anywhere
    df = _series_df(spark, {"far": [100 * i for i in range(12)]})
    r = sample_entropy(df, ["k"], "hw", "cnt").collect()[0]
    assert r["b_count"] == 0 and r["a_count"] == 0
    assert r["sampen_q3"] is None


def _dft_naive(vals_by_hw, harmonics=(1, 2, 3, 4)):
    """Scalar replica using the SAME q6 trig table."""
    out = {}
    for k in harmonics:
        sc = ss = n = 0
        for hw, x in vals_by_hw:
            a = (k * (hw % 24)) % 24
            sc += x * COS24_Q6[a]
            ss += x * COS24_Q6[(a + 18) % 24]
            n += 1
        amp = math.floor(
            math.sqrt(float(sc) * float(sc) + float(ss) * float(ss))
            * 2
            / n
            + 0.5
        )
        out[k] = (n, sc, ss, amp)
    return out


def test_dft_flat_series_has_zero_amplitude(spark):
    # constant series over complete 24h cycles: every harmonic cancels
    df = _series_df(spark, {"flat": [10] * 96})
    rows = dft_daily(df, ["k"], "hw", "cnt").collect()
    assert len(rows) == 4
    for r in rows:
        assert r["sc"] == 0 and r["ss"] == 0 and r["amp_q6"] == 0


def test_dft_planted_daily_wave_dominates_k1(spark):
    # x_h = 1000 + table-cosine wave of amplitude 300 (exact integers)
    vals = [1000 + (300 * COS24_Q6[h % 24]) // 1000000 for h in range(240)]
    df = _series_df(spark, {"wave": vals})
    rows = {r["harmonic"]: r for r in
            dft_daily(df, ["k"], "hw", "cnt").collect()}
    # k=1 amplitude ~ 300e6 in q6 units; higher harmonics tiny
    assert abs(rows[1]["amp_q6"] - 300_000_000) < 2_000_000
    for k in (2, 3, 4):
        assert rows[k]["amp_q6"] < 10_000_000

    naive = _dft_naive(list(enumerate(vals)))
    for k in (1, 2, 3, 4):
        n, sc, ss, amp = naive[k]
        assert rows[k]["n_points"] == n
        assert rows[k]["sc"] == sc
        assert rows[k]["ss"] == ss
        assert rows[k]["amp_q6"] == amp


def test_dft_matches_scalar_replica_on_random_gappy_series(spark):
    rng = np.random.default_rng(23)
    hws = sorted(rng.choice(1000, size=400, replace=False).tolist())
    vals = [int(v) for v in rng.poisson(40, 400)]
    rows_in = [("g", int(h), v) for h, v in zip(hws, vals)]
    df = spark.createDataFrame(rows_in, "k string, hw long, cnt long")
    rows = {r["harmonic"]: r for r in
            dft_daily(df, ["k"], "hw", "cnt").collect()}
    naive = _dft_naive(list(zip(hws, vals)))
    for k in (1, 2, 3, 4):
        n, sc, ss, amp = naive[k]
        assert (rows[k]["n_points"], rows[k]["sc"], rows[k]["ss"]) == (
            n, sc, ss,
        )
        assert rows[k]["amp_q6"] == amp
