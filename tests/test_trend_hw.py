"""Theil-Sen trend, M4 downsampling, Holt-Winters, banded DTW, gap
percentiles: kernel properties + Spark-vs-kernel parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dads_spark.oracles import dtw_oracle, holt_winters_oracle
from dads_spark.rollup import (
    dtw_banded,
    dtw_pairs_grouped,
    gap_percentiles,
    holt_winters,
    holt_winters_grouped,
    m4_downsample,
    theil_sen_grouped,
    theil_sen_slope,
)

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# Theil-Sen
# ---------------------------------------------------------------------------

def test_theil_sen_exact_linear():
    t = np.arange(100, dtype=np.int64) * 3600
    v = 2.5 * np.arange(100) + 7.0  # 2.5 per hour
    slope, n_pairs = theil_sen_slope(t, v)
    assert n_pairs == 100 * 99 // 2
    assert slope == pytest.approx(2.5, abs=1e-12)


def test_theil_sen_robust_to_outliers():
    t = np.arange(200, dtype=np.int64) * 3600
    v = 1.0 * np.arange(200)
    v_dirty = v.copy()
    v_dirty[RNG.choice(200, size=30, replace=False)] += 500.0  # 15% spikes
    slope, _ = theil_sen_slope(t, v_dirty)
    # median of pairwise slopes barely moves; OLS would be wrecked
    assert abs(slope - 1.0) < 0.05


def test_theil_sen_lower_median_is_order_statistic():
    # 3 points -> 3 pairwise slopes; lower median = 2nd smallest
    t = np.array([0, 3600, 7200], dtype=np.int64)
    v = np.array([0.0, 10.0, 2.0])
    # slopes/hr: (10-0)/1=10, (2-0)/2=1, (2-10)/1=-8 -> sorted [-8,1,10], k=2
    slope, n = theil_sen_slope(t, v)
    assert n == 3 and slope == 1.0


def test_theil_sen_grouped_matches_kernel(spark):
    rows = []
    for key, true_slope in [("a", 0.5), ("b", -1.25)]:
        v = true_slope * np.arange(50) + RNG.normal(0, 0.1, 50)
        for i in range(50):
            rows.append((key, int(i * 3600), float(v[i])))
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        r["k"]: (r["slope_per_hr"], r["n_pairs"], r["n_points"])
        for r in theil_sen_grouped(df, ["k"], "t", "v").collect()
    }
    for key in ("a", "b"):
        pdf = pd.DataFrame(rows, columns=["k", "t", "v"])
        sub = pdf[pdf["k"] == key].sort_values("t")
        exp_slope, exp_pairs = theil_sen_slope(
            sub["t"].to_numpy(), sub["v"].to_numpy()
        )
        assert got[key][0] == exp_slope  # bit-identical
        assert got[key][1] == exp_pairs and got[key][2] == 50


# ---------------------------------------------------------------------------
# M4
# ---------------------------------------------------------------------------

def test_m4_keeps_four_extremes(spark):
    # one series, one pixel of width 10: points at t=0..9
    vals = [5.0, 1.0, 9.0, 9.0, 3.0, 1.0, 7.0, 2.0, 8.0, 4.0]
    rows = [("s", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = m4_downsample(df, ["k"], "t", "v", pixel_sec=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["t_first"], r["v_first"]) == (0, 5.0)
    assert (r["t_last"], r["v_last"]) == (9, 4.0)
    # min value 1.0 occurs at t=1 and t=5 -> smallest ts wins
    assert (r["t_min"], r["v_min"]) == (1, 1.0)
    # max value 9.0 occurs at t=2 and t=3 -> largest ts wins
    assert (r["t_max"], r["v_max"]) == (3, 9.0)


def test_m4_buckets_and_partition_invariance(spark):
    rows = [
        ("s", int(t), float(v))
        for t, v in zip(range(0, 1000), RNG.normal(0, 10, 1000))
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out1 = m4_downsample(df, ["k"], "t", "v", 100).sort("pixel").collect()
    out2 = (
        m4_downsample(df.repartition(7), ["k"], "t", "v", 100)
        .sort("pixel")
        .collect()
    )
    assert out1 == out2
    assert len(out1) == 10
    pdf = pd.DataFrame(rows, columns=["k", "t", "v"])
    pdf["px"] = pdf["t"] // 100
    for r in out1:
        sub = pdf[pdf["px"] == r["pixel"]]
        assert r["v_min"] == sub["v"].min()
        assert r["v_max"] == sub["v"].max()
        assert r["v_first"] == sub.loc[sub["t"].idxmin(), "v"]
        assert r["v_last"] == sub.loc[sub["t"].idxmax(), "v"]


# ---------------------------------------------------------------------------
# Holt-Winters
# ---------------------------------------------------------------------------

def test_holt_winters_exact_on_pure_seasonal():
    m = 24
    season = RNG.integers(0, 50, m).astype(np.float64)
    x = np.tile(season, 6)  # 6 exact daily cycles, zero trend
    fc, resid = holt_winters(x, m=m)
    assert np.isnan(fc[:m]).all()
    # absorbed by the seasonal state up to fp epsilon (alpha*a+(1-alpha)*a)
    assert np.abs(resid[m:]).max() < 1e-9


def test_holt_winters_beats_holt_on_seasonal():
    from dads_spark.rollup import holt_forecast

    m = 24
    season = 50 + 40 * np.sin(2 * np.pi * np.arange(m) / m)
    x = np.tile(season, 8) + RNG.normal(0, 1.0, m * 8)
    _, r_hw = holt_winters(x, m=m)
    _, r_h = holt_forecast(x)
    ok = np.isfinite(r_hw) & np.isfinite(r_h)
    assert np.abs(r_hw[ok]).mean() < 0.5 * np.abs(r_h[ok]).mean()


def test_holt_winters_matches_scalar_oracle_bitwise():
    x = RNG.integers(0, 100, 24 * 7).astype(np.float64)
    fc_p, r_p = holt_winters(x, m=24)
    fc_o, r_o = holt_winters_oracle(x, m=24)
    np.testing.assert_array_equal(fc_p[24:], fc_o[24:])
    np.testing.assert_array_equal(r_p[24:], r_o[24:])


def test_holt_winters_short_series_all_nan():
    fc, resid = holt_winters(np.arange(30, dtype=np.float64), m=24)
    assert np.isnan(fc).all() and np.isnan(resid).all()


def test_holt_winters_grouped_matches_kernel(spark):
    m = 12
    rows = []
    series = {}
    for key in ("x", "y"):
        v = RNG.integers(0, 60, m * 5).astype(np.float64)
        series[key] = v
        rows += [(key, i, float(v[i])) for i in range(len(v))]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = holt_winters_grouped(df, ["k"], "i", "v", m=m).collect()
    got = {(r["k"], r["idx"]): (r["forecast"], r["residual"]) for r in out}
    for key, v in series.items():
        fc, resid = holt_winters(v, m=m)
        for t in range(m, len(v)):
            assert got[(key, t)] == (fc[t], resid[t])


# ---------------------------------------------------------------------------
# DTW
# ---------------------------------------------------------------------------

def test_dtw_identical_is_zero():
    a = RNG.normal(0, 1, 200)
    assert dtw_banded(a, a, band=10) == 0.0


def test_dtw_known_small_case():
    # hand-checkable: a=[0,1,2], b=[0,2] full band
    # optimal alignment cost: |0-0| + |1-0 or 1-2|=1 + |2-2| = 1
    assert dtw_banded(np.array([0.0, 1, 2]), np.array([0.0, 2]), band=5) == 1.0


def test_dtw_matches_scalar_oracle_bitwise():
    a = RNG.normal(0, 5, 150)
    b = RNG.normal(0, 5, 140)
    assert dtw_banded(a, b, band=20) == dtw_oracle(a, b, band=20)


def test_dtw_tolerates_phase_shift():
    t = np.arange(240)
    a = np.sin(2 * np.pi * t / 24)
    b = np.sin(2 * np.pi * (t - 3) / 24)  # 3-step phase lag
    d_dtw = dtw_banded(a, b, band=6)
    d_euclid = np.abs(a - b).sum()
    assert d_dtw < 0.2 * d_euclid


def test_dtw_pairs_grouped(spark):
    rows = []
    vals = {}
    for key in ("p", "q", "r"):
        v = RNG.normal(0, 3, 80)
        vals[key] = v
        rows += [(key, i, float(v[i])) for i in range(80)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = dtw_pairs_grouped(df, "k", "t", "v", band=10).collect()
    assert len(out) == 3  # (p,q) (p,r) (q,r)
    for r in out:
        assert r["key_a"] < r["key_b"]
        exp = dtw_banded(vals[r["key_a"]], vals[r["key_b"]], band=10)
        assert r["dtw"] == exp


# ---------------------------------------------------------------------------
# gap percentiles
# ---------------------------------------------------------------------------

def test_gap_percentiles_exact_ranks(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    gaps_by_type: dict[str, list[int]] = {"A": [], "B": []}
    for ent in range(20):
        typ = "A" if ent % 2 == 0 else "B"
        t = base
        n_ev = int(RNG.integers(2, 12))
        for _ in range(n_ev):
            rows.append((typ, ent, eid, t))
            gap = int(RNG.integers(1, 5000))
            t = t + dt.timedelta(seconds=gap)
            eid += 1
        # recorded gaps = diffs between consecutive events actually emitted
    df = spark.createDataFrame(rows, "type string, ent long, event_id long, ts timestamp")
    # recompute expected gaps in pandas
    pdf = df.toPandas().sort_values(["ent", "ts", "event_id"])
    pdf["t"] = pdf["ts"].astype("int64") // 10**9
    pdf["gap"] = pdf.groupby("ent")["t"].diff()
    gg = pdf.dropna(subset=["gap"])
    out = {r["type"]: r for r in gap_percentiles(df, "ent", "type").collect()}
    for typ, sub in gg.groupby("type"):
        g = np.sort(sub["gap"].to_numpy(dtype=np.int64))
        n = len(g)
        r = out[typ]
        assert r["n_gaps"] == n
        assert r["sum_gap_sec"] == int(g.sum())
        assert r["p50_gap_sec"] == int(g[(n + 1) // 2 - 1])
        assert r["p90_gap_sec"] == int(g[(9 * n + 9) // 10 - 1])


# ---------------------------------------------------------------------------
# property tests (kernel-level, no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@given(
    vs=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=3, max_size=60),
    shift=st.floats(-1e5, 1e5, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_theil_sen_shift_invariant(vs, shift):
    t = np.arange(len(vs), dtype=np.int64) * 3600
    v = np.asarray(vs)
    s1, n1 = theil_sen_slope(t, v)
    s2, n2 = theil_sen_slope(t, v + shift)
    assert n1 == n2
    # adding a constant never changes any pairwise slope beyond fp eps
    assert s2 == pytest.approx(s1, rel=1e-9, abs=1e-9)


@given(
    vs=st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=2, max_size=40)
)
@settings(max_examples=50, deadline=None)
def test_dtw_symmetric_and_bounded(vs):
    a = np.asarray(vs)
    b = a[::-1].copy()
    d_ab = dtw_banded(a, b, band=len(a))
    d_ba = dtw_banded(b, a, band=len(a))
    # full band + equal lengths -> symmetric
    assert d_ab == pytest.approx(d_ba, rel=1e-12, abs=1e-12)
    # DTW with any band is bounded below by |sum endpoint match| >= 0 and
    # above by the L1 diagonal alignment cost
    assert 0.0 <= d_ab <= np.abs(a - b).sum() + 1e-9


@given(
    vs=st.lists(
        st.integers(0, 10**6), min_size=1, max_size=200
    ),
    pixel=st.integers(2, 50),
)
@settings(max_examples=50, deadline=None)
def test_m4_extremes_bracket_kernel(vs, pixel):
    # pandas-level property of the M4 semantics: per pixel, v_min/v_max
    # bracket every value and first/last are the boundary points
    pdf = pd.DataFrame(
        {"t": np.arange(len(vs), dtype=np.int64), "v": np.asarray(vs, float)}
    )
    pdf["px"] = pdf["t"] // pixel
    for _, sub in pdf.groupby("px"):
        assert sub["v"].min() <= sub["v"].max()
        assert sub.loc[sub["t"].idxmin(), "v"] >= sub["v"].min()
        assert sub.loc[sub["t"].idxmax(), "v"] <= sub["v"].max()


@given(
    season=st.lists(st.integers(0, 100), min_size=4, max_size=12),
    cycles=st.integers(3, 6),
)
@settings(max_examples=30, deadline=None)
def test_holt_winters_seasonal_absorption_property(season, cycles):
    m = len(season)
    x = np.tile(np.asarray(season, dtype=np.float64), cycles)
    _, resid = holt_winters(x, m=m)
    ok = np.isfinite(resid)
    assert np.abs(resid[ok]).max() < 1e-6 * (1 + np.abs(x).max())


def test_ols_trend_exact_line_and_parity(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from dads_spark.rollup import ols_trend_exact

    # perfect line y = 3x + 7 -> slope fraction reduces to exactly 3
    df = spark.range(100).select(
        F.lit("a").alias("k"), F.col("id").alias("t"),
        (F.col("id") * 3 + 7).alias("y"),
    )
    r = ols_trend_exact(df, ["k"], "t", "y").first()
    assert r["slope_numer"] == 3 * r["slope_denom"]
    assert r["icept_numer"] == 7 * r["icept_denom"]

    # noisy series: fraction matches numpy polyfit to float precision
    rng = np.random.default_rng(9)
    y = (rng.normal(50, 5, 200) + 0.7 * np.arange(200)).round().astype(int)
    df2 = spark.createDataFrame(
        [("b", int(i), int(v)) for i, v in enumerate(y)], "k string, t long, y long"
    )
    r2 = ols_trend_exact(df2, ["k"], "t", "y").first()
    slope = r2["slope_numer"] / r2["slope_denom"]
    icept = r2["icept_numer"] / r2["icept_denom"]
    fit = np.polyfit(np.arange(200), y, 1)
    assert abs(slope - fit[0]) < 1e-9 and abs(icept - fit[1]) < 1e-6

    # repartition invariance: integers have no summation-order surface
    a = ols_trend_exact(df2.coalesce(1), ["k"], "t", "y").collect()
    b = ols_trend_exact(df2.repartition(7, "t"), ["k"], "t", "y").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
