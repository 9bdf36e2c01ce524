"""Holt smoothing + CUSUM property tests (sharp, implementation-free)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dads_spark.rollup.forecast import (
    cusum_changepoints,
    cusum_grouped,
    holt_forecast,
    holt_residuals_grouped,
)


def test_holt_exact_on_linear_series():
    # on x_t = a + b*t the init (level=x0, trend=b) is already exact, so
    # every forecast equals the truth and every residual is exactly 0
    x = 3.0 + 0.7 * np.arange(50)
    f, resid = holt_forecast(x, alpha=0.3, beta=0.1)
    assert np.isnan(f[0])
    assert resid[1:] == pytest.approx(np.zeros(49), abs=1e-9)


def test_holt_flags_level_shift(spark):
    rng = np.random.default_rng(5)
    x = 10 + 0.05 * np.arange(300) + rng.normal(0, 0.2, 300)
    x[200] += 25.0  # one-point spike
    df = spark.createDataFrame(
        pd.DataFrame({"k": "s", "t": np.arange(300), "v": x})
    )
    out = holt_residuals_grouped(df, ["k"], "t", "v", n_sigma=5.0).toPandas()
    assert 200 in set(out["idx"])
    assert (out["idx"] - 200).abs().min() == 0


def test_cusum_detects_planted_shift():
    rng = np.random.default_rng(9)
    x = np.concatenate([rng.normal(0, 1, 150), rng.normal(4, 1, 150)])
    alarms = cusum_changepoints(x, k=0.5, h=5.0)
    assert alarms, "no alarm raised"
    first_idx, direction = alarms[0]
    assert direction == "up"
    assert 150 <= first_idx <= 165  # fires within ~15 steps of the shift
    assert all(i >= 150 for i, _ in alarms[:1])


def test_cusum_quiet_on_stationary_noise():
    # k=0.75 leaves slack for the baseline-window estimation error of
    # mu/sigma (a small bias otherwise accumulates over hundreds of steps)
    for seed in (21, 22, 23, 24):
        rng = np.random.default_rng(seed)
        x = rng.normal(5, 1, 400)
        assert cusum_changepoints(x, k=0.75, h=8.0) == []


def test_cusum_grouped_matches_kernel(spark):
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.normal(0, 1, 100), rng.normal(-3, 1, 100)])
    df = spark.createDataFrame(
        pd.DataFrame({"k": "s", "t": np.arange(200), "v": x})
    )
    got = cusum_grouped(df, ["k"], "t", "v").toPandas()
    want = cusum_changepoints(x)
    assert list(zip(got["idx"], got["direction"])) == want
    assert (got["direction"] == "down").any()


def test_rolling_backtest_perfect_weekly_series(spark):
    import pandas as pd

    from dads_spark.rollup import rolling_backtest

    # 3 weeks of hourly events, count(h) = (h mod 168) % 5 + 1 — exactly
    # weekly-periodic, so the seasonal-naive predictor is PERFECT on every
    # fold while persistence is not.
    rows = []
    t0 = pd.Timestamp("2026-01-01")
    for h in range(3 * 168):
        for _ in range((h % 168) % 5 + 1):
            rows.append(("a", t0 + pd.Timedelta(hours=h)))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"]),
        "event_type string, ts timestamp",
    )
    out = {r["fold"]: r for r in rolling_backtest(ev, ["event_type"], "ts").collect()}
    assert set(out) == {1, 2, 3, 4}
    for fold, r in out.items():
        assert r["n_scored"] == 24
        assert r["sae_seasonal"] == 0
        assert r["sae_persist"] > 0
        assert r["skill_q6"] == 0  # perfect seasonal model


def test_rolling_backtest_gap_safe_seasonal_join(spark):
    import pandas as pd

    from dads_spark.rollup import rolling_backtest

    # drop hours 300..305 — exactly one week before held-out hours
    # 468..473. A ROW-lag formulation would misalign every later bucket;
    # the wall-clock join just scores those 6 buckets as missing
    # (n_scored < horizon) and stays exact on the rest.
    rows = []
    t0 = pd.Timestamp("2026-01-01")
    for h in range(3 * 168):
        if 300 <= h < 306:
            continue
        for _ in range(2):
            rows.append(("a", t0 + pd.Timedelta(hours=h)))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"]),
        "event_type string, ts timestamp",
    )
    out = {r["fold"]: r for r in rolling_backtest(ev, ["event_type"], "ts").collect()}
    # constant count=2 everywhere present: zero error where scored
    assert all(r["sae_seasonal"] == 0 for r in out.values())
    # exactly 6 held-out buckets lack their t-168h twin
    assert sum(24 - r["n_scored"] for r in out.values()) == 6


def test_damped_phi1_is_bitwise_classic_holt():
    import numpy as np

    from dads_spark.rollup.forecast import holt_forecast

    x = np.array([3.0, 7.0, 5.0, 11.0, 2.0, 9.0, 9.0, 4.0])
    f0, r0 = holt_forecast(x, 0.3, 0.1)
    f1, r1 = holt_forecast(x, 0.3, 0.1, phi=1.0)
    assert np.array_equal(f0[1:], f1[1:]) and np.array_equal(r0[1:], r1[1:])


def test_damped_trend_decays_on_plateau():
    import numpy as np

    from dads_spark.rollup.forecast import holt_forecast

    # ramp then hard plateau: the damped forecast must hug the plateau
    # tighter than the undamped one (smaller |residual| tail)
    x = np.concatenate([np.arange(0, 50, 2.0), np.full(30, 48.0)])
    _, r_plain = holt_forecast(x, 0.3, 0.1)
    _, r_damp = holt_forecast(x, 0.3, 0.1, phi=0.8)
    tail_plain = float(np.abs(r_plain[-20:]).sum())
    tail_damp = float(np.abs(r_damp[-20:]).sum())
    assert tail_damp < tail_plain


def test_damped_matches_scalar_oracle_bitwise():
    import numpy as np

    from dads_spark.oracles import holt_oracle
    from dads_spark.rollup.forecast import holt_forecast

    x = np.array([5.0, 1.0, 8.0, 8.0, 2.0, 14.0, 3.0, 3.0, 21.0])
    fp, rp = holt_forecast(x, 0.3, 0.1, phi=0.85)
    fo, ro = holt_oracle(x, 0.3, 0.1, phi=0.85)
    assert np.array_equal(fp[1:], fo[1:]) and np.array_equal(rp[1:], ro[1:])
