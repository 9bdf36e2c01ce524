"""Split-conformal seasonal-naive prediction intervals."""

from __future__ import annotations

import numpy as np

from dads_spark.rollup import conformal_interval


def _df(spark, series):
    rows = [(k, int(h), int(v)) for k, hv in series.items()
            for h, v in hv]
    return spark.createDataFrame(rows, "k string, hw long, cnt long")


def test_conformal_linear_series_exact_width(spark):
    # x[t] = t, season 3 -> every residual is exactly 3
    hv = [(t, t) for t in range(30)]
    r = conformal_interval(
        _df(spark, {"h": hv}), ["k"], "hw", "cnt", season=3,
        alpha_q6=100_000,
    ).collect()[0]
    assert r["n_cal"] == 18            # 27 eligible, 2/3 split
    assert r["k_rank"] == 18           # min(18, ceil(19*0.9)=18)
    assert r["halfwidth"] == 3
    assert (r["n_test"], r["n_covered"]) == (9, 9)


def test_conformal_gap_safe_wallclock_join(spark):
    # a missing bucket must drop pairs, not misalign them (a row-based
    # lag would pair t with the wrong hour across the hole)
    hv = [(t, t) for t in range(30) if t != 10]
    r = conformal_interval(
        _df(spark, {"g": hv}), ["k"], "hw", "cnt", season=3,
        alpha_q6=100_000,
    ).collect()[0]
    # eligible: t in 3..29 except t=10 (absent) and t=13 (pred absent)
    assert r["n_cal"] + r["n_test"] == 25
    assert r["halfwidth"] == 3         # every surviving residual is 3


def _replica(vals_by_hw, season, alpha_q6):
    d = dict(vals_by_hw)
    elig = sorted(
        (hw, abs(v - d[hw - season]))
        for hw, v in vals_by_hw if hw - season in d
    )
    n = len(elig)
    ncal = (2 * n) // 3
    cal = sorted(r for _, r in elig[:ncal])
    k = min(ncal, ((ncal + 1) * (1_000_000 - alpha_q6) + 999_999)
            // 1_000_000)
    hw_ = cal[k - 1]
    test = [r for _, r in elig[ncal:]]
    return ncal, k, hw_, len(test), sum(1 for r in test if r <= hw_)


def test_conformal_matches_scalar_replica(spark):
    rng = np.random.default_rng(37)
    hv = [(t, int(v)) for t, v in
          enumerate(rng.poisson(30, 400))]
    r = conformal_interval(
        _df(spark, {"r": hv}), ["k"], "hw", "cnt", season=24,
        alpha_q6=100_000,
    ).collect()[0]
    ncal, k, hw_, ntest, ncov = _replica(hv, 24, 100_000)
    assert (r["n_cal"], r["k_rank"], r["halfwidth"]) == (ncal, k, hw_)
    assert (r["n_test"], r["n_covered"]) == (ntest, ncov)


def test_conformal_coverage_near_nominal_on_iid(spark):
    # iid noise: held-out coverage should land near 90%
    rng = np.random.default_rng(2)
    hv = [(t, int(v)) for t, v in
          enumerate(rng.integers(0, 1000, 1200))]
    r = conformal_interval(
        _df(spark, {"iid": hv}), ["k"], "hw", "cnt", season=1,
        alpha_q6=100_000,
    ).collect()[0]
    cov = r["n_covered"] / r["n_test"]
    assert 0.84 <= cov <= 0.96


def test_conformal_band_equals_interval_on_seasonal_naive_residuals(spark):
    """conformal_band on precomputed |x - x_pred| residuals must agree
    with conformal_interval computing the same thing internally."""
    from dads_spark.rollup import conformal_band

    rng = np.random.default_rng(77)
    hv = [(t, int(v)) for t, v in enumerate(rng.poisson(25, 300))]
    df = _df(spark, {"s": hv})
    via_interval = conformal_interval(
        df, ["k"], "hw", "cnt", season=24, alpha_q6=100_000
    ).collect()[0]
    d = dict(hv)
    resid = [(hw, v - d[hw - 24]) for hw, v in hv if hw - 24 in d]
    rdf = spark.createDataFrame(
        [("s", hw, r) for hw, r in resid], "k string, hw long, r long"
    )
    via_band = conformal_band(
        rdf, ["k"], "hw", "r", alpha_q6=100_000
    ).collect()[0]
    for c in ("n_cal", "k_rank", "halfwidth", "n_test", "n_covered"):
        assert via_band[c] == via_interval[c], c


def test_seasonal_conformal_composition_runs(spark):
    import __spark_entry__ as em

    rows = em.queries()["seasonal_conformal"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_cal"] > 0 and r["halfwidth"] >= 0
        assert 0 <= r["n_covered"] <= r["n_test"]
