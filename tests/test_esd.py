"""Seasonal-hybrid generalized ESD: t-quantiles, masking, fallback."""

from __future__ import annotations

import numpy as np

from dads_spark.oracles import seasonal_esd_oracle
from dads_spark.rollup import seasonal_esd_grouped, t_quantile
from dads_spark.rollup.esd import esd_lambdas_q6


def test_t_quantile_matches_published_tables():
    # Student-t upper quantiles from any standard table, 4 dp
    assert round(t_quantile(0.975, 10), 4) == 2.2281
    assert round(t_quantile(0.95, 5), 4) == 2.0150
    assert round(t_quantile(0.995, 30), 4) == 2.7500
    assert round(t_quantile(0.975, 1), 4) == 12.7062


def test_lambdas_decrease_and_are_q6_ints():
    lams = esd_lambdas_q6(100, 5)
    assert len(lams) == 5
    assert all(isinstance(x, int) for x in lams)
    assert lams == sorted(lams, reverse=True)


def _flat_with(spikes: dict[int, int], n=96, base=10):
    t = list(range(n))
    v = [base + (i % 3) for i in range(n)]  # mild texture, MAD > 0
    for i, val in spikes.items():
        v[i] = val
    return t, v


def test_esd_catches_masked_double_spike():
    # two adjacent huge spikes mask each other for single-pass sigma
    # rules; ESD removes one, re-estimates, and catches the second
    t, v = _flat_with({40: 500, 41: 480})
    rows = seasonal_esd_oracle(t, v, season=24, k=4)
    sig_ts = {r[1] for r in rows if r[7] == 1}
    assert {40, 41} <= sig_ts


def test_quiet_series_has_no_significant_rows():
    t, v = _flat_with({})
    rows = seasonal_esd_oracle(t, v, season=24, k=4)
    assert all(r[7] == 0 for r in rows)


def test_meanad_fallback_on_flat_series():
    # >half the points identical => MAD == 0; the MeanAD fallback must
    # still flag the single huge spike
    t = list(range(72))
    v = [5] * 72
    v[30] = 400
    rows = seasonal_esd_oracle(t, v, season=24, k=3)
    assert rows, "fallback produced no steps"
    assert rows[0][1] == 30 and rows[0][7] == 1
    assert rows[0][4] == 0  # md == 0 -> fallback path exercised


def test_significance_is_last_passing_step():
    # ESD rule: anomalies = all steps up to the LAST passing test,
    # even if an intermediate step failed
    t, v = _flat_with({10: 300, 50: 290, 70: 280}, n=120)
    rows = seasonal_esd_oracle(t, v, season=24, k=6)
    passes = [r[0] for r in rows if r[7] == 1]
    if passes:
        last = max(passes)
        assert passes == list(range(1, last + 1))


def test_spark_matches_scalar_oracle(spark):
    t, v = _flat_with({40: 500, 41: 480, 10: 200}, n=96)
    df = spark.createDataFrame(
        [("a", ti, vi) for ti, vi in zip(t, v)],
        "event_type string, hb long, v long",
    )
    got = {
        (r["step"], r["t"], r["v"], r["u"], r["md"], r["sum_u"],
         r["n_active"], r["significant"])
        for r in seasonal_esd_grouped(
            df, ["event_type"], "hb", "v", season=24, k=4
        ).collect()
    }
    want = {tuple(r) for r in seasonal_esd_oracle(t, v, season=24, k=4)}
    assert got == want
