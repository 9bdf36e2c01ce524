"""Exact Mann-Whitney U drift with tie correction."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from dads_spark.rollup import mannwhitney_drift

_T0 = dt.datetime(2024, 1, 1)


def _rows(key, days_values):
    out = []
    for d, vals in days_values.items():
        for i, v in enumerate(vals):
            out.append((key, _T0 + dt.timedelta(days=d, minutes=i),
                        float(v)))
    return out


def _mw_naive(base, day):
    """Exact doubled-midrank U2, tie term, and z."""
    allv = sorted(set(base) | set(day))
    nb = {v: base.count(v) for v in allv}
    nd = {v: day.count(v) for v in allv}
    ct = 0
    r2 = 0
    tie = 0
    for v in allv:
        t = nb[v] + nd[v]
        ct += t
        r2 += nd[v] * (2 * ct - t + 1)
        tie += t ** 3 - t
    n, m = len(day), len(base)
    u2 = r2 - n * (n + 1)
    nn = n + m
    var_num = n * m * ((nn ** 3 - nn) - tie)
    var_den = 3 * nn * (nn - 1)
    if var_num <= 0:
        return u2, tie, None
    z = (u2 - n * m) / math.sqrt(var_num / var_den)
    return u2, tie, (-1 if z < 0 else 1) * math.floor(abs(z) * 1e6 + 0.5)


def test_mw_identical_distributions_center(spark):
    base = list(range(60))
    rows = _rows("k", {0: base, 8: base})
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    r = mannwhitney_drift(df, ["event_type"], "ts", "value").collect()[0]
    # identical samples: U = n*m/2 exactly -> u2 = n*m, z = 0
    assert r["u2"] == 60 * 60
    assert r["z_q6"] == 0


def test_mw_shifted_distribution_signed(spark):
    base = [float(v) for v in range(100)]
    up = [v + 200 for v in base]      # strictly above baseline
    down = [v - 200 for v in base]
    rows = _rows("k", {0: base, 8: up, 9: down})
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r["bucket_ts"]: r for r in mannwhitney_drift(
        df, ["event_type"], "ts", "value"
    ).collect()}
    ups = [r for r in out.values() if r["u2"] == 2 * 100 * 100]
    downs = [r for r in out.values() if r["u2"] == 0]
    assert len(ups) == 1 and len(downs) == 1   # complete separation
    assert ups[0]["z_q6"] > 10_000_000         # z >> 3
    assert downs[0]["z_q6"] < -10_000_000


def test_mw_all_tied_yields_null_z(spark):
    rows = _rows("k", {0: [5.0] * 30, 8: [5.0] * 20})
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    r = mannwhitney_drift(df, ["event_type"], "ts", "value").collect()[0]
    assert r["z_q6"] is None
    assert r["u2"] == 20 * 30   # midranks: everything at the center


def test_mw_matches_naive_with_heavy_ties(spark):
    rng = np.random.default_rng(91)
    base = [int(v) for v in rng.integers(0, 8, 150)]
    day = [int(v) for v in rng.integers(1, 9, 90)]
    rows = _rows("k", {0: base, 8: day})
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    r = mannwhitney_drift(df, ["event_type"], "ts", "value").collect()[0]
    u2, tie, zq = _mw_naive([float(v) for v in base],
                            [float(v) for v in day])
    assert (r["u2"], r["tie_term"], r["z_q6"]) == (u2, tie, zq)
    assert (r["n_period"], r["n_baseline"]) == (90, 150)
