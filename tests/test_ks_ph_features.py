"""Exact KS drift, Page-Hinkley detector, per-series feature battery."""

from __future__ import annotations

import datetime as dt

import numpy as np

from dads_spark.rollup import ks_drift, page_hinkley, ts_features

_T0 = dt.datetime(2024, 1, 1)


def _rows(key, days_values):
    """days_values: {day_index: [values]} -> (key, ts, value) rows
    spread one value per minute inside each day."""
    out = []
    for d, vals in days_values.items():
        for i, v in enumerate(vals):
            out.append((key, _T0 + dt.timedelta(days=d, minutes=i), float(v)))
    return out


def test_ks_identical_day_scores_zero(spark):
    base = list(np.linspace(0, 10, 50))
    rows = _rows("k", {0: base, 8: base})  # day 8 == the whole baseline
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = ks_drift(df, ["event_type"], "ts", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert r["ks_numer"] == 0
    assert r["n_period"] == 50 and r["n_baseline"] == 50


def test_ks_shifted_day_maximal_vs_mild(spark):
    base = list(np.linspace(0, 10, 50))
    shifted = [v + 100 for v in base]  # disjoint support -> D = 1
    mild = [v + 0.11 for v in base]  # small shift -> small D
    rows = _rows("k", {0: base, 8: shifted, 9: mild})
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {r["bucket_ts"].day: r for r in
           ks_drift(df, ["event_type"], "ts", "value").collect()}
    big, small = out[9], out[10]  # Jan 9 / Jan 10
    assert big["ks_numer"] == 50 * 50  # D = 1 exactly
    assert 0 < small["ks_numer"] < big["ks_numer"]


def test_ks_exact_matches_numpy_two_sample(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(5, 2, 200)
    day = rng.normal(5.8, 2, 120)
    rows = _rows("k", {0: base, 8: day})
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    r = ks_drift(df, ["event_type"], "ts", "value").collect()[0]
    # brute-force exact two-sample KS numerator at every observed value
    pts = np.unique(np.concatenate([base, day]))
    cn = np.searchsorted(np.sort(day), pts, side="right")
    cm = np.searchsorted(np.sort(base), pts, side="right")
    num = int(np.max(np.abs(cn * len(base) - cm * len(day))))
    assert r["ks_numer"] == num
    assert r["n_period"] == 120 and r["n_baseline"] == 200


def test_page_hinkley_alarms_on_planted_shift_only(spark):
    steady = [10.0] * 200
    shifted = [10.0] * 100 + [60.0] * 100  # big persistent upward shift
    rows = []
    for i, v in enumerate(steady):
        rows.append(("flat", _T0 + dt.timedelta(minutes=i), v, i))
    for i, v in enumerate(shifted):
        rows.append(("shift", _T0 + dt.timedelta(minutes=i), v, i))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    out = {r["event_type"]: r for r in page_hinkley(
        df, ["event_type"], "ts", "value",
        order_cols=["event_id"], delta=0.0, lam=50.0,
    ).collect()}
    assert out["flat"]["n_alarms"] == 0
    assert out["flat"]["first_alarm_pos"] == 0
    assert out["flat"]["max_ph_nano"] == 0  # constant series: zero deviations
    assert out["shift"]["n_alarms"] > 0
    assert out["shift"]["first_alarm_pos"] > 100  # only after the shift
    assert out["shift"]["n"] == 200


def test_page_hinkley_exact_vs_numpy_reference(spark):
    rng = np.random.default_rng(3)
    vals = np.round(rng.normal(20, 5, 300), 2)
    vals[150:] += 30
    rows = [("k", _T0 + dt.timedelta(minutes=i), float(v), i)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    r = page_hinkley(df, ["event_type"], "ts", "value",
                     order_cols=["event_id"], lam=50.0).collect()[0]
    # scalar replica of the documented integer arithmetic
    xq = np.array([int(np.sign(v)) * int(np.floor(abs(v) * 1e6 + 0.5))
                   for v in vals], dtype=object)
    ph_max, m, mn, alarms, first = 0, 0, 0, 0, 0
    s = 0
    for t, x in enumerate(xq, start=1):
        s += int(x)
        d = int(x) * t - s
        dev = (1 if d > 0 else -1 if d < 0 else 0) * (
            (abs(d) * 1000 + t // 2) // t
        )
        m += dev
        mn = min(mn, m)
        p = m - mn
        ph_max = max(ph_max, p)
        if p > 50_000_000_000:
            alarms += 1
            if first == 0:
                first = t
    assert r["max_ph_nano"] == ph_max
    assert r["n_alarms"] == alarms
    assert r["first_alarm_pos"] == first


def test_ts_features_hand_computed_battery(spark):
    # series: 1, 5, 1, 5, 5, 1  -> mean 3, above = [F,T,F,T,T,F]
    vals = [1.0, 5.0, 1.0, 5.0, 5.0, 1.0]
    rows = [("k", _T0 + dt.timedelta(minutes=i), v, i)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    r = ts_features(df, ["event_type"], "ts", "value",
                    order_cols=["event_id"]).collect()[0]
    assert r["n"] == 6
    assert r["sum_q6"] == 18_000_000
    assert r["min_q6"] == 1_000_000 and r["max_q6"] == 5_000_000
    assert r["n_above"] == 3
    assert r["n_cross"] == 4  # F->T, T->F, F->T, (T stays), T->F
    assert r["longest_above"] == 2  # the 5,5 run
    assert r["first_max_pos"] == 2  # first 5 is position 2
    assert r["abs_change_sum_q6"] == 16_000_000  # 4+4+4+0+4 in q6
    assert r["n_distinct_q6"] == 2


def test_ts_features_constant_and_single_point(spark):
    rows = [("c", _T0 + dt.timedelta(minutes=i), 7.0, i) for i in range(4)]
    rows += [("one", _T0, 3.5, 0)]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    out = {r["event_type"]: r for r in ts_features(
        df, ["event_type"], "ts", "value", order_cols=["event_id"]
    ).collect()}
    c = out["c"]
    # nothing is STRICTLY above the mean of a constant series
    assert c["n_above"] == 0 and c["n_cross"] == 0
    assert c["longest_above"] == 0
    assert c["abs_change_sum_q6"] == 0
    one = out["one"]
    assert one["n"] == 1 and one["abs_change_sum_q6"] == 0
    assert one["first_max_pos"] == 1
