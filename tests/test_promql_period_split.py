"""Tests for the round-4 session-5 operators: PromQL extrapolated
increase/rate, top-down forecast reconciliation, exact-integer ACF period
detection, curriculum ordering, and temporal split with embargo."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- promql
def _prom_increase(samples, t, window):
    """Scalar reference of Prometheus extrapolatedRate (functions.go):
    samples = [(ts, value)] sorted, evaluated at t over (t-window, t]."""
    inw = [(ts, v) for ts, v in samples if t - window < ts <= t]
    if len(inw) < 2 or inw[-1][0] == inw[0][0]:
        return None
    raw = inw[-1][1] - inw[0][1]
    resets = 0
    for (p_ts, p_v), (c_ts, c_v) in zip(inw, inw[1:]):
        if c_v < p_v:
            raw += p_v
            resets += 1
    si = float(inw[-1][0] - inw[0][0])
    dts = float(inw[0][0] - (t - window))
    dte = float(t - inw[-1][0])
    avg = si / (len(inw) - 1)
    thr = avg * 1.1
    if raw > 0 and inw[0][1] >= 0:
        dtz = si * (inw[0][1] / raw)
        if dtz < dts:
            dts = dtz
    ext = si
    ext += dts if dts < thr else avg / 2.0
    ext += dte if dte < thr else avg / 2.0
    return raw * (ext / si), resets, raw


def test_extrapolated_increase_matches_scalar_reference(spark):
    from dads_spark.rollup import extrapolated_increase

    rng = np.random.default_rng(7)
    # one counter with resets: cumulative positive increments mod 500
    ts = np.sort(rng.choice(np.arange(0, 40_000, 7), 300, replace=False))
    incs = rng.integers(1, 60, len(ts))
    counter = np.cumsum(incs) % 500
    rows = [("s1", int(i), int(t), int(v)) for i, (t, v) in enumerate(zip(ts, counter))]
    df = spark.createDataFrame(rows, "k string, id long, ts_e long, v long")
    out = (
        extrapolated_increase(df, ["k"], "ts_e", "v", window_s=7200,
                              step_s=3600, order_cols=["id"])
        .orderBy("eval_ts")
        .collect()
    )
    assert len(out) > 5
    samples = list(zip(ts.tolist(), counter.tolist()))
    got = {r["eval_ts"]: r for r in out}
    # every eval time the reference says is scoreable must be present
    t0 = ((int(ts[0]) + 3599) // 3600) * 3600
    for t in range(t0, int(ts[-1]) + 7200, 3600):
        ref = _prom_increase(samples, t, 7200)
        if ref is None:
            assert t not in got
            continue
        inc, resets, raw = ref
        r = got[t]
        assert r["n_resets"] == resets
        assert r["raw_delta"] == raw
        assert r["increase"] == pytest.approx(inc, rel=1e-12)
        assert r["rate"] == pytest.approx(inc / 7200.0, rel=1e-12)


def test_extrapolated_increase_window_membership(spark):
    from dads_spark.rollup import extrapolated_increase

    # two samples exactly at window edges: ts=0 is NOT in (3600-7200, 3600]?
    # it is (0 > -3600). At eval 7200 the window is (0, 7200] so ts=0 drops.
    df = spark.createDataFrame(
        [("a", 1, 0, 10), ("a", 2, 3600, 20), ("a", 3, 7200, 35)],
        "k string, id long, ts_e long, v long",
    )
    out = {
        r["eval_ts"]: r
        for r in extrapolated_increase(
            df, ["k"], "ts_e", "v", 7200, 3600, ["id"]
        ).collect()
    }
    # eval 3600: samples {0, 3600}; eval 7200: {3600, 7200} (0 excluded);
    # eval 10800: {7200} alone -> filtered (n<2)
    assert out[3600]["n_samples"] == 2
    assert out[7200]["n_samples"] == 2
    assert out[7200]["raw_delta"] == 15
    assert 10800 not in out
    # eval 0: window (-7200, 0] holds only ts=0 -> filtered
    assert 0 not in out


def test_extrapolated_increase_rejects_bad_window():
    from dads_spark.rollup import extrapolated_increase

    with pytest.raises(ValueError):
        extrapolated_increase(None, ["k"], window_s=5000, step_s=3600)


# ------------------------------------------------------------- reconcile
def test_topdown_reconcile_coherent(spark):
    from dads_spark.rollup import topdown_reconcile

    children = spark.createDataFrame(
        [("a", 70), ("b", 20), ("c", 10)], "k string, cnt long"
    )
    parent = spark.createDataFrame([(120.0,)], "parent_fc double")
    out = topdown_reconcile(children, parent, ["k"], "cnt", "parent_fc")
    rows = {r["k"]: r for r in out.collect()}
    assert rows["a"]["share"] == pytest.approx(0.7)
    assert rows["a"]["reconciled"] == pytest.approx(84.0)
    # coherence: children sum exactly to the parent forecast
    total = sum(r["reconciled"] for r in rows.values())
    assert total == pytest.approx(120.0, abs=1e-9)
    assert sum(r["share"] for r in rows.values()) == pytest.approx(1.0)


# ----------------------------------------------------------- periodicity
def test_acf_dominant_period_exact(spark):
    from dads_spark.rollup import acf_dominant_period

    # period-24 sawtooth plus a flat series; sparse representation with
    # zeros omitted must reconstruct the dense grid
    n = 240
    x = np.tile(np.arange(24), n // 24)  # exact period 24
    rows = [
        ("p24", int(i), int(v)) for i, v in enumerate(x) if v != 0
    ] + [("flat", 0, 5), ("flat", n - 1, 5)]
    df = spark.createDataFrame(rows, "k string, h_idx long, cnt long")
    out = {r["k"]: r for r in acf_dominant_period(
        df, ["k"], "h_idx", "cnt", lag_lo=2, lag_hi=48).collect()}
    assert out["p24"]["period"] == 24
    assert out["p24"]["n_buckets"] == n
    # exact rational check vs NumPy int64 reference
    y = n * x.astype(np.int64) - np.int64(x.sum())
    assert out["p24"]["acf_den"] == int(np.dot(y, y))
    assert out["p24"]["acf_num"] == int(np.dot(y[:-24], y[24:]))
    # perfect tiling: acf(24) = (n-24)/n exactly (num sums n-k terms of
    # the same squared profile the denominator sums n of)
    assert out["p24"]["acf_num"] * n == out["p24"]["acf_den"] * (n - 24)
    # the flat-ish series: mostly zeros, y not constant, still emits; a
    # truly constant series (den == 0) must be dropped
    const = spark.createDataFrame(
        [("c", i, 3) for i in range(60)], "k string, h_idx long, cnt long"
    )
    assert acf_dominant_period(const, ["k"], "h_idx", "cnt").count() == 0


def test_acf_period_tie_breaks_smallest_lag(spark):
    from dads_spark.rollup import acf_dominant_period

    # period-4 square wave: lags 4, 8, 12... all tie at perfect
    # autocorrelation shape; smallest (4) must win
    x = np.tile([9, 1, 1, 1], 30)
    df = spark.createDataFrame(
        [("s", int(i), int(v)) for i, v in enumerate(x)],
        "k string, h_idx long, cnt long",
    )
    out = acf_dominant_period(df, ["k"], "h_idx", "cnt", 2, 48).collect()[0]
    assert out["period"] == 4


# ------------------------------------------------------------ curriculum
def test_curriculum_order_is_interleaved_permutation(spark):
    from dads_spark.ops import curriculum_order

    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(101)], "doc_id long, q long"
    )
    out = curriculum_order(df, "doc_id", "q", n_tiers=4).collect()
    assert len(out) == 101
    pos = sorted(r["pos"] for r in out)
    assert pos == list(range(1, 102))  # permutation of 1..N
    for r in out:
        assert (r["pos"] - r["tier"]) % 4 == 0  # round-robin structure
    # tiers are equal-fill (ntile): sizes 26,25,25,25
    sizes = pd.Series([r["tier"] for r in out]).value_counts()
    assert sorted(sizes.tolist()) == [25, 25, 25, 26]
    # repartition-stability: same result at different parallelism
    out2 = curriculum_order(df.repartition(7), "doc_id", "q", 4).collect()
    assert {(r["doc_id"], r["pos"]) for r in out} == {
        (r["doc_id"], r["pos"]) for r in out2
    }


# ---------------------------------------------------------------- split
def test_temporal_split_counts_and_embargo(spark):
    from dads_spark.ops import temporal_split

    rows = [
        (i, "k%d" % (i % 2), 1_000_000 + i * 600) for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts_e long"
    ).withColumn("ts", F.col("ts_e").cast("timestamp"))
    out = temporal_split(
        df, ["k"], "ts", "event_id", train_pct=80, embargo_s=3600
    ).collect()
    byk: dict[str, list] = {}
    for r in out:
        byk.setdefault(r["k"], []).append(r)
    for k, rs in byk.items():
        n = len(rs)
        train = [r for r in rs if r["split"] == "train"]
        emb = [r for r in rs if r["split"] == "embargo"]
        test = [r for r in rs if r["split"] == "test"]
        assert len(train) == n * 80 // 100
        cut_ts = max(r["ts_e"] for r in train)
        # every train row precedes every non-train row
        assert all(r["ts_e"] <= min(x["ts_e"] for x in emb + test)
                   for r in train)
        assert all(r["ts_e"] <= cut_ts + 3600 for r in emb)
        assert all(r["ts_e"] > cut_ts + 3600 for r in test)
        # embargo is non-trivial here: 3600s covers 6 samples per key
        assert len(emb) >= 1


def test_temporal_split_all_test_when_pct_zero(spark):
    from dads_spark.ops import temporal_split

    df = spark.createDataFrame(
        [(1, "a", 1000), (2, "a", 2000)], "event_id long, k string, ts_e long"
    ).withColumn("ts", F.col("ts_e").cast("timestamp"))
    out = temporal_split(df, ["k"], "ts", "event_id", 0, 3600).collect()
    assert {r["split"] for r in out} == {"test"}


# --------------------------------------------------------- predict_linear
def test_predict_linear_matches_polyfit(spark):
    from dads_spark.rollup import predict_linear

    rng = np.random.default_rng(11)
    ts = np.sort(rng.choice(np.arange(0, 30_000, 13), 200, replace=False))
    vals = rng.integers(-500, 5000, len(ts))
    rows = [("g1", int(t), int(v)) for t, v in zip(ts, vals)]
    df = spark.createDataFrame(rows, "k string, ts_e long, v long")
    out = predict_linear(
        df, ["k"], "ts_e", "v", window_s=7200, step_s=3600, horizon_s=900
    ).collect()
    assert len(out) > 3
    for r in out:
        t = r["eval_ts"]
        inw = [(x, y) for x, y in zip(ts, vals) if t - 7200 < x <= t]
        assert r["n_samples"] == len(inw)
        x = np.array([a - t for a, _ in inw], dtype=float)
        y = np.array([b for _, b in inw], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert r["slope"] == pytest.approx(slope, rel=1e-9, abs=1e-9)
        assert r["predicted"] == pytest.approx(
            intercept + slope * 900.0, rel=1e-9, abs=1e-9
        )


def test_predict_linear_exact_on_a_line(spark):
    """Samples exactly on v = 3*ts + 7: slope is exactly 3 and the
    prediction lands exactly on the line (integer moments, one clean
    division)."""
    from dads_spark.rollup import predict_linear

    rows = [("k", int(t), int(3 * t + 7)) for t in range(0, 7200, 600)]
    df = spark.createDataFrame(rows, "k string, ts_e long, v long")
    out = predict_linear(
        df, ["k"], "ts_e", "v", window_s=7200, step_s=3600, horizon_s=100
    ).collect()
    assert out
    for r in out:
        assert r["slope"] == pytest.approx(3.0, abs=1e-12)
        # line value at eval_ts + horizon
        assert r["predicted"] == pytest.approx(
            3.0 * (r["eval_ts"] + 100) + 7.0, rel=1e-12
        )


def test_predict_linear_requires_two_distinct_ts(spark):
    from dads_spark.rollup import predict_linear

    df = spark.createDataFrame(
        [("k", 100, 5), ("k", 100, 9)], "k string, ts_e long, v long"
    )
    out = predict_linear(
        df, ["k"], "ts_e", "v", window_s=7200, step_s=3600
    ).collect()
    assert out == []  # degenerate x variance filtered, no divide-by-zero
    with pytest.raises(ValueError):
        predict_linear(df, ["k"], window_s=5000, step_s=3600)


# ------------------------------------------------------- histogram_quantile
def _hq(spark, rows, q):
    from dads_spark.rollup import histogram_quantile

    df = spark.createDataFrame(rows, "k string, le double, cum_count long")
    return {
        r["k"]: (r["n_obs"], r["quantile"])
        for r in histogram_quantile(df, ["k"], q).collect()
    }


def test_histogram_quantile_interpolation(spark):
    inf = float("inf")
    rows = [("a", 1.0, 2), ("a", 2.0, 5), ("a", 4.0, 9), ("a", inf, 10)]
    # rank=5 -> bucket le=2 owns it exactly: 1 + 1*(5-2)/(5-2) = 2.0
    assert _hq(spark, rows, 0.5)["a"] == (10, 2.0)
    # rank=9 -> bucket le=4: 2 + 2*(9-5)/(9-5) = 4.0
    assert _hq(spark, rows, 0.9)["a"] == (10, 4.0)
    # rank=9.5 -> +Inf bucket owns -> highest finite upper bound
    assert _hq(spark, rows, 0.95)["a"] == (10, 4.0)
    # rank=2.5 -> mid-bucket: 1 + 1*(2.5-2)/(5-2)
    got = _hq(spark, rows, 0.25)["a"][1]
    assert abs(got - (1.0 + 0.5 / 3.0)) < 1e-12


def test_histogram_quantile_edge_cases(spark):
    inf = float("inf")
    # first bucket owns, positive bound -> lower bound 0 (quantile.go)
    rows = [("a", 1.0, 8), ("a", inf, 10)]
    assert _hq(spark, rows, 0.5)["a"][1] == 0.625  # 0 + 1*(5/8)
    # first bucket owns, bound <= 0 -> return the bound itself
    rows = [("b", -1.0, 3), ("b", 1.0, 4), ("b", inf, 5)]
    assert _hq(spark, rows, 0.5)["b"][1] == -1.0
    # monotonic repair: dip 5->3 is clamped to 5 before ranking
    rows = [("c", 1.0, 5), ("c", 2.0, 3), ("c", 4.0, 9), ("c", inf, 10)]
    assert _hq(spark, rows, 0.5)["c"][1] == 1.0  # rank 5 owned by le=1
    # dropped groups: no +Inf bucket / single bucket / zero observations
    rows = [("d", 1.0, 5), ("d", 4.0, 9)]
    assert "d" not in _hq(spark, rows, 0.5)
    rows = [("e", inf, 10)]
    assert "e" not in _hq(spark, rows, 0.5)
    rows = [("f", 1.0, 0), ("f", inf, 0)]
    assert "f" not in _hq(spark, rows, 0.5)


def test_histogram_quantile_multi_q_single_pass(spark):
    from dads_spark.rollup import histogram_quantile

    inf = float("inf")
    rows = [("a", 1.0, 2), ("a", 2.0, 5), ("a", 4.0, 9), ("a", inf, 10)]
    df = spark.createDataFrame(rows, "k string, le double, cum_count long")
    got = {
        r["q"]: r["quantile"]
        for r in histogram_quantile(df, ["k"], [0.5, 0.9, 0.95]).collect()
    }
    # each q matches its single-q twin exactly
    assert got[0.5] == 2.0 and got[0.9] == 4.0 and got[0.95] == 4.0
    assert len(got) == 3


def test_histogram_quantile_rejects_bad_q():
    import pytest as _pytest

    from dads_spark.rollup import histogram_quantile

    with _pytest.raises(ValueError):
        histogram_quantile(None, ["k"], 1.0)
    with _pytest.raises(ValueError):
        histogram_quantile(None, ["k"], [0.5, 1.0])
    with _pytest.raises(ValueError):
        histogram_quantile(None, ["k"], [])
