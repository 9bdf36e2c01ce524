"""Unit tests for rollup.analytics: hand-computed expectations on tiny
constructed series (the DuckDB oracle gate in test_entry_compare covers the
cross-engine hashes; these pin the semantics themselves)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dads_spark.rollup import (
    counter_rate,
    mad_outliers,
    paa_sax,
    seasonal_outliers,
    time_weighted_avg,
)


def _series(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v", "id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_counter_rate_reset_semantics(spark):
    # counter 10 -> 25 -> 3 (reset) -> 9 within one hour: increase =
    # (25-10) + 3 + (9-3) = 24, one reset; first point contributes nothing
    df = _series(
        spark,
        [
            ("a", "2024-01-01 00:00:00", 10.0, 1),
            ("a", "2024-01-01 00:10:00", 25.0, 2),
            ("a", "2024-01-01 00:20:00", 3.0, 3),
            ("a", "2024-01-01 00:30:00", 9.0, 4),
        ],
    )
    out = counter_rate(df, ["k"], "ts", "v", "hour", order_cols=["id"]).toPandas()
    assert len(out) == 1
    assert out.increase.iloc[0] == pytest.approx(24.0)
    assert out.n_resets.iloc[0] == 1


def test_counter_rate_crosses_buckets(spark):
    # the lag spans the bucket boundary: the 01:00 point's delta (7) lands
    # in the 01:00 bucket (increase since the PREVIOUS sample, wherever it was)
    df = _series(
        spark,
        [
            ("a", "2024-01-01 00:50:00", 10.0, 1),
            ("a", "2024-01-01 01:05:00", 17.0, 2),
        ],
    )
    out = (
        counter_rate(df, ["k"], "ts", "v", "hour", order_cols=["id"])
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert pd.isna(out.increase.iloc[0])  # only the first point: no delta
    assert out.increase.iloc[1] == pytest.approx(7.0)


def test_time_weighted_avg_trapezoid(spark):
    # segments: 0->10min at (0+6)/2=3, 10->30min at (6+12)/2=9
    # twa = (3*600 + 9*1200) / 1800 = 7.0; point count 3
    df = _series(
        spark,
        [
            ("a", "2024-01-01 00:00:00", 0.0, 1),
            ("a", "2024-01-01 00:10:00", 6.0, 2),
            ("a", "2024-01-01 00:30:00", 12.0, 3),
        ],
    )
    out = time_weighted_avg(df, ["k"], "ts", "v", "hour").toPandas()
    assert len(out) == 1
    assert out.twa.iloc[0] == pytest.approx(7.0)
    assert out.n_points.iloc[0] == 3


def test_time_weighted_avg_single_point_bucket(spark):
    df = _series(spark, [("a", "2024-01-01 00:00:00", 42.0, 1)])
    out = time_weighted_avg(df, ["k"], "ts", "v", "hour").toPandas()
    assert out.twa.iloc[0] == pytest.approx(42.0)


def test_mad_outliers_flags_planted_spike(spark):
    rows = [("a", f"2024-01-01 00:{i:02d}:00", 10.0 + (i % 3), i) for i in range(20)]
    rows.append(("a", "2024-01-01 00:21:00", 500.0, 99))
    out = mad_outliers(_series(spark, rows), ["k"], "ts", "v", 5.0).toPandas()
    assert len(out) == 1
    assert out.value.iloc[0] == 500.0
    assert out.mad_score.iloc[0] > 100


def test_seasonal_outliers_hour_profile(spark):
    # hour-0 profile is tight around 10; one 100.0 spike breaks 3 sigma.
    # hour-1 rows keep their own profile and stay quiet.
    rows = [("a", f"2024-01-{d:02d} 00:00:00", 10.0 + 0.1 * (d % 5), d) for d in range(1, 21)]
    rows += [("a", f"2024-01-{d:02d} 01:00:00", 50.0 + (d % 7), 100 + d) for d in range(1, 21)]
    rows.append(("a", "2024-01-25 00:00:00", 100.0, 999))
    out = seasonal_outliers(_series(spark, rows), ["k"], "ts", "v", 3.0).toPandas()
    assert len(out) == 1
    assert out.hod.iloc[0] == 0
    assert out.value.iloc[0] == 100.0
    assert out.z_score.iloc[0] > 3


def test_paa_sax_frames_and_symbols(spark):
    # 8 points, frame_size 4: frame 0 mean 10, frame 1 mean 30.
    # series mean 20, stddev_pop 10.0498...; z = ±0.995 -> symbols 'a','d'
    rows = [("a", f"2024-01-01 00:0{i}:00", v, i) for i, v in enumerate([10.0] * 4 + [30.0] * 4)]
    out = (
        paa_sax(_series(spark, rows), ["k"], "ts", "v", 4, order_cols=["id"])
        .toPandas()
        .sort_values("frame")
        .reset_index(drop=True)
    )
    assert out.frame.tolist() == [0, 1]
    assert out.paa.tolist() == pytest.approx([10.0, 30.0])
    assert out.symbol.tolist() == ["a", "d"]


def test_series_xcorr_perfect_correlation_at_planted_lag(spark):
    from dads_spark.rollup import series_cross_correlation

    # series b is exactly series a shifted one hour: xcorr(lag=1) == 1.0
    rows = []
    vals = [10.0, 30.0, 20.0, 50.0, 40.0, 60.0, 25.0, 45.0]
    for i, v in enumerate(vals):
        rows.append(("a", f"2024-01-01 {i:02d}:30:00", v, i))
        rows.append(("b", f"2024-01-01 {i + 1:02d}:30:00", v, 100 + i))
    out = (
        series_cross_correlation(_series(spark, rows), "k", "ts", "v", "a", "b", 2)
        .toPandas().set_index("lag")
    )
    assert out.loc[1, "xcorr"] == pytest.approx(1.0)
    assert out.loc[1, "n_buckets"] == len(vals)
    assert abs(out.loc[0, "xcorr"]) < 1.0


def test_cohort_retention_matrix(spark):
    from dads_spark.rollup import cohort_retention

    # two cohorts: users 1,2 first active week of Jan 1 (Mon); user 3 the
    # following week. user 1 returns in week offset 1.
    rows = [
        ("x", "2024-01-02 10:00:00", 0.0, 1),
        ("x", "2024-01-03 10:00:00", 0.0, 2),
        ("x", "2024-01-09 10:00:00", 0.0, 1),   # user 1, offset 1
        ("x", "2024-01-10 10:00:00", 0.0, 3),   # new cohort
    ]
    df = _series(spark, rows).withColumnRenamed("id", "user_id")
    out = (
        cohort_retention(df, "user_id", "ts", "week")
        .toPandas()
        .set_index(["cohort_ts", "offset"])["n_active"]
        .to_dict()
    )
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-08", 0)] == 1


def test_paa_sax_quantized_matches_plain(spark):
    # quantize=10 on 1dp values: same paa (up to 4dp rounding) and symbols
    rows = [
        ("a", f"2024-01-01 00:{i:02d}:00", round(10.0 + 0.7 * i, 1), i)
        for i in range(32)
    ]
    df = _series(spark, rows)
    plain = (
        paa_sax(df, ["k"], "ts", "v", 8, order_cols=["id"])
        .toPandas().sort_values("frame").reset_index(drop=True)
    )
    quant = (
        paa_sax(df, ["k"], "ts", "v", 8, order_cols=["id"], quantize=10)
        .toPandas().sort_values("frame").reset_index(drop=True)
    )
    assert quant.paa.tolist() == pytest.approx(plain.paa.tolist(), abs=1e-4)
    assert quant.symbol.tolist() == plain.symbol.tolist()


def test_rolling_quantile_trailing_window(spark):
    from dads_spark.rollup import rolling_quantile

    # hourly points 0..5 with values 10,20,30,40,50,60; 3-bucket trailing
    # median: [10], [10,20], [10,20,30], [20,30,40], ...
    rows = [
        ("a", f"2024-01-01 0{h}:00:00", float((h + 1) * 10)) for h in range(6)
    ]
    pdf = pd.DataFrame(rows, columns=["k", "bucket_ts", "v"])
    pdf["bucket_ts"] = pd.to_datetime(pdf["bucket_ts"])
    df = spark.createDataFrame(pdf)
    out = (
        rolling_quantile(df, ["k"], "bucket_ts", "v", q=0.5, window_buckets=3)
        .toPandas()
        .sort_values("bucket_ts")
    )
    assert out["rolling_q"].tolist() == [10.0, 15.0, 20.0, 30.0, 40.0, 50.0]
    assert out["n_in_window"].tolist() == [1, 2, 3, 3, 3, 3]


def test_rolling_quantile_gap_shrinks_window(spark):
    from dads_spark.rollup import rolling_quantile

    # a 5-hour gap: the trailing 3-bucket RANGE frame must NOT reach back
    # across it (event-time bounded, unlike a ROWS frame)
    rows = [
        ("a", "2024-01-01 00:00:00", 100.0),
        ("a", "2024-01-01 01:00:00", 200.0),
        ("a", "2024-01-01 07:00:00", 6.0),
    ]
    pdf = pd.DataFrame(rows, columns=["k", "bucket_ts", "v"])
    pdf["bucket_ts"] = pd.to_datetime(pdf["bucket_ts"])
    df = spark.createDataFrame(pdf)
    out = (
        rolling_quantile(df, ["k"], "bucket_ts", "v", q=0.5, window_buckets=3)
        .toPandas()
        .sort_values("bucket_ts")
    )
    assert out["rolling_q"].tolist() == [100.0, 150.0, 6.0]
    assert out["n_in_window"].tolist() == [1, 2, 1]


def test_hampel_filter_flags_spike_not_step(spark):
    import pandas as pd

    from dads_spark.rollup import hampel_filter

    rows = []
    t0 = pd.Timestamp("2026-01-01")
    # constant 3/hour with a single-hour spike of 40 at hour 20, then a
    # SUSTAINED step to 10 from hour 40 (a step is a regime change, not a
    # spike: once the window's median catches up it must NOT flag)
    for h in range(80):
        c = 3
        if h == 20:
            c = 40
        if h >= 40:
            c = 10
        for _ in range(c):
            rows.append(("a", t0 + pd.Timedelta(hours=h)))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"]),
        "event_type string, ts timestamp",
    )
    out = {
        int((r["bucket_ts"] - t0.to_pydatetime()).total_seconds() // 3600): r
        for r in hampel_filter(ev, ["event_type"], "ts", half_window=5, k=3).collect()
    }
    assert out[20]["is_spike"]          # the point spike
    assert out[20]["med"] == 3          # median robust to the spike itself
    assert not out[19]["is_spike"] and not out[21]["is_spike"]
    # interior of the step regime: med=10, deviations 0 -> not spikes
    assert not out[60]["is_spike"] and out[60]["med"] == 10
    # hours flagged overall: ONLY the spike and (possibly) the step edge
    flagged = {h for h, r in out.items() if r["is_spike"]}
    assert 20 in flagged and flagged <= {20, 38, 39, 40, 41, 42}


def test_hampel_filter_exact_integer_columns(spark):
    import pandas as pd

    from dads_spark.rollup import hampel_filter

    rows = []
    t0 = pd.Timestamp("2026-01-01")
    for h in range(30):
        for _ in range((h * 7) % 5 + 1):
            rows.append(("a", t0 + pd.Timedelta(hours=h)))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"]),
        "event_type string, ts timestamp",
    )
    df = hampel_filter(ev, ["event_type"], "ts")
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in hampel_filter(ev.repartition(7), ["event_type"], "ts").collect())
    assert a == b  # partition-invariant (exact integers everywhere)


def test_session_patterns_support_semantics(spark):
    import pandas as pd

    from dads_spark.rollup import session_patterns

    rows = []
    t0 = pd.Timestamp("2026-01-01")
    # users 1,2 both do v>c>p; user 1 does it twice (occurrences 3, support 2)
    for u, seq in ((1, "vcpvcp"), (2, "vcp"), (3, "ppp")):
        for i, ch in enumerate(seq):
            rows.append((len(rows), u, {"v": "view", "c": "click", "p": "buy"}[ch],
                         (t0 + pd.Timedelta(minutes=i)).to_pydatetime()))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["pattern"]: r for r in session_patterns(
        ev, "user_id", "event_type", "ts", "event_id", k=3, min_support=2
    ).collect()}
    assert out["view>click>buy"]["support"] == 2
    # user 1's 6-event stream has 2 non-overlap + 2 bridging windows
    assert out["view>click>buy"]["n_occurrences"] == 3
    assert "buy>buy>buy" not in out  # support 1 < 2 pruned


def test_exp_histogram_exact_power_of_two_buckets(spark):
    from dads_spark.rollup import exp_histogram

    rows = [(1, "a", v) for v in
            [0.0, 0.9, 1.0, 1.5, 2.0, 3.99, 4.0, 7.0, 8.0, 255.0, 256.0]]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["bucket"]: r for r in exp_histogram(ev, ["event_type"], "value").collect()}
    assert out[0]["n"] == 2                       # floor(v)=0
    assert out[1]["n"] == 2 and out[1]["v_floor_max"] == 1   # [1,2)
    assert out[2]["n"] == 2 and out[2]["v_floor_min"] == 2   # [2,4)
    assert out[3]["n"] == 2                       # [4,8): 4.0, 7.0
    assert out[4]["n"] == 1 and out[4]["v_floor_min"] == 8   # [8,16)
    assert out[8]["n"] == 1 and out[9]["n"] == 1  # 255 -> len 8; 256 -> len 9


# ------------------------------------------------------ decayed_popularity
def test_decayed_popularity_scalar_reference(spark):
    from dads_spark.rollup import decayed_popularity

    # events at known ages (hours) relative to the max ts
    ages_h = {"a": [0, 1, 23, 24, 48, 700], "b": [0, 0, 0]}
    ref = 1_000_000_000
    rows = [
        (k, ref - h * 3600) for k, hs in ages_h.items() for h in hs
    ]
    df = spark.createDataFrame(rows, "k string, ts_e long").withColumn(
        "ts", F.col("ts_e").cast("timestamp")
    )
    out = {
        r["k"]: r
        for r in decayed_popularity(
            df, ["k"], "ts", 3600, 24, 672, ref_ts=ref
        ).collect()
    }
    # a: ages 0,1,23h -> hl 0 (w 2^28); 24,48h -> hl 1,2; 700h excluded
    want_a = 3 * 2**28 + 2**27 + 2**26
    assert out["a"]["n_events"] == 5
    assert out["a"]["score_scaled"] == want_a
    assert out["a"]["score"] == want_a / 2**28
    assert out["b"]["score"] == 3.0  # three fresh events, weight 1 each
    with pytest.raises(ValueError):
        decayed_popularity(df, ["k"], "ts", 3600, 24, 670)


def test_decayed_popularity_partitioning_invariant(spark):
    from dads_spark.rollup import decayed_popularity

    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        ("k%d" % (i % 3), 2_000_000_000 - int(rng.integers(0, 700 * 3600)))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, ts_e long").withColumn(
        "ts", F.col("ts_e").cast("timestamp")
    )
    a = decayed_popularity(df, ["k"], "ts").orderBy("k").collect()
    b = (
        decayed_popularity(df.repartition(13), ["k"], "ts")
        .orderBy("k")
        .collect()
    )
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    # derived-ref anchor equals explicit max anchor
    ref = max(t for _, t in rows)
    c = decayed_popularity(df, ["k"], "ts", ref_ts=ref).orderBy("k").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in c]


def test_calendar_compare_wow(spark):
    from dads_spark.rollup import calendar_compare

    wk = 168 * 3600
    rows = (
        [("a", 0, 3), ("a", wk, 5)]          # same hour, both weeks
        + [("a", 7200, 2)]                   # only previous week
        + [("a", wk + 10800, 4)]             # only current week
    )
    flat = [
        (k, t + i) for k, t, n in rows for i in range(n)
    ]
    df = spark.createDataFrame(flat, "k string, ts_e long").withColumn(
        "ts", F.col("ts_e").cast("timestamp")
    )
    got = {
        r["bucket_ts"]: (r["n_cur"], r["n_prev"], r["delta"])
        for r in calendar_compare(df, ["k"], "ts", "hour", 168).collect()
    }
    assert got[wk] == (5, 3, 2)          # 5 this week vs 3 last week
    assert got[wk + 7200] == (0, 2, -2)  # vanished hour
    assert got[wk + 10800] == (4, 0, 4)  # new hour
    assert got[0] == (3, 0, 3)           # first week has no predecessor


def test_series_churn_new_vs_returning(spark):
    from dads_spark.rollup import series_churn

    day = 86400
    rows = [
        # series u1: born day 0, returns day 1
        ("m", "u1", 10), ("m", "u1", 20), ("m", "u1", day + 5),
        # series u2: born day 1 only
        ("m", "u2", day + 7),
        # a second metric, independent first-day accounting
        ("n", "u1", day + 9),
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id string, ts_e long").withColumn(
        "ts", F.col("ts_e").cast("timestamp")
    )
    got = {
        (r["metric"], r["day_sec"]): (r["n_active"], r["n_new"], r["n_returning"])
        for r in series_churn(df, "event_type", "user_id", "ts").collect()
    }
    assert got[("m", 0)] == (1, 1, 0)        # u1 born
    assert got[("m", day)] == (2, 1, 1)      # u2 born, u1 returns
    assert got[("n", day)] == (1, 1, 0)      # per-metric first day
    # duplicates within a day collapse: day-0 has ONE active despite 2 events
    assert len(got) == 3


def test_correlation_matrix_perfect_anti_and_constant(spark):
    from dads_spark.rollup import correlation_matrix

    rows = []
    for h in range(6):
        rows.append(("up", h * 3600 + 5, float(h + 1)))       # 1..6
        rows.append(("dbl", h * 3600 + 9, float(2 * h + 2)))  # 2..12, r=+1
        rows.append(("down", h * 3600 + 3, float(6 - h)))     # 6..1, r=-1
        rows.append(("flat", h * 3600 + 1, 5.0))              # zero variance
    df = spark.createDataFrame(
        rows, "event_type string, ts_e long, value double"
    ).withColumn("ts", F.col("ts_e").cast("timestamp"))
    got = {
        (r["metric_a"], r["metric_b"]): (r["n_buckets"], r["r"])
        for r in correlation_matrix(df, "event_type").collect()
    }
    assert got[("dbl", "up")][0] == 6
    assert abs(got[("dbl", "up")][1] - 1.0) < 1e-12
    assert abs(got[("down", "up")][1] + 1.0) < 1e-12
    # zero-variance metric yields no pairs at all
    assert not any("flat" in k for k in got)
    # canonical orientation only: (a, b) with a < b, never both
    assert ("up", "dbl") not in got


def test_correlation_matrix_pairwise_complete(spark):
    from dads_spark.rollup import correlation_matrix

    # metric 'y' misses bucket 2: the (x, y) pair must use only the
    # 2 shared buckets, not zero-fill
    rows = [
        ("x", 0, 1.0), ("x", 3600, 2.0), ("x", 7200, 3.0),
        ("y", 0, 10.0), ("y", 3600, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts_e long, value double"
    ).withColumn("ts", F.col("ts_e").cast("timestamp"))
    out = correlation_matrix(df, "event_type").collect()
    assert len(out) == 1 and out[0]["n_buckets"] == 2


def test_staleness_report_gaps_and_stale_flag(spark):
    from dads_spark.rollup import staleness_report

    rows = [
        # u1: regular until t=900, then silent while corpus runs to 2000
        ("m", "u1", 0), ("m", "u1", 300), ("m", "u1", 900),
        # u2: one mid-history gap (300 -> 1400 > lookback) but live at end
        ("m", "u2", 300), ("m", "u2", 1400), ("m", "u2", 2000),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id string, ts_e long"
    ).withColumn("ts", F.col("ts_e").cast("timestamp"))
    got = {
        r["series"]: (r["last_ts_sec"], r["n_samples"], r["n_gaps"], r["stale"])
        for r in staleness_report(
            df, "event_type", "user_id", "ts", lookback_s=600
        ).collect()
    }
    assert got["u1"] == (900, 3, 0, 1)   # quiet > 600s behind corpus max
    assert got["u2"] == (2000, 3, 1, 0)  # gapped historically, live now
