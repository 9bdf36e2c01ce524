"""LTTB downsample, EWMA smoothing, retention enforcement vs local oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from dads_spark.rollup import (
    enforce_policy,
    enforce_retention,
    ewma_smooth,
    lttb_downsample,
    lttb_indices,
)


def test_lttb_indices_properties():
    rng = np.random.default_rng(7)
    t = np.arange(500, dtype=np.float64)
    v = rng.normal(size=500).cumsum()
    v[250] += 50.0  # planted extreme peak
    idx = lttb_indices(t, v, 40)
    assert len(idx) == 40
    assert idx[0] == 0 and idx[-1] == 499
    assert (np.diff(idx) > 0).all()
    assert 250 in idx, "LTTB must keep the dominant peak"
    # degenerate budgets
    assert list(lttb_indices(t[:5], v[:5], 10)) == [0, 1, 2, 3, 4]
    assert list(lttb_indices(t, v, 2)) == [0, 499]
    # deterministic
    assert (lttb_indices(t, v, 40) == idx).all()


def test_lttb_hand_example():
    # 7 points, budget 4 -> 2 interior buckets [1,3) and [3,6);
    # triangle areas are easy to verify by hand against the next centroid
    t = np.arange(7, dtype=np.float64)
    v = np.array([0.0, 1.0, 5.0, 0.0, 0.0, 2.0, 0.0])
    idx = lttb_indices(t, v, 4)
    assert idx[0] == 0 and idx[-1] == 6
    # bucket one {1,2}: vs a=(0,0), next centroid (4, 2/3):
    #   area(1)=|(0-4)(1-0)-(0-1)(2/3)|=3.33, area(2)=|(0-4)(5)-(0-2)(2/3)|=18.67
    assert idx[1] == 2
    # bucket two {3,4,5}: vs a=(2,5), next point (6,0):
    #   area(3)=|(2-6)(0-5)-(2-3)(0-5)|=15, area(4)=10, area(5)=3
    assert idx[2] == 3


def test_lttb_downsample_matches_local(spark):
    rng = np.random.default_rng(3)
    rows = []
    for dom in ("a.com", "b.com"):
        base = pd.Timestamp("2024-01-01")
        for i in range(300):
            rows.append((dom, base + pd.Timedelta(hours=i), float(rng.normal())))
    pdf = pd.DataFrame(rows, columns=["domain", "bucket_ts", "v"])
    df = spark.createDataFrame(pdf)
    got = (
        lttb_downsample(df, ["domain"], "bucket_ts", "v", 50)
        .toPandas()
        .sort_values(["domain", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert (got.groupby("domain").size() == 50).all()
    for dom, g in pdf.groupby("domain"):
        g = g.sort_values("bucket_ts").reset_index(drop=True)
        idx = lttb_indices(
            g["bucket_ts"].astype("datetime64[ns]").astype("int64").to_numpy(),
            g["v"].to_numpy(),
            50,
        )
        want = g.iloc[idx].reset_index(drop=True)
        sub = got[got.domain == dom].reset_index(drop=True)
        assert (sub["bucket_ts"].to_numpy() == want["bucket_ts"].to_numpy()).all()
        assert np.array_equal(sub["v"].to_numpy(), want["v"].to_numpy())


def test_ewma_matches_pandas(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "domain": ["x"] * 200 + ["y"] * 150,
            "bucket_ts": list(pd.date_range("2024-01-01", periods=200, freq="h"))
            + list(pd.date_range("2024-02-01", periods=150, freq="h")),
            "v": rng.normal(size=350),
        }
    )
    got = (
        ewma_smooth(spark.createDataFrame(pdf), ["domain"], "bucket_ts", "v", alpha=0.25)
        .toPandas()
        .sort_values(["domain", "bucket_ts"])
        .reset_index(drop=True)
    )
    for dom, g in pdf.groupby("domain"):
        g = g.sort_values("bucket_ts").reset_index(drop=True)
        want = g["v"].ewm(alpha=0.25, adjust=True).mean().to_numpy()
        sub = got[got.domain == dom].reset_index(drop=True)
        assert np.allclose(sub["ewma"].to_numpy(), want, atol=1e-12)
        assert np.allclose(
            sub["abs_resid"].to_numpy(), np.abs(g["v"].to_numpy() - want), atol=1e-12
        )


@pytest.fixture()
def hour_tier(spark):
    ts = pd.date_range("2024-01-01", periods=24 * 40, freq="h")  # 40 days
    pdf = pd.DataFrame(
        {"domain": "d.com", "bucket_ts": ts, "doc_count": np.arange(len(ts))}
    )
    return spark.createDataFrame(pdf)


def test_enforce_retention_horizon(spark, hour_tier):
    kept = enforce_retention(hour_tier, keep_seconds=10 * 86_400).toPandas()
    wm = pd.Timestamp("2024-01-01") + pd.Timedelta(hours=24 * 40 - 1)
    horizon = wm - pd.Timedelta(days=10)
    assert kept["bucket_ts"].min() == horizon
    assert kept["bucket_ts"].max() == wm
    assert len(kept) == 10 * 24 + 1  # inclusive horizon bound
    # keep_seconds=None keeps everything
    assert enforce_retention(hour_tier, None).count() == 24 * 40


def test_enforce_policy_shared_watermark(spark, hour_tier):
    day = hour_tier.withColumn(
        "bucket_ts", F.date_trunc("day", "bucket_ts")
    ).groupBy("domain", "bucket_ts").agg(F.sum("doc_count").alias("doc_count"))
    out = enforce_policy(
        {"hour": hour_tier, "day": day},
        {"hour": 7 * 86_400, "day": 30 * 86_400},
    )
    hr = out["hour"].toPandas()
    dy = out["day"].toPandas()
    wm = pd.Timestamp("2024-01-01") + pd.Timedelta(hours=24 * 40 - 1)
    assert hr["bucket_ts"].min() == wm - pd.Timedelta(days=7)
    # the day tier ages against the SAME hour-tier watermark
    assert dy["bucket_ts"].min() >= wm - pd.Timedelta(days=30)
    # horizon = 2024-02-09T23 - 30d = 2024-01-10T23: day buckets 01-11..02-09
    assert len(dy) == 30


def test_downsample_on_expiry_no_overlap_no_gap(spark):
    """Every raw hour appears exactly once: fine-grained if >= the
    day-snapped cut, inside exactly one day row otherwise."""
    import datetime as dt

    import pyspark.sql.functions as F

    from dads_spark.rollup import (
        cascade,
        downsample_on_expiry,
        rollup_from_raw,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=h, minutes=7), float(h % 9))
        for h in range(40 * 24)  # 40 days of hourly events
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    hour = rollup_from_raw(ev, ["event_type"], "ts", "value", "hour")
    day = cascade(hour, ["event_type"], "day")
    out = downsample_on_expiry(hour, day, keep_hour_seconds=14 * 86_400)
    pdf = out.toPandas()
    fine = pdf[pdf["resolution"] == "hour"]
    coarse = pdf[pdf["resolution"] == "day"]
    assert len(fine) > 0 and len(coarse) > 0
    # cut = day floor of (max hour bucket - 14d)
    wm = int(fine["bucket_sec"].max())
    cut = ((wm - 14 * 86_400) // 86_400) * 86_400
    assert fine["bucket_sec"].min() == cut  # boundary day stays fine
    assert coarse["bucket_sec"].max() == cut - 86_400  # no overlap
    # no gap: coarse days are contiguous from the first day to cut-1d
    days = sorted(coarse["bucket_sec"])
    assert days == list(range(days[0], cut, 86_400))
    # conservation: every raw event counted exactly once across resolutions
    assert int(pdf["doc_count"].sum()) == ev.count()


def test_asap_window_search_prefers_smoother_window():
    import numpy as np

    from dads_spark.rollup import asap_window_search

    rng = np.random.RandomState(11)
    n = 500
    noisy = 50 + rng.randn(n) * 3.0
    # SUSTAINED anomaly (the shape ASAP preserves): smoothing shrinks the
    # noise ~sqrt(w) while the 20-point block survives, so the smoothed
    # series is MORE heavy-tailed than raw and the kurtosis constraint
    # admits a window. (A single-point spike is the opposite case: any
    # smoothing flattens it, kurtosis falls, and the search keeps w=1 —
    # the paper's intended behavior.)
    noisy[250:270] += 25
    w, rough, kurt = asap_window_search(noisy)
    assert w > 1  # smoothing chosen
    # roughness strictly below the raw series' roughness
    assert rough < float(np.diff(noisy).std())
    # kurtosis preserved (>= raw kurtosis, the ASAP constraint)
    d = noisy - noisy.mean()
    k0 = float((d**4).mean() / (d.var() ** 2) - 3.0)
    assert kurt >= k0
    # single-point spike: constraint rejects every window -> w stays 1
    spiky = 50 + rng.randn(n) * 3.0
    spiky[300] += 100
    assert asap_window_search(spiky)[0] == 1


def test_asap_spark_matches_scalar_search(spark):
    import numpy as np
    import pandas as pd

    from dads_spark.rollup import asap_smooth_params, asap_window_search

    rng = np.random.RandomState(4)
    rows = []
    for et in ("a", "b"):
        for i in range(400):
            # several raw events per hour so doc_count varies
            for _ in range(int(rng.randint(1, 5))):
                rows.append((et, pd.Timestamp("2026-01-01") + pd.Timedelta(hours=i)))
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    ev = spark.createDataFrame(pdf, "event_type string, ts timestamp")
    got = {
        r["event_type"]: r
        for r in asap_smooth_params(ev, ["event_type"], "ts", None, "hour").collect()
    }
    for et, g in pdf.groupby("event_type"):
        counts = g.groupby(g["ts"].dt.floor("h")).size().sort_index().to_numpy()
        w, rough, kurt = asap_window_search(counts.astype(np.float64))
        q6 = lambda x: int(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5))  # noqa: E731
        assert got[et]["w_opt"] == w
        assert got[et]["roughness_q6"] == q6(rough)
        assert got[et]["kurtosis_q6"] == q6(kurt)
        assert got[et]["n_points"] == len(counts)
