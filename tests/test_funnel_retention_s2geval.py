"""Windowed funnel gap semantics, retention cost arithmetic, S2G
detection-eval metric helper."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dads_spark.rollup import retention_cost_plan, windowed_funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, sec long"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))


def test_windowed_funnel_gap_cuts(spark):
    rows = [
        (1, "view", 0), (1, "click", 100), (1, "purchase", 200),   # full
        (2, "view", 0), (2, "click", 4000),                        # click late
        (3, "view", 0), (3, "click", 50), (3, "purchase", 9999),   # buy late
        (4, "click", 10),                                          # no view
    ]
    out = {
        r.step: r.users
        for r in windowed_funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"], [1000, 1000],
        ).collect()
    }
    assert out == {1: 3, 2: 2, 3: 1}


def test_windowed_funnel_greedy_earliest_and_strict_order(spark):
    # click at the SAME second as view does not count (strictly after);
    # the greedy chain anchors on the EARLIEST view even when a later
    # view would have qualified the click
    rows = [
        (1, "view", 100), (1, "click", 100),
        (2, "view", 0), (2, "view", 500), (2, "click", 600),
    ]
    out = {
        r.step: r.users
        for r in windowed_funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click"], [200],
        ).collect()
    }
    assert out == {1: 2, 2: 0}


def test_windowed_funnel_rejects_bad_gaps(spark):
    with pytest.raises(ValueError):
        windowed_funnel(
            _ev(spark, [(1, "view", 0)]), "user_id", "ts", "event_type",
            ["view", "click"], [],
        )


def test_retention_cost_plan_horizons(spark):
    # hourly events across 3 days for one key
    rows = [(1, "a", 86400 * d + 3600 * h) for d in range(3) for h in range(4)]
    df = _ev(spark, rows)
    out = {
        r.tier: r
        for r in retention_cost_plan(
            df, ["event_type"], "ts", {"hour": (1, 10), "day": (2, 20)}
        ).collect()
    }
    h, d = out["hour"], out["day"]
    assert h.total_buckets == 12
    # horizon: buckets >= max_bucket - 1 day -> last day's 4 + the
    # boundary bucket exactly 1 day before the max
    assert h.retained_buckets == 5 and h.retained_bytes == 50
    assert d.total_buckets == 3 and d.retained_buckets == 3
    assert d.retained_bytes == 60 and d.retention_days == 2


def test_s2g_eval_metric_margin():
    import __spark_entry__ as em

    n = em._S2G_EVAL_N
    scores = np.zeros(n - 100)
    # peak just before the spike range (the documented lead)
    scores[int(n * 0.7) - 60] = 5.0
    top1, hit, p10 = em._s2g_eval_metrics(scores, 50)
    assert top1 == int(n * 0.7) - 60 and hit == 1
    # a peak far from both ranges is not a hit
    scores2 = np.zeros(n - 100)
    scores2[100] = 5.0
    _, hit2, _ = em._s2g_eval_metrics(scores2, 50)
    assert hit2 == 0
