"""Multi-tier range router (rollup/router.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.rollup import (
    cascade,
    range_segments,
    rollup_from_raw,
    route_range,
)

H, D, W = 3600, 86_400, 604_800
WOFF = 345_600  # week buckets align to Monday


def test_segments_tile_and_prefer_coarse():
    t0 = WOFF + 3 * W + 2 * D + 5 * H  # some Wednesday 05:00
    t1 = WOFF + 6 * W + 1 * D + 7 * H
    segs = range_segments(t0, t1)
    # tiles exactly, no overlap (also asserted inside range_segments)
    tiled = sorted((lo, hi) for _, lo, hi in segs)
    assert tiled[0][0] == t0 and tiled[-1][1] == t1
    assert all(a[1] == b[0] for a, b in zip(tiled, tiled[1:]))
    by_tier = {t: sum(hi - lo for tt, lo, hi in segs if tt == t) for t in
               ("week", "day", "hour")}
    assert by_tier["week"] == 2 * W  # weeks 4 and 5 fully covered
    assert by_tier["hour"] < 2 * D  # fringes only
    assert sum(by_tier.values()) == t1 - t0


def test_segments_edge_cases():
    assert range_segments(WOFF, WOFF) == []
    # exactly one week -> a single week segment
    assert range_segments(WOFF + W, WOFF + 2 * W) == [("week", WOFF + W, WOFF + 2 * W)]
    # sub-day range -> hours only
    segs = range_segments(5 * H, 9 * H)
    assert segs == [("hour", 5 * H, 9 * H)]
    with pytest.raises(ValueError):
        range_segments(100, 7200)


def test_route_equals_direct_aggregation_and_uses_week_tier(spark):
    # ~25 days of hourly-spread events
    n = 5000
    ev = spark.range(n).select(
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 431).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("event_type"),
        (F.col("id") % 100 / 4.0).alias("value"),
    )
    hour = rollup_from_raw(ev, ["event_type"], "ts", "value", "hour")
    day = cascade(hour, ["event_type"], "day")
    week = cascade(day, ["event_type"], "week")
    lo, hi = ev.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    t0 = (int(lo) // H) * H + 7 * H
    t1 = (int(hi) // H) * H - 11 * H
    out = route_range(
        {"hour": hour, "day": day, "week": week}, ["event_type"], t0, t1
    ).collect()
    direct = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in ev.filter(
            (F.unix_timestamp("ts") >= t0) & (F.unix_timestamp("ts") < t1)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert len(out) == 2
    for r in out:
        n_direct, s_direct = direct[r["event_type"]]
        assert r["doc_count"] == n_direct  # integer counts: exact
        assert abs(r["value_sum"] - s_direct) < 1e-6
        # provenance: the router actually served from coarse tiers
        assert r["n_rows_week"] >= 1
        assert r["n_rows_day"] >= 1
        assert r["n_rows_hour"] >= 1


def test_serving_path_composition_matches_router(spark):
    """The serving-path flagship (q_serving_path_range): hour fringe
    decoded from the Gorilla blob store must stitch to the SAME totals as
    the all-parquet router over the same range, and the range must
    actually contain hour fringe segments (else the composition pins
    nothing)."""
    import __spark_entry__ as e
    from dads_spark.rollup.router import range_segments
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    lo, hi = ev.agg(
        F.min(F.unix_timestamp(F.col("ts").cast("timestamp"))),
        F.max(F.unix_timestamp(F.col("ts").cast("timestamp"))),
    ).first()
    t0 = (int(lo) // 3600) * 3600 + 5 * 3600
    t1 = (int(hi) // 3600) * 3600 - 3 * 3600
    segs = range_segments(t0, t1)
    assert any(t == "hour" for t, _, _ in segs), segs

    got = {
        r["event_type"]: (r["n_events"], r["value_sum"])
        for r in e.q_serving_path_range(spark, sf).collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["s"], 2))
        for r in ev.filter(
            (F.unix_timestamp("ts") >= t0) & (F.unix_timestamp("ts") < t1)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]  # integer counts exact
        assert abs(got[k][1] - want[k][1]) < 1e-9
