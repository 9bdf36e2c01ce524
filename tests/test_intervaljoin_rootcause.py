"""Interval-overlap join (bucketed + anchored) and metric-delta
dimension attribution — brute-force parity, bucket-width invariance,
edge coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import bucketed_interval_join
from dads_spark.rollup import delta_attribution


def _intervals(spark, specs, id_name, lo_name, hi_name):
    rows = [(i, lo, hi) for i, (lo, hi) in enumerate(specs)]
    return spark.createDataFrame(
        rows, schema=f"{id_name} long, {lo_name} long, {hi_name} long"
    )


LEFT = [
    (0, 10),        # small, one bucket
    (5, 5),         # zero-width, touches LEFT[0]
    (100, 5000),    # spans many buckets at width 64
    (4990, 5010),   # overlaps the tail of LEFT[2]
    (9000, 9100),   # isolated
    (-50, -10),     # negative bounds (div must floor, not truncate)
]
RIGHT = [
    (10, 10),       # touches LEFT[0] exactly at the closed endpoint
    (11, 99),       # gap: adjacent to LEFT[0] but NOT overlapping
    (0, 10000),     # covers almost everything
    (5005, 5005),   # point inside LEFT[3]
    (-100, -40),    # overlaps LEFT[5]
]


def _brute(left, right):
    out = set()
    for li, (llo, lhi) in enumerate(left):
        for ri, (rlo, rhi) in enumerate(right):
            if llo <= rhi and rlo <= lhi:
                out.add((li, ri))
    return out


@pytest.mark.parametrize("bucket", [64, 1 << 24, 7])
def test_interval_join_matches_bruteforce(spark, bucket):
    ldf = _intervals(spark, LEFT, "l_id", "lo", "hi")
    rdf = _intervals(spark, RIGHT, "r_id", "r_lo", "r_hi")
    got = {
        (r.l_id, r.r_id)
        for r in bucketed_interval_join(ldf, rdf, bucket=bucket).collect()
    }
    assert got == _brute(LEFT, RIGHT)


def test_interval_join_no_duplicate_pairs(spark):
    # a pair sharing MANY buckets must appear exactly once
    ldf = _intervals(spark, [(0, 1000)], "l_id", "lo", "hi")
    rdf = _intervals(spark, [(500, 1500)], "r_id", "r_lo", "r_hi")
    rows = bucketed_interval_join(ldf, rdf, bucket=10).collect()
    assert len(rows) == 1


def test_interval_join_rejects_bad_bucket(spark):
    ldf = _intervals(spark, LEFT, "l_id", "lo", "hi")
    with pytest.raises(ValueError):
        bucketed_interval_join(ldf, ldf, bucket=0)


def _attr_events(spark):
    # (country, device, period_tag, n) expanded to unit rows
    rows = []
    data = [
        ("us", "ios", 0, 40), ("us", "android", 0, 10),
        ("de", "ios", 0, 20), ("de", "android", 0, 30),
        ("us", "ios", 1, 70), ("us", "android", 1, 10),
        ("de", "ios", 1, 15), ("de", "android", 1, 25),
    ]
    for c, d, p, n in data:
        rows += [(c, d, p)] * n
    return spark.createDataFrame(
        rows, schema="country string, device string, p long"
    )


def test_delta_attribution_exact_decomposition(spark):
    df = _attr_events(spark)
    out = delta_attribution(
        df, ["country", "device"], F.lit(1).cast("long"),
        F.col("p") == 0, F.col("p") == 1, top_k=10,
    ).collect()
    by = {(r.dimension, r.dim_value): r for r in out}
    # totals: p0 = 100, p1 = 120, topline delta = +20
    assert by[("country", "us")].delta == 30
    assert by[("country", "de")].delta == -10
    assert by[("device", "ios")].delta == 25
    assert by[("device", "android")].delta == -5
    # per-dimension deltas each sum to the topline delta (zero residual)
    for dim in ("country", "device"):
        assert sum(r.delta for k, r in by.items() if k[0] == dim) == 20
    # share_q6 = 1e6 * delta / 20, half-up
    assert by[("country", "us")].share_q6 == 1_500_000
    assert by[("device", "android")].share_q6 == -250_000
    # ranking: |delta| desc within each dimension
    assert by[("country", "us")].rnk == 1
    assert by[("device", "ios")].rnk == 1


def test_delta_attribution_zero_topline_gives_null_share(spark):
    df = _attr_events(spark)
    # compare period 0 against itself: all deltas 0, topline 0
    out = delta_attribution(
        df, ["country"], F.lit(1).cast("long"),
        F.col("p") == 0, F.col("p") == 0, top_k=10,
    ).collect()
    assert all(r.delta == 0 and r.share_q6 is None for r in out)
    # NOTE: in_p0 == in_p1 means rows count in both periods (documented)


def test_delta_attribution_top_k_cuts(spark):
    df = _attr_events(spark)
    out = delta_attribution(
        df, ["country", "device"], F.lit(1).cast("long"),
        F.col("p") == 0, F.col("p") == 1, top_k=1,
    ).collect()
    assert sorted((r.dimension, r.dim_value) for r in out) == [
        ("country", "us"), ("device", "ios"),
    ]
