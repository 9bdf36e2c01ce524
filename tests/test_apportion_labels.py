"""Hamilton apportionment (ops/apportion.py) and the TSDB label
cardinality explorer (rollup/labelindex.py:label_cardinality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import apportion
from dads_spark.rollup import build_label_index, label_cardinality


def _w(spark, rows):
    return spark.createDataFrame(rows, "host string, w long")


def test_apportion_sums_exactly_and_quota_bounded(spark):
    w = _w(spark, [("a", 7), ("b", 5), ("c", 3), ("d", 1)])
    out = {r["host"]: r for r in apportion(w, "host", "w", 100).collect()}
    assert sum(r["alloc"] for r in out.values()) == 100
    # quota rule: alloc is floor or ceil of the exact share 100*w/16
    for host, wt in [("a", 7), ("b", 5), ("c", 3), ("d", 1)]:
        lo = 100 * wt // 16
        assert out[host]["alloc"] in (lo, lo + 1)
        assert out[host]["base"] == lo


def test_apportion_known_small_case(spark):
    # shares: 3/6, 2/6, 1/6 of 10 -> bases 5,3,1 (sum 9), remainders
    # 0, 20%... exact: 10*3%6=0, 10*2%6=2, 10*1%6=4 -> the one leftover
    # slot goes to c (largest remainder)
    w = _w(spark, [("a", 3), ("b", 2), ("c", 1)])
    out = {r["host"]: r["alloc"] for r in apportion(w, "host", "w", 10).collect()}
    assert out == {"a": 5, "b": 3, "c": 2}


def test_apportion_alabama_paradox_documented(spark):
    """Hamilton's method famously violates house monotonicity: with
    weights (3, 3, 1), growing the house 10 -> 11 DROPS c from 2 seats
    to 1. Pinned so the behavior is documented, not rediscovered."""
    w = _w(spark, [("a", 3), ("b", 3), ("c", 1)])
    at10 = {r["host"]: r["alloc"] for r in apportion(w, "host", "w", 10).collect()}
    at11 = {r["host"]: r["alloc"] for r in apportion(w, "host", "w", 11).collect()}
    assert at10 == {"a": 4, "b": 4, "c": 2}
    assert at11 == {"a": 5, "b": 5, "c": 1}


def test_apportion_zero_weight_and_ties(spark):
    w = _w(spark, [("a", 4), ("b", 4), ("z", 0)])
    out = {r["host"]: r["alloc"] for r in apportion(w, "host", "w", 7).collect()}
    # bases 3,3,0; one leftover; equal remainders tie-break key ASC -> a
    assert out == {"a": 4, "b": 3, "z": 0}


def test_apportion_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        apportion(_w(spark, [("a", -1), ("b", 2)]), "host", "w", 5).collect()
    with pytest.raises(ValueError):
        apportion(_w(spark, [("a", 0)]), "host", "w", 5).collect()


def _series_catalog(spark):
    return spark.range(60).select(
        F.col("id").alias("sid"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"),
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("rid"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.concat(F.lit("p"), (F.col("id") % 2).cast("string")))
        .alias("pod"),
    )


def test_label_cardinality_counts_and_top(spark):
    idx = build_label_index(_series_catalog(spark), "sid", ["lang", "rid", "pod"])
    out = {r["label_name"]: r for r in label_cardinality(idx).collect()}
    # lang: 3 values x 20 series each; top tie-break is largest value
    assert out["lang"]["n_values"] == 3
    assert out["lang"]["n_series"] == 60
    assert out["lang"]["top_value"] == "l2"
    assert out["lang"]["top_series"] == 20
    assert out["lang"]["top_share_permille"] == 333
    # rid: the unbounded-label pathology -> n_values == n_series
    assert out["rid"]["n_values"] == out["rid"]["n_series"] == 60
    assert out["rid"]["top_series"] == 1
    # pod: NULLs produce no posting (12 of 60 null) -> 48 series
    assert out["pod"]["n_series"] == 48
    assert out["pod"]["n_values"] == 2


def test_label_cardinality_share_is_integer_permille(spark):
    idx = build_label_index(_series_catalog(spark), "sid", ["pod"])
    row = label_cardinality(idx).collect()[0]
    assert row["top_share_permille"] == row["top_series"] * 1000 // row["n_series"]


def test_neyman_allocation_favors_variance(spark):
    from dads_spark.ops import neyman_allocation

    rows = []
    # stratum 'flat': 100 rows of constant 50 -> sigma 0 -> alloc 0
    rows += [("flat", 50)] * 100
    # stratum 'wild': 100 rows alternating 0/100 -> big sigma
    rows += [("wild", 0 if i % 2 == 0 else 100) for i in range(100)]
    # stratum 'mild': 100 rows alternating 49/51
    rows += [("mild", 49 if i % 2 == 0 else 51) for i in range(100)]
    df = spark.createDataFrame(rows, "stratum string, v long")
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "stratum", "v", 100).collect()}
    assert out["flat"]["alloc"] == 0 and out["flat"]["w"] == 0
    assert out["wild"]["alloc"] > out["mild"]["alloc"]
    assert sum(r["alloc"] for r in out.values()) == 100
    # exact isqrt check: A = N*q - s^2, w = floor(sqrt(A))
    import math

    for name in ("wild", "mild"):
        r = out[name]
        assert r["w"] == math.isqrt(r["a"])


def test_neyman_isqrt_exact_at_perfect_squares(spark):
    from dads_spark.ops import neyman_allocation

    # engineer A to be a perfect square: 2 rows (0, 2k) -> A = 2*4k^2
    # - 4k^2 = 4k^2, w = 2k exactly
    import math

    for k in (3, 1 << 20, (1 << 26) + 123):
        df = spark.createDataFrame(
            [("s", 0), ("s", 2 * k), ("o", 1), ("o", 2)],
            "stratum string, v long",
        )
        out = {r["stratum"]: r for r in
               neyman_allocation(df, "stratum", "v", 10).collect()}
        assert out["s"]["w"] == 2 * k == math.isqrt(out["s"]["a"])
