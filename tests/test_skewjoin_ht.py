"""Salted skew-join equivalence + Horvitz-Thompson estimation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import ht_estimate, salted_join


def _tables(spark):
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", i * 3) for i in range(500)],
        "id long, k string, v long",
    )
    small = spark.createDataFrame(
        [("hot", 2), ("cold", 7), ("orphan", 1)], "k string, w long"
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("n_salt", [1, 8])
def test_salted_join_equals_plain(spark, how, n_salt):
    big, small = _tables(spark)
    plain = sorted(
        (r.id, r.w) for r in big.join(small, "k", how).collect()
    )
    salted = sorted(
        (r.id, r.w)
        for r in salted_join(big, small, ["k"], n_salt, how).collect()
    )
    assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    big, small = _tables(spark)
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)),
    )
    n_salts = b.filter(F.col("k") == "hot").select("_salt").distinct().count()
    assert n_salts > 1  # the hot key's rows occupy several salt buckets


def test_salted_join_rejects_bad_args(spark):
    big, small = _tables(spark)
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], 0)
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], 8, how="full")


def test_ht_estimate_is_unbiased_on_uniform_strata(spark):
    # value identical for every row: ht_total = denom * n_sampled * v,
    # and the estimator hits the truth exactly when the sampling rate
    # divides the stratum uniformly enough; here we assert the exact
    # arithmetic identities rather than statistical closeness
    df = spark.createDataFrame(
        [(i, "a", 10) for i in range(4096)], "id long, s string, v long"
    )
    r = ht_estimate(df, ["s"], "id", "v", {}, default_denom=8).collect()[0]
    assert r.denom == 8
    assert r.ht_total == r.n_sampled * 8 * 10
    assert r.ht_count == r.n_sampled * 8
    # md5 is uniform: the 1/8 sample of 4096 is within a loose band
    assert 300 < r.n_sampled < 750


def test_ht_estimate_per_stratum_denoms(spark):
    rows = [(i, "a", 1) for i in range(1000)] + [
        (i + 10_000, "b", 1) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id long, s string, v long")
    out = {r.s: r for r in ht_estimate(df, ["s"], "id", "v", {"b": 2}).collect()}
    assert out["a"].denom == 8 and out["b"].denom == 2


def test_ht_estimate_rejects_non_hex_denom(spark):
    df = spark.createDataFrame([(1, "a", 1)], "id long, s string, v long")
    with pytest.raises(ValueError):
        ht_estimate(df, ["s"], "id", "v", {}, default_denom=5)
