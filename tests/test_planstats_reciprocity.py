"""Join-size statistics (ops/profile.py:join_size_estimate), exact
range-partition boundaries (ops/sampling.py:range_splits), and link
reciprocity (ops/linkgraph.py:link_reciprocity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import (
    join_size_estimate,
    link_reciprocity,
    range_splits,
)


def test_join_size_estimate_equals_actual_join(spark):
    a = spark.range(300).select((F.col("id") % 13).alias("k"))
    b = spark.range(200).select((F.col("id") % 13).alias("k"))
    est = join_size_estimate(a, b, ["k"], n_hex=1)
    total = est.agg(F.sum("est_rows")).collect()[0][0]
    actual = a.join(b, ["k"]).count()
    assert total == actual


def test_join_size_estimate_flags_hot_key(spark):
    a = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    b = spark.range(10).select((F.col("id") % 5).alias("k"))
    est = join_size_estimate(a, b, ["k"], n_hex=1).collect()
    assert max(r["max_key_rows"] for r in est) == 900 * 2  # key 0: 900 x 2


def test_range_splits_equi_depth(spark):
    df = spark.range(1000).select(F.col("id").alias("v"), F.col("id").alias("i"))
    splits = sorted(
        r["v"] for r in range_splits(df, ["v", "i"], n_parts=4).collect()
    )
    # ranks ceil(250/500/750) over values 0..999 -> values 249, 499, 749
    assert splits == [249, 499, 749]


def test_range_splits_determinism_and_validation(spark):
    df = spark.range(777).select((F.col("id") * 37 % 1000).alias("v"),
                                 F.col("id").alias("i"))
    a = sorted(map(tuple, range_splits(df, ["v", "i"], 8).collect()))
    b = sorted(map(tuple, range_splits(df.repartition(16), ["v", "i"], 8).collect()))
    assert a == b and len(a) == 7
    with pytest.raises(ValueError):
        range_splits(df, ["v"], 1)


def test_link_reciprocity_exact(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"),          # reciprocated pair
         ("a", "c"),                      # one-way
         ("c", "c"),                      # self-loop ignored
         ("a", "b")],                     # duplicate collapsed
        "src string, dst string",
    )
    out = {r["src"]: r for r in link_reciprocity(edges).collect()}
    assert out["a"]["n_out"] == 2 and out["a"]["n_recip"] == 1
    assert out["a"]["recip_permille"] == 500
    assert out["b"]["n_out"] == 1 and out["b"]["recip_permille"] == 1000
    assert "c" not in out  # only a self-loop, which is excluded
