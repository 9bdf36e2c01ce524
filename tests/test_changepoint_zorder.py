"""PELT segmentation (rollup/changepoint.py) and z-order clustering
(rollup/zorder.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dads_spark.oracles import pelt_oracle
from dads_spark.rollup import (
    auto_penalty,
    pelt_changepoints,
    pelt_grouped,
    zorder_write,
    zvalue,
)


def test_pelt_recovers_planted_shifts():
    rng = np.random.default_rng(3)
    x = np.concatenate(
        [rng.normal(0, 1, 200), rng.normal(6, 1, 150), rng.normal(-3, 1, 250)]
    )
    assert pelt_changepoints(x, auto_penalty(x)) == [200, 350]


def test_pelt_edge_cases():
    assert pelt_changepoints(np.array([]), 1.0) == []
    assert pelt_changepoints(np.array([5.0]), 1.0) == []
    # constant series: zero cost everywhere, any penalty forbids splits
    assert pelt_changepoints(np.full(100, 7.0), 0.1) == []
    # huge penalty: never worth a split even across a massive shift
    x = np.concatenate([np.zeros(50), np.full(50, 100.0)])
    assert pelt_changepoints(x, 1e12) == []


def test_pelt_bitwise_equals_unpruned_dp():
    for seed in range(10):
        rng = np.random.default_rng(seed)
        y = np.round(rng.normal(10, 4, 300) + rng.integers(0, 3, 300), 3)
        for pen in (2.0, 20.0, auto_penalty(y)):
            assert pelt_changepoints(y, pen) == pelt_oracle(y, pen), (seed, pen)


def test_pelt_grouped_matches_kernel_and_is_partition_invariant(spark):
    rng = np.random.default_rng(7)
    rows = []
    series = {}
    for g in ("a", "b"):
        x = np.concatenate(
            [rng.normal(0, 1, 120), rng.normal(5, 1, 80), rng.normal(1, 1, 100)]
        )
        series[g] = x
        rows += [(g, i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    for frame in (df.coalesce(1), df.repartition(9, "t")):
        got = {
            k: sorted((r["cp_rank"], r["cp_idx"]) for r in grp)
            for k, grp in __import__("itertools").groupby(
                sorted(
                    pelt_grouped(frame, ["k"], "t", "v").collect(),
                    key=lambda r: r["k"],
                ),
                key=lambda r: r["k"],
            )
        }
        for g, x in series.items():
            want = pelt_changepoints(x, auto_penalty(x))
            assert got.get(g, []) == [(i + 1, c) for i, c in enumerate(want)]


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zvalue(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for k in range(16):
            z |= ((x >> k) & 1) << (2 * k)
            z |= ((y >> k) & 1) << (2 * k + 1)
        return z

    assert out == {(x, y): ref(x, y) for x, y in out}
    assert out[(65535, 65535)] == 2**32 - 1


def test_zorder_layout_tiles_both_dimensions(spark, tmp_path):
    # uniform 256x256 grid; z-order layout must shrink per-partition
    # bounding boxes in BOTH dims, where a 1-D x-sort leaves y full-range
    n = 256
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    P = 16

    def boxes(frame):
        return (
            frame.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                F.min("x").alias("x0"),
                F.max("x").alias("x1"),
                F.min("y").alias("y0"),
                F.max("y").alias("y1"),
            )
            .collect()
        )

    def hits(bs, dim, v):
        lo, hi = (f"{dim}0", f"{dim}1")
        return sum(1 for b in bs if b[lo] <= v <= b[hi])

    one_d = boxes(df.repartitionByRange(P, "x"))
    zed = boxes(
        df.withColumn("z", zvalue(F.col("x"), F.col("y"), 8)).repartitionByRange(
            P, "z"
        )
    )
    # 1-D x-sort: a predicate on x prunes to ~1 file, but a predicate on y
    # matches EVERY file (y range is untouched per partition)
    assert hits(one_d, "x", 100) <= 2
    assert hits(one_d, "y", 100) == P
    # z-order: predicates on EITHER dimension prune — no dimension ever
    # scans every file, and each dim's hit count is ~sqrt(P)-ish
    assert hits(zed, "x", 100) <= P // 2
    assert hits(zed, "y", 100) <= P // 2

    # write path round-trips content exactly
    out = str(tmp_path / "ztier")
    zorder_write(df, "x", "y", out, target_files=4, bits=8)
    back = spark.read.parquet(out)
    assert back.count() == n * n
    assert sorted(back.columns) == ["x", "y"]
    assert (
        back.selectExpr("sum(x * 65536 + y) s").first()["s"]
        == df.selectExpr("sum(x * 65536 + y) s").first()["s"]
    )
