"""Count-min tier cascade (rollup/freqsketch.py) and one-pass profiler
(ops/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import profile_table
from dads_spark.rollup import bucket_expr, cm_build_tier, cm_cascade, cm_estimate


def _events(spark, n=3000):
    return spark.range(n).select(
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 97).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("k"),
        # Zipf-ish items: item 0 dominates
        F.when(F.col("id") % 3 == 0, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(500)))
        .alias("item"),
    )


def test_cm_cascade_equals_direct_build(spark):
    ev = _events(spark)
    hour = cm_build_tier(ev, ["k"], "ts", "item", "hour", d=4, w=128)
    day_casc = cm_cascade(hour, ["k"], "day")
    day_direct = cm_build_tier(ev, ["k"], "ts", "item", "day", d=4, w=128)
    a = sorted(map(tuple, day_casc.collect()))
    b = sorted(map(tuple, day_direct.collect()))
    assert a == b  # cell-wise adds commute: cascade is exact


def test_cm_estimate_overestimates_and_is_tight_for_heavy_items(spark):
    ev = _events(spark)
    day = cm_build_tier(ev, ["k"], "ts", "item", "day", d=4, w=512)
    probes = ev.select("k").distinct().crossJoin(
        spark.range(10).select(F.col("id").alias("item"))
    )
    est = cm_estimate(day, probes, ["k"], "item", d=4, w=512)
    exact = (
        ev.filter(F.col("item") < 10)
        .groupBy("k", bucket_expr("ts", "day"), "item")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    rows = (
        est.join(exact, ["k", "bucket_ts", "item"], "left")
        .withColumn("exact", F.coalesce("exact", F.lit(0)))
        .collect()
    )
    assert rows
    n_per_bucket = 3000 / 4  # ~4 day buckets
    for r in rows:
        assert r["est"] >= r["exact"], r  # the count-min guarantee
        # CM error bound: overestimate <= ~e*n/w with high probability
        assert r["est"] - r["exact"] <= 3 * n_per_bucket / 512 + 5, r
    # the planted heavy item is estimated closely (its own mass dominates)
    heavy = [r for r in rows if r["item"] == 0]
    assert heavy and all(r["exact"] > 0 for r in heavy)


def test_cm_build_partition_invariant(spark):
    ev = _events(spark, 800)
    a = cm_build_tier(ev.coalesce(1), ["k"], "ts", "item", "hour", d=3, w=64)
    b = cm_build_tier(
        ev.repartition(7, "item"), ["k"], "ts", "item", "hour", d=3, w=64
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "bb"), (4, "a"), (None, "cc")],
        "x int, s string",
    )
    got = {r["column"]: r.asDict() for r in profile_table(df, ["x", "s"]).collect()}
    assert got["x"]["n_rows"] == 5 and got["s"]["n_rows"] == 5
    assert got["x"]["n_null"] == 1 and got["s"]["n_null"] == 1
    assert got["x"]["n_distinct"] == 4 and got["s"]["n_distinct"] == 3
    assert got["x"]["min_s"] == "1" and got["x"]["max_s"] == "4"
    assert got["s"]["min_s"] == "a" and got["s"]["max_s"] == "cc"
    assert got["x"]["total_len"] == 4  # '1','2','3','4'
    assert got["s"]["total_len"] == 1 + 2 + 1 + 2
    with pytest.raises(ValueError):
        profile_table(df, [])


def test_profile_drift(spark):
    from dads_spark.ops import profile_drift

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "x int, s string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (9, None), (None, "zz")],
        "x int, s string",
    )
    got = {r["column"]: r.asDict() for r in profile_drift(old, new, ["x", "s"]).collect()}
    assert got["x"]["n_rows_old"] == 3 and got["x"]["n_rows_new"] == 5
    assert got["x"]["null_delta"] == 1  # None x appeared
    assert got["x"]["distinct_delta"] == 1  # 9 is new
    assert got["x"]["range_changed"] is True  # max moved 3 -> 9
    assert got["s"]["null_delta"] == 1
    assert got["s"]["distinct_delta"] == 1  # 'zz'
    assert got["s"]["len_delta"] == 2
    assert got["s"]["range_changed"] is True  # max 'b' -> 'zz'


def test_data_contract_audit_counts(spark):
    from dads_spark.ops import data_contract_audit

    rows = [
        (1, "a", 5.0),
        (2, "a", -1.0),   # min violation
        (2, "b", 120.0),  # dup id + max violation
        (None, "zz", 7.0),  # null id + not-in-set + rlike ok
        (4, "B!", 8.0),   # rlike violation + not-in-set
    ]
    df = spark.createDataFrame(rows, "id long, kind string, v double")
    rules = [
        ("n", "id", "not_null", None),
        ("u", "id", "unique", None),
        ("lo", "v", "min", 0.0),
        ("hi", "v", "max", 100.0),
        ("s", "kind", "in_set", ["a", "b"]),
        ("re", "kind", "rlike", "^[a-z]+$"),
    ]
    out = {r["rule_id"]: r for r in data_contract_audit(df, rules).collect()}
    assert all(r["n_rows"] == 5 for r in out.values())
    assert out["n"]["n_violations"] == 1 and not out["n"]["passed"]
    assert out["u"]["n_violations"] == 1      # id=2 twice -> 4 non-null, 3 distinct
    assert out["lo"]["n_violations"] == 1
    assert out["hi"]["n_violations"] == 1
    assert out["s"]["n_violations"] == 2      # 'zz', 'B!'
    assert out["re"]["n_violations"] == 1     # 'B!' (zz matches the regex)
    assert out["lo"]["passed"] is False and out["n"]["passed"] is False


def test_data_contract_audit_single_scan_plan(spark):
    import io
    import sys

    from dads_spark.ops import data_contract_audit

    df = spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    out = data_contract_audit(
        df, [("a", "id", "not_null", None), ("b", "v", "max", 50.0),
             ("c", "id", "unique", None)]
    )
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        out.explain("formatted")
    finally:
        sys.stdout = old
    plan = buf.getvalue()
    # one scan feeds every rule — the range source appears exactly once
    assert plan.count("Scan ExistingRDD") + plan.count("(1) Range") <= 1 or \
        plan.count("Range") >= 1
    n_scans = sum(1 for l in plan.splitlines() if l.strip().startswith("(1)"))
    assert n_scans == 1
