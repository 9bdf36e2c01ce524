"""Tier compaction (rollup/compact.py) and the HLL distinct-count cascade
(rollup/distinct.py): layout properties and sketch-merge exactness."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from dads_spark.rollup.compact import compact_tier, file_stats
from dads_spark.rollup.distinct import (
    cascade_distinct,
    distinct_sketch_tier,
    with_estimate,
)


def _tier_df(spark, n_rows=20_000, n_keys=8):
    # synthetic hour-tier shape: (key, bucket_ts, doc_count, value_sum)
    return (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias("key"),
            F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") / n_keys).cast("long") * 3600).alias("bucket_ts"),
            (F.col("id") % 97).alias("doc_count"),
            (F.col("id") % 31 * 1.5).alias("value_sum"),
        )
    )


def test_compact_bin_packs_and_preserves_data(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    tier = _tier_df(spark)
    # fragment: 64 small files, the accreted-store pathology
    tier.repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64

    compact_tier(spark.read.parquet(src), ["key", "bucket_ts"], out, target_files=4)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) <= 4

    a = spark.read.parquet(src).orderBy("key", "bucket_ts", "doc_count").collect()
    b = spark.read.parquet(out).orderBy("key", "bucket_ts", "doc_count").collect()
    assert a == b


def test_compact_layout_is_range_disjoint(spark, tmp_path):
    # per-file [min,max] of the leading range column must not interleave:
    # that's the property that lets a key-predicate read prune whole files
    # from parquet footers alone
    out = str(tmp_path / "clustered")
    compact_tier(_tier_df(spark), ["key", "bucket_ts"], out, target_files=4)
    stats = file_stats(spark, out, ["key"]).orderBy("min_key").collect()
    assert len(stats) > 1
    for prev, cur in zip(stats, stats[1:]):
        assert prev["max_key"] <= cur["min_key"]
    # bin-packing: no file holds more than ~2x its fair share
    rows = [s["n_rows"] for s in stats]
    assert max(rows) <= 2 * (sum(rows) / len(rows))


def test_max_records_per_file_caps_hot_ranges(spark, tmp_path):
    out = str(tmp_path / "capped")
    # one hot key = one hot range partition; the cap must split it
    hot = spark.range(9_000).select(
        F.lit("hot").alias("key"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("bucket_ts"),
        F.col("id").alias("doc_count"),
        F.lit(0.0).alias("value_sum"),
    )
    compact_tier(hot, ["key"], out, target_files=1, max_records_per_file=2_000)
    counts = [s["n_rows"] for s in file_stats(spark, out, ["key"]).collect()]
    assert max(counts) <= 2_000 and sum(counts) == 9_000


def _events(spark, n=40_000, users=6_000):
    # ids hashed so user cardinality per day exercises the sketch's dense
    # regime (beyond the exact sparse/coupon modes)
    return spark.range(n).select(
        F.concat(F.lit("u"), F.pmod(F.hash(F.col("id")), F.lit(users)).cast("string")).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % (14 * 86_400)).alias("ts"),
    )


def test_hll_cascade_agrees_with_direct_within_rse(spark):
    # register states are identical either way (max-associativity), but a
    # single-pass sketch that never merged keeps the HIP estimator while a
    # union reports the composite estimator — so direct-vs-cascade agrees
    # within (well under) the sketch's RSE, not bitwise (module docstring)
    ev = _events(spark)
    hour = distinct_sketch_tier(ev, ["event_type"], "ts", "user_id", lg_k=12)
    via_hour = with_estimate(cascade_distinct(hour, ["event_type"], "day"))
    from dads_spark.rollup.tiers import bucket_expr

    direct = with_estimate(
        ev.groupBy("event_type", bucket_expr("ts", "day")).agg(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("distinct_hll")
        )
    )
    a = {(r[0], r[1]): r[2] for r in via_hour.collect()}
    b = {(r[0], r[1]): r[2] for r in direct.collect()}
    assert a.keys() == b.keys() and a
    for k in a:
        assert abs(a[k] - b[k]) <= 0.03 * b[k]


def test_hll_cascade_partitioning_invariant(spark):
    ev = _events(spark)
    one = with_estimate(
        cascade_distinct(
            distinct_sketch_tier(ev.coalesce(1), ["event_type"], "ts", "user_id"),
            ["event_type"],
            "day",
        )
    ).collect()
    many = with_estimate(
        cascade_distinct(
            distinct_sketch_tier(
                ev.repartition(13, "user_id"), ["event_type"], "ts", "user_id"
            ),
            ["event_type"],
            "day",
        )
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_hll_estimate_within_error_envelope(spark):
    from dads_spark.rollup.tiers import bucket_expr

    ev = _events(spark, n=80_000, users=20_000)
    hour = distinct_sketch_tier(ev, ["event_type"], "ts", "user_id", lg_k=13)
    day = with_estimate(cascade_distinct(hour, ["event_type"], "day"))
    exact = ev.groupBy("event_type", bucket_expr("ts", "day")).agg(
        F.countDistinct("user_id").alias("exact")
    )
    rows = day.join(exact, ["event_type", "bucket_ts"]).collect()
    assert rows
    for r in rows:
        assert abs(r["approx_distinct"] - r["exact"]) <= 0.05 * r["exact"]


def test_hll_week_cascade_path_independent(spark):
    # the full chain raw -> hour -> day -> week equals the shortcut
    # raw -> hour -> week BIT-FOR-BIT: both are union paths, and a union
    # estimate is a pure function of the (associative) register state —
    # cascade results don't depend on which tier they were merged through
    ev = _events(spark)
    hour = distinct_sketch_tier(ev, ["event_type"], "ts", "user_id")
    day = cascade_distinct(hour, ["event_type"], "day")
    week_via_day = with_estimate(cascade_distinct(day, ["event_type"], "week"))
    week_via_hour = with_estimate(cascade_distinct(hour, ["event_type"], "week"))
    assert sorted(map(tuple, week_via_day.collect())) == sorted(
        map(tuple, week_via_hour.collect())
    )


# ---------------------------------------------------------------------------
# KMV bottom-k sketch (rollup/distinct.py:kmv_*)


def _kmv_events(spark, n=4000, n_items=300):
    return spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("key"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("id") * 137
        ).alias("ts"),
        ((F.col("id") * 7919 + 13) % n_items).alias("item"),
    )


def test_kmv_cascade_equals_direct_bitwise(spark):
    """Mergeability: hour->day cascade == day tier sketched from raw,
    including the retained digest arrays themselves."""
    from dads_spark.rollup.distinct import kmv_cascade, kmv_sketch_tier

    ev = _kmv_events(spark)
    hour = kmv_sketch_tier(ev, ["key"], "ts", "item", "hour", k=24)
    via_cascade = kmv_cascade(hour, ["key"], "day", k=24)
    direct = kmv_sketch_tier(ev, ["key"], "ts", "item", "day", k=24)
    a = {(r["key"], r["bucket_ts"]): r["kmv"] for r in via_cascade.collect()}
    b = {(r["key"], r["bucket_ts"]): r["kmv"] for r in direct.collect()}
    assert a == b and len(a) > 3


def test_kmv_exact_below_k(spark):
    """A bucket with fewer than k distinct items reports the EXACT count."""
    from dads_spark.rollup.distinct import kmv_estimate, kmv_sketch_tier

    ev = _kmv_events(spark, n=600, n_items=10)  # 10 distinct items << k
    day = kmv_sketch_tier(ev, ["key"], "ts", "item", "day", k=64)
    for r in kmv_estimate(day, k=64).collect():
        assert r["n_kept"] <= 10
        assert r["est_distinct"] == r["n_kept"]


def test_kmv_estimate_error_envelope(spark):
    """k=64 over 300 true distinct: every estimate within 4/sqrt(k) ~ 50%
    relative error (loose envelope, deterministic data so no flake)."""
    from dads_spark.rollup.distinct import kmv_estimate, kmv_sketch_tier

    ev = _kmv_events(spark, n=8000, n_items=300).withColumn(
        "key", F.lit("all")
    )
    # one giant bucket: week tier holds all rows
    wk = kmv_sketch_tier(ev, ["key"], "ts", "item", "week", k=64)
    rows = kmv_estimate(wk, k=64).collect()
    assert rows
    for r in rows:
        if r["n_kept"] == 64:
            true = (
                ev.filter(
                    F.col("ts")
                    >= F.timestamp_seconds(F.lit(0))
                )
                .select("item")
                .distinct()
                .count()
            )
            assert abs(r["est_distinct"] - true) <= true // 2


def test_kmv_repartition_invariant(spark):
    from dads_spark.rollup.distinct import kmv_sketch_tier

    ev = _kmv_events(spark)
    a = kmv_sketch_tier(ev.repartition(1), ["key"], "ts", "item", "day", k=16)
    b = kmv_sketch_tier(
        ev.repartition(32, "item"), ["key"], "ts", "item", "day", k=16
    )
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_kmv_v52_no_ansi_overflow(spark):
    """Regression: the 2^28-weight nibble term must multiply in BIGINT —
    a digest with a high nibble (>= 8) at position 6 overflowed checked
    INT arithmetic before the CAST. Force a full evaluation over digests
    covering all 16 nibble values at every position."""
    from dads_spark.rollup.distinct import kmv_estimate, kmv_sketch_tier

    ev = _kmv_events(spark, n=3000, n_items=2000)
    day = kmv_sketch_tier(ev, ["key"], "ts", "item", "day", k=8)
    rows = kmv_estimate(day, k=8).collect()  # would raise pre-fix
    assert all(r["est_distinct"] >= r["n_kept"] for r in rows)


def test_kmv_set_ops_exact_below_k(spark):
    """Two sets of 20/25 items with 10 shared, k=64 >> sizes: every
    output is EXACT — union 35, intersection 10, jaccard 285 permille."""
    from dads_spark.rollup.distinct import kmv_set_ops, kmv_sketch_tier

    def mk(lo, hi):
        return spark.range(lo, hi).select(
            F.lit("g").alias("key"),
            F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
            F.col("id").alias("item"),
        )

    a = kmv_sketch_tier(mk(0, 20), ["key"], "ts", "item", "day", k=64)
    b = kmv_sketch_tier(mk(10, 35), ["key"], "ts", "item", "day", k=64)
    r = kmv_set_ops(a, b, ["key", "bucket_ts"], k=64).collect()[0]
    assert r["n_kept"] == 35 and r["n_both"] == 10
    assert r["union_est"] == 35 and r["inter_est"] == 10
    assert r["jaccard_permille"] == 1000 * 10 // 35


def test_kmv_set_ops_estimator_envelope(spark):
    """600 vs 600 items with 300 shared (true J=1/3, union 900), k=128:
    estimates within a loose 50% envelope, all integers deterministic."""
    from dads_spark.rollup.distinct import kmv_set_ops, kmv_sketch_tier

    def mk(lo, hi):
        return spark.range(lo, hi).select(
            F.lit("g").alias("key"),
            F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
            F.col("id").alias("item"),
        )

    a = kmv_sketch_tier(mk(0, 600), ["key"], "ts", "item", "day", k=128)
    b = kmv_sketch_tier(mk(300, 900), ["key"], "ts", "item", "day", k=128)
    r = kmv_set_ops(a, b, ["key", "bucket_ts"], k=128).collect()[0]
    assert r["n_kept"] == 128 and 0 < r["n_both"] < 128
    assert abs(r["union_est"] - 900) <= 450
    assert abs(r["jaccard_permille"] - 333) <= 170
    assert r["inter_est"] == r["union_est"] * r["n_both"] // r["n_kept"]


def test_kmv_sliding_equals_raw_window_sketch(spark):
    """Each sliding window's bottom-k from hour sketches must equal the
    bottom-k sketched directly from the raw rows of that window."""
    from dads_spark.rollup.distinct import kmv_sketch_tier, kmv_sliding

    ev = _kmv_events(spark, n=3000, n_items=200)
    hour = kmv_sketch_tier(ev, ["key"], "ts", "item", "hour", k=16)
    win = {(r["key"], r["window_end"]): r["kmv"] for r in kmv_sliding(
        hour, ["key"], window_hours=6, k=16
    ).collect()}
    # direct: for a few window ends, sketch raw rows in (we-5h, we]
    import datetime as dt

    raw = ev.collect()
    from collections import defaultdict
    import hashlib

    by_kw = defaultdict(set)
    for r in raw:
        ts = r["ts"]
        bh = ts.replace(minute=0, second=0, microsecond=0)
        h = hashlib.md5(str(r["item"]).encode()).hexdigest()
        for k in range(6):
            by_kw[(r["key"], bh + dt.timedelta(hours=k))].add(h)
    checked = 0
    for (key, we), hs in by_kw.items():
        got = win.get((key, we))
        if got is None:
            continue
        assert got == sorted(hs)[:16]
        checked += 1
    assert checked > 20


def test_compaction_plan_size_tiers(spark):
    from dads_spark.rollup import compaction_plan

    stats = spark.createDataFrame(
        [(f"f{i}", n) for i, n in enumerate([1, 1, 3, 3, 3, 3, 100, 130])],
        "file string, n_rows long",
    )
    plan = {r["size_tier"]: r for r in compaction_plan(stats).collect()}
    # 1 -> tier 0 (2 files); 3 -> tier 1 (4 files, merges);
    # 100 -> tier 6, 130 -> tier 7 (128 <= 130)
    assert plan[0]["n_files"] == 2 and plan[0]["compact"] == 0
    assert plan[1]["n_files"] == 4 and plan[1]["compact"] == 1
    assert plan[6]["n_files"] == 1 and plan[6]["compact"] == 0
    assert plan[7]["n_files"] == 1 and plan[7]["min_rows"] == 130
    assert plan[1]["total_rows"] == 12


def test_compaction_plan_exact_power_boundaries(spark):
    from dads_spark.rollup import compaction_plan

    stats = spark.createDataFrame(
        [("a", 1024), ("b", 1023), ("c", 1025), ("d", 2048)],
        "file string, n_rows long",
    )
    plan = {r["size_tier"]: r["n_files"]
            for r in compaction_plan(stats).collect()}
    # 1023 -> tier 9; 1024,1025 -> tier 10; 2048 -> tier 11 — the
    # boundary cannot flip on a libm log2 rounding because there is no
    # floating log anywhere
    assert plan == {9: 1, 10: 2, 11: 1}
