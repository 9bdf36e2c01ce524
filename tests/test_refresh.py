"""Invalidation-based continuous-aggregate refresh (rollup/refresh.py).

The contract: splicing recomputed buckets over a stale tier is
bit-identical to rebuilding the tier from scratch, and ONLY the buckets
the late rows touch are recomputed (the `refreshed` flag + the pruned
rescan plan).
"""

import pandas as pd
from pyspark.sql import functions as F

from dads_spark.rollup import invalidate_and_refresh, rollup_from_raw


def _events(spark, n=5000, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    ts = pd.to_datetime(
        rng.integers(1_600_000_000, 1_600_400_000, n), unit="s"
    )
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "key": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    return spark.createDataFrame(pdf)


def test_refresh_equals_rebuild(spark):
    ev = _events(spark)
    is_late = F.col("event_id") % 7 == 0
    stale = rollup_from_raw(ev.filter(~is_late), ["key"], "ts", "v")
    got = invalidate_and_refresh(
        stale, ev, ev.filter(is_late), ["key"], "ts", "v"
    )
    want = rollup_from_raw(ev, ["key"], "ts", "v")
    g = got.drop("refreshed").orderBy("key", "bucket_ts").toPandas()
    w = want.orderBy("key", "bucket_ts").toPandas()
    pd.testing.assert_frame_equal(g.reset_index(drop=True), w.reset_index(drop=True))


def test_refreshed_flag_marks_exactly_touched_buckets(spark):
    ev = _events(spark)
    is_late = F.col("event_id") % 7 == 0
    late = ev.filter(is_late)
    stale = rollup_from_raw(ev.filter(~is_late), ["key"], "ts", "v")
    got = invalidate_and_refresh(stale, ev, late, ["key"], "ts", "v")
    from dads_spark.rollup.refresh import invalidation_set

    inval = {
        (r["key"], r["bucket_ts"])
        for r in invalidation_set(late, ["key"], "ts").collect()
    }
    for r in got.collect():
        assert r["refreshed"] == ((r["key"], r["bucket_ts"]) in inval)


def test_late_only_bucket_appears(spark):
    """A bucket whose rows are ALL late is absent from the stale tier and
    must appear in the refreshed output (not just patched in place)."""
    ev = _events(spark, n=2000, seed=9)
    # carve late = everything in one specific hour for key 'a'
    h0 = (
        ev.filter(F.col("key") == "a")
        .select(F.date_trunc("hour", "ts").alias("h"))
        .orderBy("h")
        .first()["h"]
    )
    is_late = (F.col("key") == "a") & (F.date_trunc("hour", "ts") == F.lit(h0))
    stale = rollup_from_raw(ev.filter(~is_late), ["key"], "ts", "v")
    got = invalidate_and_refresh(
        stale, ev, ev.filter(is_late), ["key"], "ts", "v"
    )
    row = got.filter(
        (F.col("key") == "a") & (F.col("bucket_ts") == F.lit(h0))
    ).collect()
    assert len(row) == 1 and row[0]["refreshed"]
    want = rollup_from_raw(ev, ["key"], "ts", "v").filter(
        (F.col("key") == "a") & (F.col("bucket_ts") == F.lit(h0))
    ).first()
    assert row[0]["doc_count"] == want["doc_count"]
    assert row[0]["value_sum"] == want["value_sum"]


def test_plan_is_broadcast_pruned(spark):
    """The rescan must be a broadcast LEFT SEMI and the splice a broadcast
    LEFT ANTI — no wide shuffle keyed on the invalidation set."""
    ev = _events(spark, n=1000)
    is_late = F.col("event_id") % 11 == 0
    stale = rollup_from_raw(ev.filter(~is_late), ["key"], "ts", "v")
    got = invalidate_and_refresh(
        stale, ev, ev.filter(is_late), ["key"], "ts", "v"
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
