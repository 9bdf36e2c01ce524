"""Streaming foreachBatch tier backfill (streaming/backfill.py):
incremental maintenance == from-scratch rollup, kill/resume, idempotent
replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.rollup import rollup_from_raw
from dads_spark.streaming import run_tier_backfill_stream


def _events(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 67).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.pmod(F.hash("id"), F.lit(1000)) / 10.0).alias("value"),
    )


def _rows(collected):
    return {
        (r["event_type"], r["bucket_ts"]): (
            r["doc_count"],
            r["value_sum"],
            r["value_min"],
            r["value_max"],
        )
        for r in collected
    }


def _assert_tier_equals_batch(spark, path, ev):
    import math

    got = _rows(spark.read.parquet(path).drop("bucket_date").collect())
    want = _rows(
        rollup_from_raw(ev, ["event_type"], "ts", "value", "hour").collect()
    )
    assert got.keys() == want.keys()
    for k, (gc, gs, gmin, gmax) in got.items():
        wc, ws, wmin, wmax = want[k]
        # counts and extrema are exact; the multi-batch merged sum may
        # differ from the single-pass sum in the last ulps (float
        # addition order), so compare with a tight relative tolerance
        assert (gc, gmin, gmax) == (wc, wmin, wmax), k
        assert math.isclose(gs, ws, rel_tol=1e-9), (k, gs, ws)


def test_backfill_multi_batch_equals_batch_rollup(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    tier, ckpt = str(tmp_path / "tier"), str(tmp_path / "ckpt")
    merged = run_tier_backfill_stream(
        spark, src, ev.schema, ["event_type"], "ts", "value", tier, ckpt
    )
    assert merged == 4  # one merge per staged file
    _assert_tier_equals_batch(spark, tier, ev)


def test_backfill_kill_resume_and_idempotent_replay(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    tier, ckpt = str(tmp_path / "tier"), str(tmp_path / "ckpt")

    # crash after 2 committed merges
    with pytest.raises(Exception, match="injected failure"):
        run_tier_backfill_stream(
            spark, src, ev.schema, ["event_type"], "ts", "value",
            tier, ckpt, fail_after_batches=2,
        )

    # resume from the stream checkpoint: only the uncommitted tail runs
    resumed = run_tier_backfill_stream(
        spark, src, ev.schema, ["event_type"], "ts", "value", tier, ckpt
    )
    assert 0 < resumed < 4
    _assert_tier_equals_batch(spark, tier, ev)

    # a replay over the exhausted checkpoint folds nothing and changes
    # nothing (ledger + source offsets both already committed)
    again = run_tier_backfill_stream(
        spark, src, ev.schema, ["event_type"], "ts", "value", tier, ckpt
    )
    assert again == 0
    _assert_tier_equals_batch(spark, tier, ev)


def test_backfill_comaintains_distinct_sketch_tier(spark, tmp_path):
    from dads_spark.rollup.distinct import distinct_sketch_tier, with_estimate

    ev = _events(spark).withColumn(
        "user_id", (F.col("event_id") % 37).cast("long")
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    tier, ckpt = str(tmp_path / "tier"), str(tmp_path / "ckpt")
    run_tier_backfill_stream(
        spark, src, ev.schema, ["event_type"], "ts", "value", tier, ckpt,
        distinct_item_col="user_id",
    )
    streamed = {
        (r["event_type"], r["bucket_ts"]): r["approx_distinct"]
        for r in with_estimate(
            spark.read.parquet(tier + "_distinct").drop("bucket_date")
        ).collect()
    }
    batch = {
        (r["event_type"], r["bucket_ts"]): r["approx_distinct"]
        for r in with_estimate(
            distinct_sketch_tier(ev, ["event_type"], "ts", "user_id")
        ).collect()
    }
    # register-max union is associative: the incrementally-maintained
    # sketches equal a from-scratch batch build, estimate for estimate.
    # (the batch side may keep a single-pass HIP estimator when a group
    # lands in one partition — compare with the documented envelope)
    assert streamed.keys() == batch.keys()
    for k in batch:
        b, s = batch[k], streamed[k]
        assert abs(b - s) <= max(0.02 * max(b, s), 0.5), (k, b, s)
