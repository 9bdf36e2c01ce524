"""Checkpoint manifest + resume-from-last-committed-tier."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dads_spark.checkpoint import CheckpointManager, TieredRollupJob, fingerprint
from dads_spark.fixtures.pages import pages_table


@pytest.fixture()
def raw(spark):
    return pages_table(spark, 2000).withColumn("tb", F.octet_length("text"))


def test_manifest_metrics(spark, raw, tmp_path):
    ckpt = CheckpointManager(spark, str(tmp_path / "ck"))
    fp = fingerprint({"x": 1})
    out = ckpt.commit("tier_hour", raw.limit(100), fp)
    assert out.count() == 100
    rows = ckpt.metrics("tier_hour")
    assert sum(r["row_count"] for r in rows) == 100
    assert all(r["input_fingerprint"] == fp for r in rows)
    assert ckpt.is_committed("tier_hour", fp)
    assert not ckpt.is_committed("tier_hour", fingerprint({"x": 2}))


def test_resume_skips_committed_tiers(spark, raw, tmp_path):
    root = str(tmp_path / "job")
    desc = {"source": "pages-fixture", "n": 2000}

    job1 = TieredRollupJob(spark, root, ["lang"])
    out1 = job1.run(raw, "warc_ts", "tb", desc)
    assert job1.ran_stages == ["tier_hour", "tier_day", "tier_week"]
    week_total = out1["week"].agg(F.sum("doc_count")).collect()[0][0]

    # "kill" + rerun: everything committed -> all skipped
    job2 = TieredRollupJob(spark, root, ["lang"])
    out2 = job2.run(raw, "warc_ts", "tb", desc)
    assert job2.skipped_stages == ["tier_hour", "tier_day", "tier_week"]
    assert job2.ran_stages == []
    assert out2["week"].agg(F.sum("doc_count")).collect()[0][0] == week_total

    # changed inputs invalidate the checkpoint
    job3 = TieredRollupJob(spark, root, ["lang"])
    job3.run(raw, "warc_ts", "tb", {"source": "pages-fixture", "n": 2001})
    assert job3.ran_stages == ["tier_hour", "tier_day", "tier_week"]


def test_partial_commit_resumes_midway(spark, raw, tmp_path):
    """Simulate a kill after the day tier: hour+day skipped, week recomputed."""
    root = str(tmp_path / "partial")
    desc = {"source": "p", "n": 2000}
    job1 = TieredRollupJob(spark, root, ["lang"])
    job1.run(raw, "warc_ts", "tb", desc)
    # wipe only the week tier (as if the job died before committing it)
    import shutil

    shutil.rmtree(root + "/_manifest/stage=tier_week")
    job2 = TieredRollupJob(spark, root, ["lang"])
    job2.run(raw, "warc_ts", "tb", desc)
    assert job2.skipped_stages == ["tier_hour", "tier_day"]
    assert job2.ran_stages == ["tier_week"]
