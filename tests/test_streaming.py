"""Streaming hourly rollup equals the batch hour tier on a bounded backlog."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from dads_spark.rollup import rollup_from_raw
from dads_spark.streaming import run_stream_once


def test_streaming_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)

    out = run_stream_once(
        spark,
        src,
        events.schema,
        ["event_type"],
        "ts",
        "value",
        query_name="t_rollup_stream",
    ).toPandas()

    batch = (
        rollup_from_raw(events, ["event_type"], "ts", "value", "hour")
        .toPandas()
    )
    a = out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)
    b = batch.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["doc_count"].to_numpy() == b["doc_count"].to_numpy()).all()
    assert abs(a["value_sum"].to_numpy() - b["value_sum"].to_numpy()).max() < 1e-6
