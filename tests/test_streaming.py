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


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): batch 1 carries events up
    to 12:00 (advancing the 2h watermark past 09:00), batch 2 delivers a
    late 08:30 event — append mode must emit the 08:00 bucket WITHOUT the
    late row (it arrived behind the watermark), unlike the batch rollup."""
    import pandas as pd

    from dads_spark.streaming import streaming_hourly_rollup

    src = str(tmp_path / "late_src")
    rows1 = pd.DataFrame(
        {
            "event_type": ["a"] * 4,
            "ts": pd.to_datetime(
                ["2024-01-01 08:10", "2024-01-01 08:20", "2024-01-01 11:50", "2024-01-01 12:00"]
            ),
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    rows2 = pd.DataFrame(
        {
            "event_type": ["a"],
            "ts": pd.to_datetime(["2024-01-01 08:30"]),  # late: watermark is 10:00
            "value": [100.0],
        }
    )
    schema = "event_type string, ts timestamp, value double"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).format("parquet").load(src)
    agg = streaming_hourly_rollup(stream, ["event_type"], "ts", "value", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_stream")
        .start()
    )
    q.processAllAvailable()  # batch 1: on-time data, watermark -> 10:00
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()  # batch 2: the 08:30 row is behind the watermark
    q.stop()
    out = spark.sql("SELECT * FROM t_late_stream").toPandas()
    eight = out[out.bucket_ts == pd.Timestamp("2024-01-01 08:00")]
    # append mode only finalizes buckets the watermark has passed: the 08:00
    # bucket closed with its two on-time rows; the late 100.0 was dropped
    assert len(eight) == 1
    assert eight["doc_count"].iloc[0] == 2
    assert eight["value_sum"].iloc[0] == 3.0
