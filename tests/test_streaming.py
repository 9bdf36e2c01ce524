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


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer == batch window-sum sessionizer
    once every session is closed (a far-future sentinel row advances the
    watermark so event-time timeouts flush all real sessions)."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as em
    from dads_spark.streaming import run_sessionize_stream

    rng = np.random.default_rng(9)
    n = 4000
    base = pd.Timestamp("2024-03-01")
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            # mostly small gaps with occasional >30min jumps -> real sessions
            "ts": base
            + pd.to_timedelta(
                np.sort(rng.integers(0, 5 * 86_400, n)), unit="s"
            ),
            "event_type": "click",
            "value": rng.uniform(0, 10, n).round(3),
            "props": "{}",
        }
    )
    src = str(tmp_path / "backlog")
    events_df = spark.createDataFrame(pdf)
    events_df.coalesce(1).write.mode("overwrite").parquet(src)
    # sentinel: one far-future row for a user id outside the real range;
    # its event time drags the watermark past every real session's horizon
    sent = pdf.iloc[:1].copy()
    sent["event_id"] = n
    sent["user_id"] = 10_000
    sent["ts"] = base + pd.Timedelta(days=30)
    spark.createDataFrame(sent).coalesce(1).write.mode("append").parquet(src)

    got = (
        run_sessionize_stream(spark, src, events_df.schema, query_name="t_sess")
        .filter("user_id < 10000")
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )

    # batch oracle: the same sessionization over the same parquet (sentinel
    # excluded), via the driver-gated batch query
    sf_like = str(tmp_path / "sf")
    import os

    os.makedirs(sf_like, exist_ok=True)
    spark.read.parquet(src).filter("user_id < 10000").write.mode(
        "overwrite"
    ).parquet(f"{sf_like}/events.parquet")
    want = (
        em.q_sessionize(spark, sf_like)
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 60
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (got["session_id"].to_numpy() == want["session_id"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert (got["duration_us"].to_numpy() == want["duration_us"].to_numpy()).all()
    assert np.allclose(
        got["value_sum"].to_numpy(), want["value_sum"].to_numpy(), atol=0.01
    )


def test_streaming_hopping_topk_matches_batch(spark, tmp_path):
    # incremental hopping counts + serving-side rank == batch hopping
    # rollup + the same rank; tie-free by (n DESC, key ASC)
    from pyspark.sql import Window as W

    from dads_spark.rollup import hopping_rollup
    from dads_spark.streaming import run_hopping_topk_once

    src = str(tmp_path / "hop_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)

    out = run_hopping_topk_once(
        spark, src, events.schema, ["event_type"], "ts", k=3,
        query_name="t_hop_topk",
    ).toPandas()

    rank_w = W.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    batch = (
        hopping_rollup(events, ["event_type"], "ts", None,
                       window="1 hour", slide="15 minutes")
        .withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= 3)
        .toPandas()
    )
    key = ["window_start", "rnk"]
    a = out.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    assert (a["event_type"].to_numpy() == b["event_type"].to_numpy()).all()
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()


def test_streaming_zscore_two_batches_matches_batch(spark, tmp_path):
    """The integer z-score state machine carries (n, s, q) across
    micro-batches: two time-ordered batches must reproduce the batch
    running-window formulation exactly (exact integers — `==`, no
    tolerance)."""
    import numpy as np
    import pandas as pd

    from dads_spark.streaming import streaming_zscore

    rng = np.random.default_rng(5)
    n = 400
    ts = pd.to_datetime(1_700_000_000 + np.arange(n) * 60, unit="s")
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b"], n),
            "ts": ts,
            "x": rng.integers(0, 50, n).astype("int64"),
        }
    )
    # plant an extreme value late in each key's sequence
    pdf.loc[n - 3, "x"] = 5000
    pdf.loc[n - 2, "x"] = 5000
    src = str(tmp_path / "zs_src")
    schema = "event_id long, event_type string, ts timestamp, x long"
    half = n // 2  # time-ordered split: batch 1 = first half
    spark.createDataFrame(pdf.iloc[:half], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(schema).format("parquet").load(src)
    q = (
        streaming_zscore(stream, min_n=20)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_zscore_stream")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(pdf.iloc[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM t_zscore_stream")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    # batch reference: running sums per key in (ts, event_id) order
    want_rows = []
    for k, g in pdf.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        x = g["x"].to_numpy()
        cn = np.arange(len(x), dtype=np.int64)
        cs = np.concatenate(([0], np.cumsum(x)[:-1]))
        cq = np.concatenate(([0], np.cumsum(x * x)[:-1]))
        flag = (cn * x - cs) ** 2 > 9 * (cn * cq - cs * cs)
        keep = cn >= 20
        for eid, xi, ni, fi in zip(
            g["event_id"].to_numpy()[keep], x[keep], cn[keep], flag[keep]
        ):
            want_rows.append((eid, k, xi, ni, fi))
    want = (
        pd.DataFrame(
            want_rows,
            columns=["event_id", "event_type", "x", "n_prev", "is_outlier"],
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["n_prev"].to_numpy() == want["n_prev"].to_numpy()).all()
    assert (got["is_outlier"].to_numpy() == want["is_outlier"].to_numpy()).all()
    # the planted spikes must be flagged
    spikes = got[got["x"] == 5000]
    assert len(spikes) == 2 and spikes["is_outlier"].all()


def test_streaming_cusum_two_batches_matches_batch(spark, tmp_path):
    """The integer CUSUM state machine carries (baseline, P, min P)
    across micro-batches: two time-ordered batches must reproduce the
    prefix-identity batch formulation exactly (exact integers)."""
    import math

    import numpy as np
    import pandas as pd

    from dads_spark.streaming import streaming_cusum

    rng = np.random.default_rng(9)
    n = 400
    ts = pd.to_datetime(1_700_000_000 + np.arange(n) * 60, unit="s")
    x = rng.integers(40, 60, n).astype("int64")
    x[300:] += 40  # mean shift late in the series -> alarm_up
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b"], n),
            "ts": ts,
            "x": x,
        }
    )
    src = str(tmp_path / "cu_src")
    schema = "event_id long, event_type string, ts timestamp, x long"
    half = n // 2
    spark.createDataFrame(pdf.iloc[:half], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    q = (
        streaming_cusum(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_cusum_stream")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(pdf.iloc[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM t_cusum_stream")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    # batch mirror: baseline first 30, r = isqrt, prefix identity
    want_rows = []
    B = 30
    for k, g in pdf.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        xx = g["x"].to_numpy()
        s, qq = int(xx[:B].sum()), int((xx[:B] * xx[:B]).sum())
        sd2 = B * qq - s * s
        if len(xx) <= B or sd2 <= 0:
            continue
        r = math.isqrt(sd2)
        d2 = 2 * (B * xx[B:] - s)
        pu = np.cumsum(d2 - r)
        pn = np.cumsum(-d2 - r)
        sp = pu - np.minimum(np.minimum.accumulate(pu), 0)
        sn = pn - np.minimum(np.minimum.accumulate(pn), 0)
        for eid, a, b2, au, ad in zip(
            g["event_id"].to_numpy()[B:], sp, sn, sp > 10 * r, sn > 10 * r
        ):
            want_rows.append((eid, k, a, b2, au, ad))
    want = (
        pd.DataFrame(
            want_rows,
            columns=["event_id", "event_type", "sp", "sn", "alarm_up", "alarm_down"],
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for c in ["event_id", "sp", "sn", "alarm_up", "alarm_down"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # the planted shift is detected
    assert got[got["event_id"] >= 320]["alarm_up"].any()
