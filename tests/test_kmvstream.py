"""Streaming KMV store: equals the batch sketch, survives replay
(idempotent merge — no ledger), resumes after a kill."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dads_spark.streaming.kmvstream import _sketch, run_kmv_stream


@pytest.fixture()
def tmpbase(tmp_path):
    return str(tmp_path)


def _src(spark, tmpbase, n=400, files=4):
    rows = [(i % 5, i * 7919 % 997) for i in range(n)]
    df = spark.createDataFrame(rows, "k long, item long")
    path = f"{tmpbase}/src"
    df.repartition(files).write.mode("overwrite").parquet(path)
    return path, df


def _batch_sketch(df, k=16):
    return _sketch(
        df.select(
            F.col("k").cast("string").alias("k"),
            F.md5(F.col("item").cast("string")).alias("_h"),
        ),
        ["k"],
        k,
    )


def _collect(df):
    return sorted((r.k, tuple(r.kmv)) for r in df.collect())


def test_stream_equals_batch(spark, tmpbase):
    path, df = _src(spark, tmpbase)
    schema = spark.read.parquet(path).schema
    n = run_kmv_stream(
        spark, path, schema, ["k"], "item",
        f"{tmpbase}/store", f"{tmpbase}/ckpt", k=16,
    )
    assert n == 4  # one batch per file
    got = _collect(
        spark.read.parquet(f"{tmpbase}/store").withColumn(
            "k", F.col("k").cast("string")
        )
    )
    want = _collect(_batch_sketch(df))
    assert got == want


def test_stream_replay_is_idempotent(spark, tmpbase):
    path, df = _src(spark, tmpbase)
    schema = spark.read.parquet(path).schema
    run_kmv_stream(
        spark, path, schema, ["k"], "item",
        f"{tmpbase}/store", f"{tmpbase}/ckpt", k=16,
    )
    before = _collect(spark.read.parquet(f"{tmpbase}/store"))
    # replay the WHOLE backlog with a fresh checkpoint against the
    # existing store: every batch re-folds, nothing changes
    run_kmv_stream(
        spark, path, schema, ["k"], "item",
        f"{tmpbase}/store", f"{tmpbase}/ckpt2", k=16,
    )
    assert _collect(spark.read.parquet(f"{tmpbase}/store")) == before


def test_stream_resume_converges(spark, tmpbase):
    path, df = _src(spark, tmpbase)
    schema = spark.read.parquet(path).schema
    # feed only half the files first (simulates a stop mid-backlog)
    part = f"{tmpbase}/part"
    os.makedirs(part)
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    for f in files[:2]:
        shutil.copy(f"{path}/{f}", f"{part}/{f}")
    run_kmv_stream(
        spark, part, schema, ["k"], "item",
        f"{tmpbase}/store", f"{tmpbase}/ckpt", k=16,
    )
    # backlog grows; same checkpoint resumes with only the new files
    for f in files[2:]:
        shutil.copy(f"{path}/{f}", f"{part}/{f}")
    n2 = run_kmv_stream(
        spark, part, schema, ["k"], "item",
        f"{tmpbase}/store", f"{tmpbase}/ckpt", k=16,
    )
    assert n2 >= 1
    got = _collect(
        spark.read.parquet(f"{tmpbase}/store").withColumn(
            "k", F.col("k").cast("string")
        )
    )
    assert got == _collect(_batch_sketch(df))
