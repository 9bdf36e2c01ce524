"""SQ8 scalar quantization (ops/quantize.py:sq8_*), watermark tuning
(rollup/ingest.py:watermark_tuning), encoding advisor (ops/profile.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dads_spark.ops import ann_sq8, encoding_advisor, sq8_encode, sq8_train
from dads_spark.rollup import watermark_tuning


def _emb(spark, n=200, dim=8):
    rows = [
        (i, [float(((i * 37 + j * 11) % 97) - 48) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sq8_codes_in_range_and_deterministic(spark):
    emb = _emb(spark)
    lo, hi = sq8_train(emb, "embedding", dim=8)
    a = {r["vec_id"]: r["codes"] for r in sq8_encode(emb, lo, hi).collect()}
    b = {r["vec_id"]: r["codes"] for r in
         sq8_encode(emb.repartition(16), lo, hi).collect()}
    assert a == b
    assert all(0 <= c <= 255 for codes in a.values() for c in codes)
    # extremes map to the rails
    flat = [c for codes in a.values() for c in codes]
    assert 0 in flat and 255 in flat


def test_sq8_scan_matches_scalar_bruteforce(spark):
    emb = _emb(spark)
    lo, hi = sq8_train(emb, "embedding", dim=8)
    codes = {r["vec_id"]: r["codes"] for r in sq8_encode(emb, lo, hi).collect()}
    queries = np.array(
        [[float(((q * 37 + j * 11) % 97) - 48) for j in range(8)]
         for q in (3, 4)]
    )
    got = ann_sq8(sq8_encode(emb, lo, hi), queries, lo, hi, k=5)
    got = {(r["query_id"], r["rank"]): (r["vec_id"], r["score"])
           for r in got.collect()}
    span = np.where(hi > lo, hi - lo, 1.0)
    qc = np.clip(np.floor((queries - lo) * 255.0 / span + 0.5), 0, 255)
    for qi in range(2):
        scored = sorted(
            ((-int(np.dot(codes[v], qc[qi])), v) for v in codes)
        )[:5]
        for rk, (neg, v) in enumerate(scored, start=1):
            assert got[(qi, rk)] == (v, -neg)


def test_watermark_monotone_in_delay_and_exact_small_case(spark):
    # arrival order: ev 100 (ar 0), ev 50 (ar 1), ev 99 (ar 2)
    rows = [("k", 1, 100, 0), ("k", 2, 50, 1), ("k", 3, 99, 2)]
    df = spark.createDataFrame(
        rows, "key string, id long, ev long, ar long"
    )
    out = {r["delay_sec"]: r["n_dropped"] for r in watermark_tuning(
        df, "key", "ev", "ar", "id", [0, 10, 60]
    ).collect()}
    # delay 0: ev50 < 100 dropped, ev99 < 100 dropped -> 2
    # delay 10: ev50 < 90 dropped, ev99 >= 90 kept -> 1
    # delay 60: ev50 >= 40 kept -> 0
    assert out == {0: 2, 10: 1, 60: 0}


def test_watermark_partition_invariant(spark):
    df = spark.range(500).select(
        F.concat(F.lit("k"), (F.col("id") % 3).cast("string")).alias("key"),
        F.col("id").alias("id"),
        (F.col("id") * 7).alias("ev"),
        (F.col("id") * 7 + (F.col("id") % 11) * 13).alias("ar"),
    )
    a = sorted(map(tuple, watermark_tuning(
        df, "key", "ev", "ar", "id", [0, 50]).collect()))
    b = sorted(map(tuple, watermark_tuning(
        df.repartition(16, "ev"), "key", "ev", "ar", "id", [0, 50]
    ).collect()))
    assert a == b


def test_encoding_advisor_recommendations(spark):
    df = spark.range(1000).select(
        F.col("id").alias("o"),
        (F.col("id") % 3).cast("string").alias("lowcard"),   # dict
        # 100 runs of length 10: too many distincts for dict (100*20 >
        # 1000), compressible runs for rle (100*10 <= 1000)
        (F.col("id") / 10).cast("long").alias("runny"),
        F.col("id").cast("string").alias("unique_col"),      # plain
    )
    out = {r["column"]: r for r in encoding_advisor(
        df, ["lowcard", "runny", "unique_col"], "o"
    ).collect()}
    assert out["lowcard"]["recommendation"] == "dict"
    assert out["lowcard"]["ndv"] == 3
    assert out["runny"]["recommendation"] == "rle"
    assert out["runny"]["n_runs"] == 100
    assert out["unique_col"]["recommendation"] == "plain"
    assert out["unique_col"]["ndv"] == 1000
