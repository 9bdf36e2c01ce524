"""Quantile-digest rank-error bounds + merge invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dads_spark.ops.sketch import quantile_digest


@pytest.fixture(scope="module")
def values(spark):
    rng = np.random.default_rng(17)
    frames = []
    for key, dist in [
        ("normal", rng.normal(50, 10, 20_000)),
        ("lognorm", rng.lognormal(2, 1, 20_000)),
    ]:
        frames.append(pd.DataFrame({"k": key, "v": dist}))
    pdf = pd.concat(frames)
    return spark.createDataFrame(pdf), pdf


PROBS = [0.1, 0.5, 0.9, 0.99]


def test_rank_error_within_bound(spark, values):
    df, pdf = values
    out = quantile_digest(df, ["k"], "v", PROBS, compression=256).toPandas()
    for key, grp in pdf.groupby("k"):
        v = np.sort(grp["v"].to_numpy())
        for p in PROBS:
            approx = out[(out.k == key) & (out.prob == p)]["value"].iloc[0]
            realized = np.searchsorted(v, approx) / len(v)
            assert abs(realized - p) <= 0.02, (key, p, realized)


def test_partitioning_invariance(spark, values):
    df, _ = values
    a = quantile_digest(df, ["k"], "v", [0.5], 128).toPandas()
    b = quantile_digest(df.repartition(17), ["k"], "v", [0.5], 128).toPandas()
    a = a.sort_values("k").reset_index(drop=True)
    b = b.sort_values("k").reset_index(drop=True)
    # merge is order-insensitive over centroid multisets; different
    # partitionings give different partials, so values agree to rank
    # tolerance, not bitwise
    for x, y in zip(a["value"], b["value"]):
        assert x == pytest.approx(y, rel=0.05)


def test_exact_when_under_compression(spark):
    # fewer distinct values than compression: digest is exact interpolation
    pdf = pd.DataFrame({"k": "s", "v": np.arange(100, dtype=float)})
    df = spark.createDataFrame(pdf).coalesce(1)
    out = quantile_digest(df, ["k"], "v", [0.5], compression=256).toPandas()
    assert out["value"].iloc[0] == pytest.approx(49.5, abs=0.5)


def test_hour_to_day_cascade_from_stored_sketches(spark):
    # quantiles of a day merged FROM the stored hour sketches track the
    # exact day quantiles — without re-reading raw data
    from pyspark.sql import functions as F

    from dads_spark.ops.sketch import digest, digest_quantiles, merge_digests

    rng = np.random.default_rng(31)
    hours = [f"2024-01-01 {h:02d}" for h in range(24)]
    pdf = pd.DataFrame(
        {
            "day": "2024-01-01",
            "hour": np.repeat(hours, 2000),
            # hour-dependent location: merging must weigh hours correctly
            "v": np.concatenate(
                [rng.normal(10 + h, 3, 2000) for h in range(24)]
            ),
        }
    )
    df = spark.createDataFrame(pdf)
    hour_sketches = digest(df, ["day", "hour"], "v", compression=128)
    day_q = digest_quantiles(
        merge_digests(hour_sketches.drop("hour"), ["day"], 128), ["day"], [0.5, 0.9]
    ).toPandas()
    v = np.sort(pdf["v"].to_numpy())
    for p in (0.5, 0.9):
        approx = day_q[day_q.prob == p]["value"].iloc[0]
        realized = np.searchsorted(v, approx) / len(v)
        assert abs(realized - p) <= 0.02, (p, realized)
