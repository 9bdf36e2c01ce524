"""Spark pipeline vs NumPy oracle: bit-parity at equal partitioning."""

from __future__ import annotations

import numpy as np
import pytest

from dads_spark.fixtures import benchmark_series
from dads_spark.s2g import S2GParams, s2g_oracle
from dads_spark.s2g.pipeline import run_s2g_distributed, score_series_grouped

PARAMS = S2GParams(m=20, c=6, S=30, ell=30)


@pytest.fixture(scope="module")
def series():
    return benchmark_series(1500, seed=11)


def test_distributed_bit_parity(spark, series):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(series)], "idx long, value double"
    )
    for p in (1, 4):
        out = (
            # threshold=0: force the DISTRIBUTED plan (the adaptive
            # small-input path would trivially compare oracle to oracle)
            run_s2g_distributed(
                spark, df, PARAMS, n_slices=p, n=len(series),
                small_series_threshold=0,
            )
            .orderBy("window_idx")
            .toPandas()
        )
        ora = s2g_oracle(series, PARAMS, n_slices=p)
        assert len(out) == len(ora.scores)
        assert (out["window_idx"].to_numpy() == np.arange(len(out))).all()
        assert (out["score"].to_numpy() == ora.scores).all(), (
            f"spark vs oracle not bit-identical at P={p}"
        )


def test_small_series_adaptive_path_identical(spark, series):
    """The adaptive small-input path must return exactly the distributed
    plan's rows (same schema, same bits)."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(series)], "idx long, value double"
    )
    fast = run_s2g_distributed(
        spark, df, PARAMS, n_slices=4, n=len(series)
    ).orderBy("window_idx").toPandas()
    dist = run_s2g_distributed(
        spark, df, PARAMS, n_slices=4, n=len(series), small_series_threshold=0
    ).orderBy("window_idx").toPandas()
    assert list(fast.columns) == list(dist.columns)
    assert (fast["window_idx"].to_numpy() == dist["window_idx"].to_numpy()).all()
    assert (fast["score"].to_numpy() == dist["score"].to_numpy()).all()


def test_grouped_scorer_matches_oracle(spark):
    keys = ["a", "b", "c"]
    rows = []
    for k_i, k in enumerate(keys):
        x = benchmark_series(900, seed=k_i)
        rows += [(k, i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "domain string, t long, value double")
    out = score_series_grouped(df, ["domain"], "t", "value", PARAMS).toPandas()
    for k_i, k in enumerate(keys):
        x = benchmark_series(900, seed=k_i)
        ora = s2g_oracle(x, PARAMS, n_slices=1)
        got = out[out["domain"] == k].sort_values("window_idx")["score"].to_numpy()
        assert len(got) == len(ora.scores)
        assert (got == ora.scores).all()


def test_grouped_scorer_skips_short_series(spark):
    df = spark.createDataFrame(
        [("tiny", i, float(i)) for i in range(10)], "domain string, t long, value double"
    )
    out = score_series_grouped(df, ["domain"], "t", "value", PARAMS).toPandas()
    assert len(out) == 0
