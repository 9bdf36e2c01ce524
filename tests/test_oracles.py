"""The staged-oracle kernels (dads_spark/oracles.py) vs the production
vectorized kernels, on synthetic series: the scalar textbook formulations
must reproduce the production outputs bit-for-bit (or to quantization for
the brute-force matrix profile, which intentionally shares no arithmetic
with STOMP). These are the kernel-level halves of the staged-dump twins in
__spark_entry__.py; the distributed halves are gated by
tests/test_entry_compare.py's full oracle sweep."""

from __future__ import annotations

import numpy as np

from dads_spark.oracles import (
    brute_matrix_profile,
    cusum_oracle,
    ewma_oracle,
    holt_oracle,
    lttb_oracle_indices,
    top_discords_oracle,
    winnow_oracle,
)
from dads_spark.rollup.downsample import lttb_indices
from dads_spark.rollup.forecast import cusum_changepoints, holt_forecast
from dads_spark.rollup.matrixprofile import matrix_profile, top_discords

RNG = np.random.default_rng(7)


def _series(n: int) -> np.ndarray:
    # integer-valued counts with daily seasonality + a planted level shift,
    # the same shape the twins run on
    t = np.arange(n)
    base = 40 + 12 * np.sin(2 * np.pi * t / 24) + RNG.normal(0, 3, n)
    base[2 * n // 3 :] += 15
    return np.maximum(np.round(base), 0.0)


def test_lttb_oracle_matches_kernel_indices():
    for n, n_out in [(500, 100), (680, 100), (120, 50), (30, 10)]:
        v = _series(n)
        t = (np.arange(n, dtype=np.int64) * 3600 * 10**9).astype(np.float64)
        assert lttb_oracle_indices(t, v, n_out) == lttb_indices(t, v, n_out).tolist()


def test_holt_oracle_bitwise():
    v = _series(700)
    f1, r1 = holt_forecast(v, 0.3, 0.1)
    f2, r2 = holt_oracle(v, 0.3, 0.1)
    assert np.array_equal(f1, f2, equal_nan=True)
    assert np.array_equal(r1, r2, equal_nan=True)


def test_cusum_oracle_bitwise():
    v = _series(700)
    assert cusum_oracle(v, 0.5, 4.0) == cusum_changepoints(v, 0.5, 4.0)
    quiet = np.round(RNG.normal(50, 2, 400))
    assert cusum_oracle(quiet, 0.5, 4.0) == cusum_changepoints(quiet, 0.5, 4.0)


def test_ewma_oracle_matches_explicit_weights():
    # kernel-level independence: the pandas recurrence vs the closed-form
    # adjusted weighted sum
    v = _series(300)
    a = 0.3
    ew = ewma_oracle(v, a)
    w = (1 - a) ** np.arange(len(v))[::-1]
    for t in [0, 1, 5, 50, 299]:
        expect = np.dot(v[: t + 1], w[len(v) - t - 1 :]) / w[len(v) - t - 1 :].sum()
        assert abs(ew[t] - expect) < 1e-9 * max(1.0, abs(expect))


def test_brute_mp_matches_stomp_and_discords_agree():
    v = _series(680)
    m = 24
    mp_fast, _ = matrix_profile(v, m)
    mp_brute = brute_matrix_profile(v, m)
    assert mp_fast.shape == mp_brute.shape
    assert np.allclose(mp_fast, mp_brute, atol=1e-8)
    assert top_discords(mp_fast, m, 3) == top_discords_oracle(mp_brute, m, 3)


def test_brute_mp_flat_window_convention():
    v = np.concatenate([np.full(30, 5.0), _series(60), np.full(30, 5.0)])
    m = 12
    mp_fast, _ = matrix_profile(v, m)
    mp_brute = brute_matrix_profile(v, m)
    assert np.allclose(mp_fast, mp_brute, atol=1e-8)


def test_fnv_scalar_matches_vectorized_kernel():
    from dads_spark.oracles import fnv1a_scalar
    from dads_spark.ops.dedup import _fnv1a_tokens

    toks = ["", "a", "the", "qu1ck", "ümläut", "x" * 40]
    vec = _fnv1a_tokens(toks)
    for t, v in zip(toks, vec):
        assert fnv1a_scalar(t) == int(v)


def test_winnow_oracle_known_properties():
    # deterministic, position-independent fingerprints; ties resolved
    # rightmost (robust winnowing): a run of identical k-grams must still
    # yield fingerprints, and a shared substring yields shared prints
    a = winnow_oracle("the quick brown fox jumps over the lazy dog " * 3)
    assert a and a == sorted(set(a))
    b = winnow_oracle("PREFIX " + "the quick brown fox jumps over the lazy dog " * 3)
    assert set(a) & set(b)
    assert winnow_oracle("aaaaaaaaaaaaaaaaaaaaaaaa")  # all-tie windows
    assert winnow_oracle("") == []
    assert winnow_oracle("short") == []  # below k-gram length


def test_ams_f2_linearity_and_accuracy(spark):
    from pyspark.sql import functions as F

    from dads_spark.ops import ams_f2

    df = spark.range(4000).select(
        F.lit("k").alias("key"),
        (F.pmod(F.hash("id"), F.lit(200))).cast("long").alias("v"),
    )
    r = ams_f2(df, ["key"], "v").collect()[0]
    assert r["n_rows"] == 4000
    # median of 5 group-means of 16 estimators: concentration is tight
    # (deterministic signs — either always passes or never)
    assert abs(r["f2_est"] - r["f2_exact"]) <= r["f2_exact"] * 0.5
    # linearity: sketch of a 2x-duplicated stream has every S_j
    # doubled, so S_j^2 quadruples EXACTLY; the only slack is the
    # per-group floor division (< 4 absolute after scaling, + a
    # possible near-tie median-group flip bounded by the same)
    r2 = ams_f2(df.union(df), ["key"], "v").collect()[0]
    assert r2["f2_exact"] == 4 * r["f2_exact"]
    assert abs(r2["f2_est"] - 4 * r["f2_est"]) <= 8


def test_ams_f2_partition_invariant(spark):
    from pyspark.sql import functions as F

    from dads_spark.ops import ams_f2

    df = spark.range(1000).select(
        F.lit("k").alias("key"),
        F.pmod(F.hash("id"), F.lit(50)).cast("long").alias("v"),
    )
    a = ams_f2(df.repartition(1), ["key"], "v").collect()[0]
    b = ams_f2(df.repartition(13), ["key"], "v").collect()[0]
    assert tuple(a) == tuple(b)
