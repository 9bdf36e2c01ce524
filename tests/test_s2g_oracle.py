"""End-to-end oracle tests: partition invariance + discord detection."""

from __future__ import annotations

import numpy as np
import pytest

from dads_spark.fixtures import benchmark_series
from dads_spark.s2g import CANONICAL, S2GParams, s2g_oracle


@pytest.fixture(scope="module")
def series():
    return benchmark_series(4000)


@pytest.fixture(scope="module")
def result_p1(series):
    return s2g_oracle(series, CANONICAL, n_slices=1)


@pytest.mark.parametrize("n_slices", [2, 4, 7])
def test_partition_invariance(series, result_p1, n_slices):
    rp = s2g_oracle(series, CANONICAL, n_slices=n_slices)
    assert len(rp.scores) == len(result_p1.scores)
    # distributed PCA re-associates float sums, so multi-partition agrees to
    # tolerance, not bit-for-bit (true of the reference across cluster sizes
    # too); rank order of the anomaly windows must be stable.
    np.testing.assert_allclose(rp.scores, result_p1.scores, atol=1e-9)
    top1 = set(np.argsort(result_p1.scores)[-50:])
    topp = set(np.argsort(rp.scores)[-50:])
    assert len(top1 & topp) >= 48


def test_score_vector_shape(series, result_p1):
    n, m, ell = len(series), CANONICAL.m, CANONICAL.ell
    # slots = pairs = (n - m + 1) - 1, raw = slots - ell + 1, final = raw - m + 1
    assert len(result_p1.raw_scores) == (n - m) - ell + 1
    assert len(result_p1.scores) == len(result_p1.raw_scores) - m + 1


def test_detects_planted_discords(series, result_p1):
    s = result_p1.scores
    top = np.argsort(s)[-80:]
    # benchmark_series plants a random-walk splice at 1200 and a spike at 2800;
    # scoring windows cover [w, w + m + ell), so hits start up to ~m+ell early
    hit_splice = ((top >= 1200 - CANONICAL.m - CANONICAL.ell) & (top <= 1275)).sum()
    hit_spike = ((top >= 2800 - CANONICAL.m - CANONICAL.ell) & (top <= 2830)).sum()
    assert hit_splice > 0, "splice discord not in top-80 windows"
    assert hit_spike > 0, "spike discord not in top-80 windows"


def test_anomaly_ranges(result_p1):
    s = result_p1.scores
    thr = float(np.quantile(s, 0.99))
    ranges = result_p1.anomaly_ranges(thr)
    assert ranges, "no anomalous ranges at the 99th percentile"
    covered = sum(b - a for a, b in ranges)
    assert covered == (s > thr).sum()
    # merged ranges are disjoint and ordered
    for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
        assert b1 < a2


def test_small_params_variant():
    x = benchmark_series(1200, seed=3)
    params = S2GParams(m=20, c=6, S=30, ell=30)
    r = s2g_oracle(x, params, n_slices=1)
    # slots before the first intersection get no edges (lastNode is null,
    # GraphPartitionCreator.java:31-40) so the slot count can trail the
    # pair count by the first intersection's subsequence index
    assert 0 < len(r.scores) <= (1200 - 20) - 30 + 1 - 20 + 1
    assert len(r.scores) == len(r.raw_scores) - 20 + 1
    assert np.isfinite(r.scores).all()
