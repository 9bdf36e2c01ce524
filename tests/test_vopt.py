"""V-optimal histogram DP: optimality, determinism, Spark parity."""

from __future__ import annotations

import itertools

import numpy as np

from dads_spark.oracles import vopt_oracle
from dads_spark.rollup import vopt_boundaries, vopt_histogram_grouped


def _cost_q3(seg):
    length = len(seg)
    s = sum(seg)
    s2 = sum(x * x for x in seg)
    return (1000 * (length * s2 - s * s)) // length


def _brute_best(v, b):
    """Minimum total q3 cost over ALL contiguous partitions."""
    n = len(v)
    best = None
    for cuts in itertools.combinations(range(1, n), b - 1):
        bounds = [0, *cuts, n]
        tot = sum(
            _cost_q3(v[s:e]) for s, e in zip(bounds, bounds[1:])
        )
        if best is None or tot < best:
            best = tot
    return best


def test_dp_is_optimal_vs_brute_force():
    rng = [5, 5, 6, 50, 52, 51, 5, 4, 6, 5, 90, 91]
    for b in (2, 3, 4):
        starts = vopt_boundaries(np.array(rng), b)
        ends = starts[1:] + [len(rng)]
        tot = sum(_cost_q3(rng[s:e]) for s, e in zip(starts, ends))
        assert tot == _brute_best(rng, b)


def test_boundaries_land_on_level_shifts():
    v = np.array([10] * 8 + [100] * 8 + [10] * 8)
    starts = vopt_boundaries(v, 3)
    assert starts == [0, 8, 16]


def test_fewer_points_than_buckets():
    assert vopt_boundaries(np.array([7, 9]), 6) == [0, 1]
    assert vopt_boundaries(np.array([7]), 6) == [0]


def test_oracle_matches_numpy_dp():
    v = [((i * 29) % 13) + (20 if 15 <= i < 25 else 0) for i in range(40)]
    starts = vopt_boundaries(np.array(v), 5)
    oracle = vopt_oracle(v, 5)
    assert [r[1] for r in oracle] == starts
    # per-bucket moments agree
    ends = starts[1:] + [len(v)]
    for (bi, s, e, n, sv, s2, c), (ws, we) in zip(
        oracle, zip(starts, ends)
    ):
        assert (s, e) == (ws, we)
        assert sv == sum(v[s:e]) and n == e - s


def test_spark_matches_oracle(spark):
    v = [((i * 17) % 11) + (30 if i in (20, 21) else 0) for i in range(50)]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(v)],
        "key string, t long, v long",
    )
    got = {
        (r["bucket"], r["t_start"], r["t_end"], r["n"], r["sum_v"],
         r["sum2_v"], r["cost_q3"])
        for r in vopt_histogram_grouped(df, ["key"], "t", "v", b=4).collect()
    }
    want = {
        (bi, s, e - 1, n, sv, s2, c)
        for bi, s, e, n, sv, s2, c in vopt_oracle(v, 4)
    }
    assert got == want
