"""Randomized property batteries for the r4s14 exact-integer kernels.

Same discipline as test_property_kernels: one batched Spark job over a
bank of random series (each series a key), every key checked against an
independent scalar reference; pure-local kernels (vopt DP, Haar, RLE)
get per-example randomized checks directly.
"""

from __future__ import annotations

import itertools
import math

import numpy as np

from dads_spark.oracles import haar_topk_oracle, seasonal_esd_oracle, vopt_oracle
from dads_spark.rollup import (
    control_chart_flags,
    runs_test,
    seasonal_esd_grouped,
    vopt_boundaries,
)
from dads_spark.rollup.wavelet import haar_coefficients


def _bank(rng, n_series=15, n=80):
    bank = {}
    for i in range(n_series):
        kind = i % 5
        if kind == 0:
            v = rng.poisson(9, n)
        elif kind == 1:
            v = rng.integers(0, 500, n)
        elif kind == 2:
            v = np.full(n, int(rng.integers(1, 6)))
        elif kind == 3:
            v = rng.integers(0, 3, n)
        else:
            v = np.abs(rng.normal(60, 25, n).astype(int))
        if i % 3 == 0 and kind != 2:
            v = v.copy()
            v[n // 2] = int(v.max()) * 5 + 50  # planted spike
        bank[f"s{i:02d}"] = [int(x) for x in v]
    return bank


def _df(spark, bank):
    rows = [(k, t, v) for k, vs in bank.items() for t, v in enumerate(vs)]
    return spark.createDataFrame(rows, "k string, t long, v long")


def test_control_chart_matches_float_rederivation_across_regimes(spark):
    rng = np.random.default_rng(401)
    bank = _bank(rng)
    out = {}
    for r in control_chart_flags(_df(spark, bank), ["k"], "t", "v").collect():
        out.setdefault(r["k"], {})[r["t"]] = (
            r["r1"], r["r2"], r["r3"], r["r4"]
        )
    for k, vals in bank.items():
        n = len(vals)
        mu = sum(vals) / n
        sd = math.sqrt(sum((x - mu) ** 2 for x in vals) / n)
        for i, v in enumerate(vals):
            r1 = abs(v - mu) > 3 * sd
            w9 = vals[max(0, i - 8): i + 1]
            r2 = len([x for x in w9 if x > mu]) == 9 or (
                len([x for x in w9 if x < mu]) == 9
            )
            w6 = vals[max(0, i - 5): i + 1]
            r3 = len(w6) == 6 and (
                all(a < b for a, b in zip(w6, w6[1:]))
                or all(a > b for a, b in zip(w6, w6[1:]))
            )
            w3 = vals[max(0, i - 2): i + 1]
            ab = len([x for x in w3 if x > mu and abs(x - mu) > 2 * sd])
            be = len([x for x in w3 if x < mu and abs(x - mu) > 2 * sd])
            r4 = ab >= 2 or be >= 2
            want = (int(r1), int(r2), int(r3), int(r4))
            got = out.get(k, {}).get(i, (0, 0, 0, 0))
            assert got == want, (k, i, got, want)


def test_esd_spark_equals_scalar_across_regimes(spark):
    rng = np.random.default_rng(402)
    bank = _bank(rng)
    got = {}
    for r in seasonal_esd_grouped(
        _df(spark, bank), ["k"], "t", "v", season=24, k=5
    ).collect():
        got.setdefault(r["k"], set()).add(
            (r["step"], r["t"], r["v"], r["u"], r["md"], r["sum_u"],
             r["n_active"], r["significant"])
        )
    for k, vals in bank.items():
        want = {
            tuple(row)
            for row in seasonal_esd_oracle(
                list(range(len(vals))), vals, season=24, k=5
            )
        }
        assert got.get(k, set()) == want, k


def test_runs_test_matches_scalar_across_regimes(spark):
    rng = np.random.default_rng(403)
    bank = _bank(rng)
    out = {r["k"]: r for r in runs_test(
        _df(spark, bank), ["k"], "t", "v"
    ).collect()}
    for k, vals in bank.items():
        sv = sorted(vals)
        n = len(sv)
        if n % 2 == 1:
            med2 = 2 * sv[n // 2]
        else:
            med2 = sv[n // 2 - 1] + sv[n // 2]
        sides = [1 if 2 * v > med2 else 0 for v in vals if 2 * v != med2]
        if not sides:
            assert k not in out or out[k]["n_runs"] == 0
            continue
        runs = 1 + sum(
            1 for a, b in zip(sides, sides[1:]) if a != b
        )
        r = out[k]
        assert r["n_runs"] == runs
        assert r["n_above"] == sum(sides)
        assert r["n_below"] == len(sides) - sum(sides)


def test_vopt_dp_optimal_on_random_small_arrays():
    rng = np.random.default_rng(404)

    def cost(seg):
        length = len(seg)
        s = sum(seg)
        q = sum(x * x for x in seg)
        return (1000 * (length * q - s * s)) // length

    for _ in range(25):
        n = int(rng.integers(4, 12))
        v = [int(x) for x in rng.integers(0, 40, n)]
        for b in (2, 3):
            starts = vopt_boundaries(np.array(v), b)
            ends = starts[1:] + [n]
            tot = sum(cost(v[s:e]) for s, e in zip(starts, ends))
            best = min(
                sum(
                    cost(v[s:e])
                    for s, e in zip((0, *c), (*c, n))
                )
                for c in itertools.combinations(range(1, n), b - 1)
            )
            assert tot == best, (v, b)
            assert [r[1] for r in vopt_oracle(v, b)] == starts


def test_haar_parseval_and_topk_on_random_series():
    rng = np.random.default_rng(405)
    for _ in range(25):
        n = int(rng.integers(2, 130))
        v = [int(x) for x in rng.integers(0, 300, n)]
        m = 1
        while m * 2 <= n:
            m *= 2
        coeffs = haar_coefficients(np.array(v))
        assert sum(e for *_, e in coeffs) == m * sum(
            x * x for x in v[:m]
        )
        top = haar_topk_oracle(v, 6)
        energies = [e for *_, e in top]
        assert energies == sorted(energies, reverse=True)


def test_rle_roundtrip_on_random_streams():
    from dads_spark.compress.rle import decode_values, encode_values

    rng = np.random.default_rng(406)
    for _ in range(30):
        n = int(rng.integers(1, 500))
        base = rng.choice(
            [0.0, -0.0, 1.5, float("nan"), 3.25e300, -7.0], size=n
        )
        out = decode_values(encode_values(base), n)
        assert np.array_equal(
            base.view(np.uint64), out.view(np.uint64)
        )
