"""Randomized property batteries for the r4s13 exact-integer kernels.

Spark jobs are too slow for per-example hypothesis, so the keyed
operators run ONE batched job over many random series (each series a
key) and every key is checked against an independent scalar reference —
the same coverage, one JVM round-trip.
"""

from __future__ import annotations

import math

import numpy as np

from dads_spark.ops import maxmin_fair
from dads_spark.rollup import perm_entropy, sample_entropy, trimmed_mean


def _random_series_bank(rng, n_series=18, n=90):
    """Mixed regimes: plateaus (hot SampEn buckets), spread, bursts."""
    bank = {}
    for i in range(n_series):
        kind = i % 6
        if kind == 0:
            v = rng.poisson(8, n)                       # tight counts
        elif kind == 1:
            v = rng.integers(0, 2000, n)                # spread
        elif kind == 2:
            v = np.full(n, int(rng.integers(0, 5)))     # pure plateau
        elif kind == 3:
            v = rng.integers(0, 3, n)                   # heavy ties
        elif kind == 4:
            v = np.repeat(rng.integers(0, 50, n // 10), 10)[:n]  # steps
        else:
            v = np.abs(rng.normal(100, 40, n).astype(int))
        bank[f"s{i:02d}"] = [int(x) for x in v]
    return bank


def _series_df(spark, bank):
    rows = [(k, t, v) for k, vs in bank.items() for t, v in enumerate(vs)]
    return spark.createDataFrame(rows, "k string, hw long, cnt long")


def test_sampen_banding_lossless_across_regimes(spark):
    rng = np.random.default_rng(101)
    bank = _random_series_bank(rng)
    out = {r["k"]: r for r in sample_entropy(
        _series_df(spark, bank), ["k"], "hw", "cnt", r=2
    ).collect()}
    for k, vals in bank.items():
        tpl = [(vals[t], vals[t + 1], vals[t + 2])
               for t in range(len(vals) - 2)]
        b = a = 0
        for i in range(len(tpl)):
            for j in range(i + 1, len(tpl)):
                if (abs(tpl[i][0] - tpl[j][0]) <= 2
                        and abs(tpl[i][1] - tpl[j][1]) <= 2):
                    b += 1
                    if abs(tpl[i][2] - tpl[j][2]) <= 2:
                        a += 1
        assert (out[k]["b_count"], out[k]["a_count"]) == (b, a), k


def test_perm_entropy_counts_partition_templates(spark):
    rng = np.random.default_rng(202)
    bank = _random_series_bank(rng)
    cols = ["c012", "c021", "c102", "c120", "c201", "c210"]
    out = {r["k"]: r for r in perm_entropy(
        _series_df(spark, bank), ["k"], "hw", "cnt"
    ).collect()}
    for k, vals in bank.items():
        r = out[k]
        # the six counts partition the template set exactly
        assert sum(r[c] for c in cols) == r["n_templates"] == len(vals) - 2
        assert 0 <= r["pe_q3"] <= math.floor(math.log(6) * 1000 + 0.5) + 1


def test_trimmed_mean_bounded_by_min_max_and_monotone_trim(spark):
    rng = np.random.default_rng(303)
    bank = _random_series_bank(rng)
    df = _series_df(spark, bank).withColumnRenamed("cnt", "value")
    lo = {r["k"]: r for r in trimmed_mean(
        df, ["k"], "value", trim_q6=50_000
    ).collect()}
    hi = {r["k"]: r for r in trimmed_mean(
        df, ["k"], "value", trim_q6=250_000
    ).collect()}
    for k, vals in bank.items():
        assert min(vals) * 1_000_000 <= lo[k]["tmean_q6"] \
            <= max(vals) * 1_000_000
        # deeper trims keep fewer points and never widen the range
        assert hi[k]["n_kept"] <= lo[k]["n_kept"]
        assert hi[k]["n_kept"] >= 1


def test_maxmin_fair_invariants_random_instances(spark):
    rng = np.random.default_rng(404)
    for trial in range(4):
        d = {f"g{i:02d}": int(v)
             for i, v in enumerate(rng.integers(1, 60, 12))}
        total = sum(d.values())
        cap = int(rng.integers(1, total + 20))
        df = spark.createDataFrame(
            list(d.items()), "grp string, demand long"
        )
        out = {r["grp"]: r for r in
               maxmin_fair(df, capacity=cap).collect()}
        allocs = {g: r["allocated"] for g, r in out.items()}
        assert all(0 <= allocs[g] <= d[g] for g in d), trial
        assert sum(allocs.values()) == min(cap, total), trial
        unsat = [allocs[g] for g in d if allocs[g] < d[g]]
        if unsat:
            assert max(unsat) - min(unsat) <= 1, trial
        # resource monotonicity: more capacity never hurts anyone
        out2 = {r["grp"]: r["allocated"] for r in
                maxmin_fair(df, capacity=cap + 7).collect()}
        assert all(out2[g] >= allocs[g] for g in d), trial
