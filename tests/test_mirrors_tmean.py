"""Host-mirror detection and exact trimmed mean."""

from __future__ import annotations

import math

import numpy as np

from dads_spark.ops import mirror_hosts
from dads_spark.rollup import trimmed_mean


def _occ_df(spark, occ):
    return spark.createDataFrame(occ, "host string, fp string")


def test_mirror_planted_subset(spark):
    occ = [("a.com", f"f{i}") for i in range(10)]
    occ += [("b.com", f"f{i}") for i in range(8)]      # subset of a
    occ += [("c.com", f"g{i}") for i in range(5)]      # disjoint
    out = {(r["host_a"], r["host_b"]): r for r in
           mirror_hosts(_occ_df(spark, occ), "host", "fp").collect()}
    assert set(out) == {("a.com", "b.com")}
    r = out[("a.com", "b.com")]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (8, 10, 8)
    assert r["containment_q6"] == 1_000_000   # b fully contained in a
    assert r["jaccard_q6"] == 800_000         # 8 / 10


def test_mirror_duplicate_rows_collapse(spark):
    occ = [("a.com", "f1")] * 3 + [("b.com", "f1")] * 2
    occ += [("a.com", "f2"), ("b.com", "f2")]
    r = mirror_hosts(_occ_df(spark, occ), "host", "fp").collect()[0]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (2, 2, 2)
    assert r["jaccard_q6"] == 1_000_000


def test_mirror_ubiquity_cap_excludes_boilerplate(spark):
    # 'boiler' lives on 20 hosts -> excluded; h0/h1 also share f1, f2
    occ = [(f"h{i}.com", "boiler") for i in range(20)]
    occ += [("h0.com", "f1"), ("h1.com", "f1"),
            ("h0.com", "f2"), ("h1.com", "f2")]
    out = mirror_hosts(
        _occ_df(spark, occ), "host", "fp",
        min_shared=2, max_hosts_per_fp=16,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"]) == ("h0.com", "h1.com")
    assert r["n_shared"] == 2            # boiler did NOT count
    assert r["n_a"] == 3                 # ...but sizes still include it
    # with a higher cap the boiler fp joins and every pair appears
    out_hi = mirror_hosts(
        _occ_df(spark, occ), "host", "fp",
        min_shared=1, max_hosts_per_fp=32,
    ).collect()
    assert len(out_hi) == 20 * 19 // 2


def test_mirror_min_shared_filter(spark):
    occ = [("a.com", "f1"), ("b.com", "f1"),
           ("a.com", "f2"), ("b.com", "f3")]
    assert mirror_hosts(
        _occ_df(spark, occ), "host", "fp", min_shared=2
    ).count() == 0
    assert mirror_hosts(
        _occ_df(spark, occ), "host", "fp", min_shared=1
    ).count() == 1


def _vals_df(spark, series):
    rows = [(k, float(v)) for k, vals in series.items() for v in vals]
    return spark.createDataFrame(rows, "k string, value double")


def test_tmean_hand_case(spark):
    r = trimmed_mean(
        _vals_df(spark, {"h": list(range(10))}), ["k"], "value"
    ).collect()[0]
    assert (r["n"], r["n_trimmed_each_side"], r["n_kept"]) == (10, 1, 8)
    assert r["sum_kept_q6"] == 36_000_000           # 1+..+8 in q6
    assert r["tmean_q6"] == 4_500_000


def test_tmean_robust_to_planted_outlier(spark):
    vals = [10.0] * 19 + [1e6]
    r = trimmed_mean(
        _vals_df(spark, {"o": vals}), ["k"], "value"
    ).collect()[0]
    assert r["n_trimmed_each_side"] == 2
    assert r["tmean_q6"] == 10_000_000   # the 1e6 spike fell in the tail


def test_tmean_negative_and_zero_trim(spark):
    r = trimmed_mean(
        _vals_df(spark, {"n": [-5.0, -1.0, -3.0]}), ["k"], "value",
        trim_q6=0,
    ).collect()[0]
    assert (r["n"], r["n_kept"]) == (3, 3)
    assert r["sum_kept_q6"] == -9_000_000
    assert r["tmean_q6"] == -3_000_000


def test_tmean_matches_scalar_replica(spark):
    rng = np.random.default_rng(29)
    vals = list(rng.normal(50, 20, 137))
    r = trimmed_mean(
        _vals_df(spark, {"r": vals}), ["k"], "value",
        trim_q6=150_000,
    ).collect()[0]
    xq = sorted(
        int(math.copysign(math.floor(abs(v) * 1e6 + 0.5), v))
        for v in vals
    )
    n = len(xq)
    k = (n * 150_000) // 1_000_000
    kept = xq[k: n - k]
    s = sum(kept)
    sgn = -1 if s < 0 else 1
    assert (r["n"], r["n_trimmed_each_side"], r["n_kept"]) == (
        n, k, len(kept),
    )
    assert r["sum_kept_q6"] == s
    assert r["tmean_q6"] == sgn * ((2 * abs(s) + len(kept)) // (2 * len(kept)))
