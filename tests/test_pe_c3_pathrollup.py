"""Permutation entropy, c3/trev nonlinearity, URL path-prefix rollup."""

from __future__ import annotations

import math

import numpy as np

from dads_spark.ops import path_prefix_rollup
from dads_spark.rollup import nonlinearity_stats, perm_entropy


def _series_df(spark, series):
    rows = [
        (k, i, int(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "k string, hw long, cnt long")


_PERM_COLS = {5: "c012", 7: "c021", 11: "c102", 15: "c120",
              19: "c201", 21: "c210"}


def _pe_naive(vals):
    counts = {nm: 0 for nm in _PERM_COLS.values()}
    n = 0
    for t in range(len(vals) - 2):
        x0, x1, x2 = vals[t], vals[t + 1], vals[t + 2]
        # int() casts: numpy bool addition is logical OR, not arithmetic
        r0 = int(x1 < x0) + int(x2 < x0)
        r1 = int(x0 <= x1) + int(x2 < x1)
        r2 = int(x0 <= x2) + int(x1 <= x2)
        counts[_PERM_COLS[9 * r0 + 3 * r1 + r2]] += 1
        n += 1
    sum_t = sum(
        math.floor(c * math.log(c) * 1000 + 0.5)
        for c in counts.values()
        if c > 0
    )
    pe = math.floor(math.log(n) * 1000 + 0.5) - (2 * sum_t + n) // (2 * n)
    return n, counts, pe


def test_pe_monotone_and_constant_are_zero(spark):
    df = _series_df(spark, {"up": list(range(30)), "const": [4] * 30})
    out = {r["k"]: r for r in
           perm_entropy(df, ["k"], "hw", "cnt").collect()}
    for k in ("up", "const"):
        assert out[k]["c012"] == 28  # stable ties land in c012
        assert out[k]["pe_q3"] == 0, k


def test_pe_alternating_is_ln2(spark):
    df = _series_df(spark, {"alt": [0, 1] * 20})
    r = perm_entropy(df, ["k"], "hw", "cnt").collect()[0]
    assert r["c021"] + r["c102"] == r["n_templates"]
    assert abs(r["c021"] - r["c102"]) <= 1
    assert abs(r["pe_q3"] - 693) <= 1  # ln 2 = 0.6931


def test_pe_matches_naive_on_random(spark):
    rng = np.random.default_rng(3)
    series = {
        "poisson": list(rng.poisson(9, 150)),
        "noise": list(rng.integers(0, 1000, 150)),
        "tied": list(rng.integers(0, 3, 150)),
    }
    out = {r["k"]: r for r in
           perm_entropy(_series_df(spark, series), ["k"], "hw", "cnt")
           .collect()}
    for k, vals in series.items():
        n, counts, pe = _pe_naive(vals)
        assert out[k]["n_templates"] == n, k
        for nm, c in counts.items():
            assert out[k][nm] == c, (k, nm)
        assert out[k]["pe_q3"] == pe, k


def _half_up(num, n):
    s = -1 if num < 0 else 1
    return s * ((2 * abs(num) + n) // (2 * n))


def test_c3_trev_constant_series(spark):
    c, n_pts = 7, 40
    df = _series_df(spark, {"const": [c] * n_pts})
    rows = {r["lag"]: r for r in
            nonlinearity_stats(df, ["k"], "hw", "cnt", lags=(1, 5))
            .collect()}
    for lag in (1, 5):
        n = n_pts - 2 * lag
        assert rows[lag]["n"] == n
        assert rows[lag]["c3_num"] == c ** 3 * n
        assert rows[lag]["trev_num"] == 0
        assert rows[lag]["c3_mean"] == c ** 3
        assert rows[lag]["trev_mean"] == 0


def test_c3_trev_matches_naive_on_random(spark):
    rng = np.random.default_rng(17)
    vals = [int(v) for v in rng.integers(0, 50, 200)]
    rows = {r["lag"]: r for r in
            nonlinearity_stats(
                _series_df(spark, {"r": vals}), ["k"], "hw", "cnt",
                lags=(1, 3),
            ).collect()}
    for lag in (1, 3):
        n = len(vals) - 2 * lag
        c3 = sum(
            vals[t] * vals[t + lag] * vals[t + 2 * lag] for t in range(n)
        )
        trev = sum(
            vals[t + 2 * lag] ** 2 * vals[t + lag]
            - vals[t + lag] * vals[t] ** 2
            for t in range(n)
        )
        r = rows[lag]
        assert (r["n"], r["c3_num"], r["trev_num"]) == (n, c3, trev)
        assert r["c3_mean"] == _half_up(c3, n)
        assert r["trev_mean"] == _half_up(trev, n)


def test_trev_signed_on_sawtooth(spark):
    # slow ramp, sharp drop — time-reversal asymmetric by construction
    saw = ([0, 1, 2, 3, 4, 5, 6, 7] * 10)
    rows = {r["lag"]: r for r in
            nonlinearity_stats(
                _series_df(spark, {"saw": saw}), ["k"], "hw", "cnt",
                lags=(1,),
            ).collect()}
    assert rows[1]["trev_num"] != 0


def test_path_rollup_hand_case(spark):
    rows = [
        ("https://www.Ex.com/a/b/c?q=1#frag", 10),
        ("https://www.ex.com/a/b", 5),
        ("https://www.ex.com/a", 1),
        ("https://other.org/x/y/z/w/deep", 2),   # depth capped at 4
        ("https://other.org/", 99),              # no segments -> dropped
    ]
    df = spark.createDataFrame(rows, "url string, w long")
    out = {
        (r["host"], r["prefix"]): r
        for r in path_prefix_rollup(df, "url", "w", max_depth=4).collect()
    }
    assert out[("www.ex.com", "/a")]["n_pages"] == 3
    assert out[("www.ex.com", "/a")]["sum_weight"] == 16
    assert out[("www.ex.com", "/a/b")]["n_pages"] == 2
    assert out[("www.ex.com", "/a/b/c")]["sum_weight"] == 10
    assert out[("www.ex.com", "/a/b/c")]["depth"] == 3
    # depth cap: /x/y/z/w present, /x/y/z/w/deep absent
    assert ("other.org", "/x/y/z/w") in out
    assert ("other.org", "/x/y/z/w/deep") not in out
    # root-only URL contributes nothing
    assert not any(h == "other.org" and p == "/" for h, p in out)
    # query/fragment never leak into prefixes
    assert all("?" not in p and "#" not in p for _, p in out)


def test_path_rollup_default_weight_counts_pages(spark):
    df = spark.createDataFrame(
        [("https://h.io/a/b",), ("https://h.io/a/c",)], "url string"
    )
    out = {r["prefix"]: r for r in
           path_prefix_rollup(df, "url").collect()}
    assert out["/a"]["n_pages"] == 2 and out["/a"]["sum_weight"] == 2
