"""Mann-Kendall trend test, interpolated time-above-threshold, URL
path-template mining — kernel exactness + Spark/partition invariance."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dads_spark.rollup import duration_above, mann_kendall_grouped
from dads_spark.rollup.trend import mann_kendall_stats
from dads_spark.ops import url_templates


def _mk_brute(v):
    v = np.asarray(v, dtype=np.int64)
    n = len(v)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += int(np.sign(v[j] - v[i]))
    _, counts = np.unique(v, return_counts=True)
    tie_term = int(np.sum(counts * (counts - 1) * (2 * counts + 5)))
    var18 = n * (n - 1) * (2 * n + 5) - tie_term if n >= 2 else 0
    ties = int(np.sum(counts * (counts - 1) // 2))
    return (s if n >= 2 else 0, var18, ties)


def test_mk_monotonic_up_is_max_s():
    v = np.arange(10)
    s, var18, ties = mann_kendall_stats(v)
    assert s == 45  # n(n-1)/2, every pair concordant
    assert ties == 0
    assert var18 == 10 * 9 * 25


def test_mk_monotonic_down_is_min_s():
    s, _, _ = mann_kendall_stats(np.arange(10)[::-1].copy())
    assert s == -45


def test_mk_constant_series_all_ties():
    s, var18, ties = mann_kendall_stats(np.full(6, 7))
    assert s == 0
    assert ties == 15
    # tie correction removes the whole variance: t_g = n
    assert var18 == 0


def test_mk_short_series():
    assert mann_kendall_stats(np.array([3])) == (0, 0, 0)
    assert mann_kendall_stats(np.array([], dtype=np.int64)) == (0, 0, 0)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=2, max_size=60)
)
def test_mk_fenwick_matches_brute_force(vals):
    v = np.asarray(vals, dtype=np.int64)
    assert mann_kendall_stats(v) == _mk_brute(v)


def test_mk_grouped_partition_invariant(spark):
    rows = [
        ("a", t, int(v))
        for t, v in enumerate([1, 3, 2, 2, 5, 4, 6, 6, 6, 8])
    ] + [("b", t, t * t) for t in range(8)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out1 = {
        r["k"]: (r["s_stat"], r["var18"], r["tie_pairs"], r["n"])
        for r in mann_kendall_grouped(df, ["k"], "t", "v").collect()
    }
    out32 = {
        r["k"]: (r["s_stat"], r["var18"], r["tie_pairs"], r["n"])
        for r in mann_kendall_grouped(
            df.repartition(32), ["k"], "t", "v"
        ).collect()
    }
    assert out1 == out32
    va = np.array([1, 3, 2, 2, 5, 4, 6, 6, 6, 8])
    assert out1["a"] == (*mann_kendall_stats(va), 10)
    assert out1["b"][0] == 28  # strictly increasing: all concordant


def test_duration_above_exact_segments(spark):
    # one series: v = 0 at t=0, 10 at t=100, 10 at t=200, 0 at t=300
    # thr=5: segment1 crosses up -> (10-5)/(10-0) * 100s = 50s above;
    # segment2 fully above -> 100s; segment3 crosses down -> 50s
    rows = [("k", 0, 0), ("k", 100, 10), ("k", 200, 10), ("k", 300, 0)]
    df = spark.createDataFrame(rows, "k string, ts long, v long")
    out = duration_above(df, ["k"], threshold=5, ts_col="ts", value_col="v")
    r = out.collect()[0]
    assert r["above_us"] == 200_000_000
    assert r["total_us"] == 300_000_000
    assert r["n_segments"] == 3


def test_duration_above_boundary_semantics(spark):
    # "above" is strict: a segment pinned AT the threshold contributes 0
    rows = [("k", 0, 5), ("k", 10, 5), ("k", 20, 6)]
    df = spark.createDataFrame(rows, "k string, ts long, v long")
    r = duration_above(df, ["k"], 5, "ts", "v").collect()[0]
    # seg1 (5->5): 0; seg2 (5->6): vlo==thr -> crossing branch gives the
    # full span (above everywhere except the measure-zero endpoint)
    assert r["above_us"] == 10_000_000
    assert r["total_us"] == 20_000_000


def test_duration_above_floor_division_exact(spark):
    # crossing fraction 1/3 of a 10s span: floor(10e6 * 1 / 3)
    rows = [("k", 0, 0), ("k", 10, 3)]
    df = spark.createDataFrame(rows, "k string, ts long, v long")
    r = duration_above(df, ["k"], 2, "ts", "v").collect()[0]
    assert r["above_us"] == 3_333_333


def test_url_templates_collapses_ids(spark):
    urls = [
        "https://ex.com/p/123",
        "https://ex.com/p/99999",
        "https://ex.com/a/deadbeef1234/view",
        "https://ex.com/a/0123456789ab/view",
        "https://ex.com/static/about",
        "https://ex.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {
        (r["host"], r["template"]): (r["n_pages"], r["n_paths"])
        for r in url_templates(df).collect()
    }
    assert out[("ex.com", "/p/{n}")] == (2, 2)
    assert out[("ex.com", "/a/{hex}/view")] == (2, 2)
    assert out[("ex.com", "/static/about")] == (1, 1)
    assert out[("ex.com", "/")] == (1, 1)


def test_url_templates_hex_before_digits(spark):
    # a 12-hex id that STARTS with digits must collapse as one {hex},
    # not '{n}' + trailing letters — order of the two rules is the
    # contract
    df = spark.createDataFrame(
        [("https://h.io/x/1234567890ab/y",)], "url string"
    )
    out = url_templates(df).collect()
    assert out[0]["template"] == "/x/{hex}/y"


@pytest.mark.parametrize("n_part", [1, 7])
def test_url_templates_partition_invariant(spark, n_part):
    urls = [(f"https://s{i % 3}.net/item/{i * 17}",) for i in range(60)]
    df = spark.createDataFrame(urls, "url string").repartition(n_part)
    out = sorted(
        (r["host"], r["template"], r["n_pages"], r["n_paths"])
        for r in url_templates(df).collect()
    )
    assert out == [(f"s{k}.net", "/item/{n}", 20, 20) for k in range(3)]
