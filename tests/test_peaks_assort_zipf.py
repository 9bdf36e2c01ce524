"""Peak prominence, degree assortativity, Zipf slope — exact-integer ops."""

from __future__ import annotations

import math

import numpy as np

from dads_spark.ops import degree_assortativity, zipf_slope
from dads_spark.rollup import peak_prominence


def _prom_brute(xq: list[int]) -> dict[int, tuple[int, int]]:
    """{1-based peak pos: (height, prominence)} by direct definition."""
    n = len(xq)
    out = {}
    for i in range(1, n - 1):
        h = xq[i]
        if not (xq[i] > xq[i - 1] and xq[i] > xq[i + 1]):
            continue
        lb = 0
        for s in range(i - 1, -1, -1):
            if xq[s] > h:
                lb = s + 1
                break
        rb = n + 1
        for s in range(i + 1, n):
            if xq[s] > h:
                rb = s + 2
                break
        left = min(xq[s] for s in range(lb, i))          # (lb, tp) open, 1-based
        right = min(xq[s] for s in range(i + 1, rb - 1))  # (tp, rb) open
        out[i + 1] = (h, h - max(left, right))
    return out


def _peaks_df(spark, vals, key="k"):
    rows = [(key, i + 1, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, t long, value double")


def test_peak_prominence_hand_case(spark):
    # 1 3 2 5 1 4 2: peaks at pos 2 (h=3), 4 (h=5), 6 (h=4)
    vals = [1, 3, 2, 5, 1, 4, 2]
    out = {
        r["peak_pos"]: (r["height_q6"], r["prominence_q6"])
        for r in peak_prominence(
            _peaks_df(spark, vals), ["k"], "t", "value"
        ).collect()
    }
    q = 1_000_000
    # pos 2: bounds (start, 4); bases min(1)=1 left, min(2)=2 right -> 3-2=1
    # pos 4: global max; bases 1 and 1 -> 4
    # pos 6: bounds (4, end); bases 1 and 2 -> 4-2=2
    assert out == {2: (3 * q, 1 * q), 4: (5 * q, 4 * q), 6: (4 * q, 2 * q)}


def test_peak_prominence_matches_bruteforce_random(spark):
    rng = np.random.default_rng(5)
    vals = np.round(rng.normal(10, 3, 300), 2)
    xq = [int(np.sign(v)) * int(math.floor(abs(v) * 1e6 + 0.5)) for v in vals]
    want = _prom_brute(xq)
    got = {
        r["peak_pos"]: (r["height_q6"], r["prominence_q6"])
        for r in peak_prominence(
            _peaks_df(spark, vals), ["k"], "t", "value"
        ).collect()
    }
    assert got == want and len(want) > 30


def test_peak_prominence_min_filter_and_multi_key(spark):
    rows = [("a", i + 1, float(v)) for i, v in enumerate([0, 5, 0, 1.5, 0])]
    rows += [("b", i + 1, float(v)) for i, v in enumerate([2, 2, 2])]
    df = spark.createDataFrame(rows, "k string, t long, value double")
    out = peak_prominence(df, ["k"], "t", "value", min_prom_q6=2_000_000)
    got = [(r["k"], r["peak_pos"]) for r in out.collect()]
    assert got == [("a", 2)]  # the 1.5 peak filtered, constant series none


def test_degree_assortativity_exact_vs_numpy(spark):
    # star-ish digraph: hub -> 3 leaves, leaves -> hub (disassortative)
    edges = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "h"), ("b", "h")]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = degree_assortativity(df).collect()[0]
    dout = {"h": 3, "a": 1, "b": 1}
    din = {"a": 1, "b": 1, "c": 1, "h": 2}
    x = np.array([dout[s] for s, _ in edges], dtype=float)
    y = np.array([din[d] for _, d in edges], dtype=float)
    m = len(edges)
    num = m * (x * y).sum() - x.sum() * y.sum()
    dx = m * (x * x).sum() - x.sum() ** 2
    dy = m * (y * y).sum() - y.sum() ** 2
    want = num / (math.sqrt(dx) * math.sqrt(dy))
    assert r["m"] == 5 and r["sx"] == int(x.sum()) and r["sy"] == int(y.sum())
    assert r["r_q6"] == int(np.sign(want)) * int(
        math.floor(abs(want) * 1e6 + 0.5)
    )
    assert r["r_q6"] < 0  # hub->leaf wiring is disassortative


def test_degree_assortativity_degenerate_zero(spark):
    # 2-cycle: every endpoint degree is 1 -> zero variance -> r_q6 = 0
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    r = degree_assortativity(df).collect()[0]
    assert r["r_q6"] == 0 and r["m"] == 2


def test_zipf_slope_scalar_replica(spark):
    # synthetic Zipfian corpus: word w_r appears ~ N/r times
    words = []
    for rank in range(1, 40):
        words += [f"w{rank:02d}"] * (2000 // rank)
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    r = zipf_slope(df, top_v=30).collect()[0]
    # scalar replica of the documented integer arithmetic
    from collections import Counter

    cnt = Counter(words)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    xs = [int(math.floor(math.log(i + 1) * 1e3 + 0.5)) for i in range(30)]
    ys = [int(math.floor(math.log(c) * 1e3 + 0.5)) for _, c in ranked]
    v = 30
    num = v * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = v * sum(a * a for a in xs) - sum(xs) ** 2
    want = num / den
    assert r["v"] == 30
    assert r["n_tokens"] == sum(c for _, c in ranked)
    assert r["num"] == num and r["den"] == den
    assert r["slope_q6"] == int(np.sign(want)) * int(
        math.floor(abs(want) * 1e6 + 0.5)
    )
    # a Zipfian corpus regresses near slope -1 (q6 units)
    assert -1_200_000 < r["slope_q6"] < -800_000
