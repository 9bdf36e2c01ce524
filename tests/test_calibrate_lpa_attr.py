"""Tests for the round-4 session-6 operators: quantile normalization,
deterministic label-propagation communities, last-touch attribution."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ quantile_normalize
def _scalar_qnorm(groups):
    """groups: {g: [(id, v)]} -> {(g, id): normalized} per the exact rule:
    within-group ordinal rank r of n maps to the pooled distribution's
    value at global ordinal rank ceil(r*N/n) (ties by (v, g, id))."""
    pooled = sorted(
        (v, g, i) for g, rows in groups.items() for i, v in rows
    )
    n_total = len(pooled)
    out = {}
    for g, rows in groups.items():
        ranked = sorted((v, i) for i, v in rows)
        n = len(ranked)
        for r, (v, i) in enumerate(ranked, start=1):
            t = -(-r * n_total // n)  # ceil
            out[(g, i)] = pooled[t - 1][0]
    return out


def test_quantile_normalize_scalar_reference(spark):
    from dads_spark.ops import quantile_normalize

    rng = np.random.default_rng(3)
    groups = {
        "a": [(i, float(rng.normal(0, 1))) for i in range(40)],
        "b": [(100 + i, float(rng.normal(50, 9))) for i in range(25)],
        "c": [(200 + i, float(rng.normal(-5, 0.1))) for i in range(7)],
    }
    rows = [(g, i, v) for g, rs in groups.items() for i, v in rs]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = quantile_normalize(df, ["g"], "v", "id").collect()
    want = _scalar_qnorm(groups)
    assert len(got) == len(want)
    for r in got:
        assert r["normalized"] == want[(r["g"], r["id"])], (r["g"], r["id"])
    # post-normalization the three groups share the same distribution
    # SHAPE: every group's max maps to the global max
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(r["normalized"])
    global_max = max(v for vs in by_g.values() for v in vs)
    for g, vs in by_g.items():
        assert max(vs) == global_max, g


def test_quantile_normalize_single_group_is_identity(spark):
    from dads_spark.ops import quantile_normalize

    rows = [("only", i, float(v)) for i, v in enumerate([5.0, -2.0, 9.5, 0.0])]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = quantile_normalize(df, ["g"], "v", "id").collect()
    for r in got:
        assert r["normalized"] == r["v"]


def test_quantile_normalize_partitioning_invariant(spark):
    from dads_spark.ops import quantile_normalize

    rows = [("g%d" % (i % 4), i, float((i * 37) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    a = quantile_normalize(df, ["g"], "v", "id").orderBy("id").collect()
    b = (
        quantile_normalize(df.repartition(13), ["g"], "v", "id")
        .orderBy("id")
        .collect()
    )
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


# ------------------------------------------------------- label_propagation
def _scalar_lpa(edges, rounds):
    und = set()
    for u, v in edges:
        if u != v:
            und.add((min(u, v), max(u, v)))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        nxt = {}
        for n, ns in nbrs.items():
            counts = {}
            for m in ns:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            # max count, min label on ties
            top = max(counts.values())
            nxt[n] = min(l for l, c in counts.items() if c == top)
        labels = nxt
    return labels


def test_label_propagation_two_cliques(spark):
    from dads_spark.ops import label_propagation

    # two 4-cliques bridged by one edge -> two communities
    cl1 = ["a1", "a2", "a3", "a4"]
    cl2 = ["b1", "b2", "b3", "b4"]
    edges = [(u, v) for i, u in enumerate(cl1) for v in cl1[i + 1:]]
    edges += [(u, v) for i, u in enumerate(cl2) for v in cl2[i + 1:]]
    edges.append(("a1", "b1"))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    want = _scalar_lpa(edges, 3)
    assert got == want
    # the cliques resolve to exactly two labels, one per clique
    assert len({got[n] for n in cl1}) == 1
    assert len({got[n] for n in cl2}) == 1
    assert {got[n] for n in cl1} != {got[n] for n in cl2}


def test_label_propagation_matches_scalar_on_random_graph(spark):
    from dads_spark.ops import label_propagation

    rng = np.random.default_rng(9)
    nodes = ["n%02d" % i for i in range(30)]
    edges = list(
        {
            (nodes[a], nodes[b])
            for a, b in rng.integers(0, 30, (120, 2))
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.label for r in label_propagation(df, rounds=4).collect()}
    assert got == _scalar_lpa(edges, 4)


# ------------------------------------------------------------- attribution
def test_attribution_window_and_order_semantics(spark):
    from dads_spark.rollup import last_touch_attribution

    h = 3600
    rows = [
        # user 1: click at t=0, view at t=10h, purchase at t=12h
        #   -> last touch = the view (most recent prior source)
        (1, 10, "click", 0),
        (1, 11, "view", 10 * h),
        (1, 12, "purchase", 12 * h),
        # user 2: click 30h before purchase -> outside 24h lookback
        (2, 20, "click", 0),
        (2, 21, "purchase", 30 * h),
        # user 3: source at the SAME ts as the conversion, smaller id
        #   -> strictly-prior by (ts, id) order, so it IS credited
        (3, 30, "view", 5 * h),
        (3, 31, "signup", 5 * h),
        # user 4: source AFTER the conversion -> never credited
        (4, 41, "purchase", 2 * h),
        (4, 40, "click", 3 * h),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_e long"
    ).withColumn("ts", F.col("ts_e").cast("timestamp"))
    out = {
        r["conv_id"]: r
        for r in last_touch_attribution(
            df, "user_id", "ts", "event_type", "event_id",
            ["click", "view"], ["purchase", "signup"], 86400
        ).collect()
    }
    assert out[12]["src_id"] == 11 and out[12]["src_type"] == "view"
    assert out[12]["n_sources_window"] == 2  # both inside the 24h range
    assert out[21]["src_id"] is None and out[21]["src_ts"] is None
    assert out[30 + 1]["src_id"] == 30
    assert out[41]["src_id"] is None
    assert len(out) == 4


# ------------------------------------------------- transition_matrix / skew
def test_transition_matrix_hand_case(spark):
    from dads_spark.rollup import transition_matrix

    rows = [
        (1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "buy", 30),
        (2, 4, "view", 10), (2, 5, "click", 20), (2, 6, "view", 30),
    ]
    df = spark.createDataFrame(
        rows, "u long, event_id long, t string, ts_e long"
    ).withColumn("ts", F.col("ts_e").cast("timestamp"))
    got = {
        (r["prev_type"], r["type"]): (r["n"], r["row_total"])
        for r in transition_matrix(df, "u", "ts", "t", "event_id").collect()
    }
    assert got == {
        ("view", "click"): (2, 2),
        ("click", "buy"): (1, 2),
        ("click", "view"): (1, 2),
    }


def test_shuffle_skew_report_detects_hot_key(spark):
    from dads_spark.ops import shuffle_skew_report

    rows = [(i, "hot") for i in range(900)] + [
        (900 + i, f"k{i}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "rid long, k string")
    rep = shuffle_skew_report(df, ["k"], n_hex=1).collect()
    assert sum(r["n_rows"] for r in rep) == 1000
    assert sum(r["n_keys"] for r in rep) == 101
    assert max(r["max_key_rows"] for r in rep) == 900  # the hot key shows
    assert all(len(r["bucket"]) == 1 for r in rep)


# ---------------------------------------------------------------- ab test
def test_ab_test_proportions_scalar_reference(spark):
    import hashlib
    import math

    from dads_spark.ops import ab_test_proportions

    rows = [(u, "g", u % 3 == 0) for u in range(400)]
    df = spark.createDataFrame(rows, "u long, g string, s boolean")
    got = ab_test_proportions(df, "u", F.col("s"), ["g"]).collect()[0]
    n_a = x_a = n_b = x_b = 0
    for u, _, s in rows:
        a = hashlib.md5(str(u).encode()).hexdigest()[0] in "01234567"
        if a:
            n_a += 1
            x_a += s
        else:
            n_b += 1
            x_b += s
    assert (got["n_a"], got["x_a"], got["n_b"], got["x_b"]) == (
        n_a, x_a, n_b, x_b,
    )
    pa, pb = x_a / n_a, x_b / n_b
    pool = (x_a + x_b) / (n_a + n_b)
    z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b))
    assert got["z"] == pytest.approx(z, rel=1e-12)
    # arm split is ~50/50 by md5 nibble
    assert abs(n_a - n_b) < 80


def test_ab_test_null_z_when_arm_empty(spark):
    from dads_spark.ops import ab_test_proportions

    # every md5 nibble of these units is in arm A's range? force it:
    # a_nibbles = all 16 nibbles -> arm B empty -> z null
    df = spark.createDataFrame([(1, "g", True), (2, "g", False)],
                               "u long, g string, s boolean")
    got = ab_test_proportions(
        df, "u", F.col("s"), ["g"], a_nibbles="0123456789abcdef"
    ).collect()[0]
    assert got["n_b"] == 0 and got["z"] is None
