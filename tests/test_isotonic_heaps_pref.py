"""Isotonic PAV vs the minimax characterization (hypothesis), Heaps
growth curve, preference win-rate Wilson bounds."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dads_spark.ops import heaps_growth, isotonic_fit, preference_winrate
from dads_spark.ops.calibrate import _pav_blocks
from dads_spark.oracles import isotonic_minimax_oracle


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 5)),
        min_size=1,
        max_size=12,
    )
)
def test_pav_equals_minimax_characterization(levels):
    # (n, y_sum<=n*5) per level: PAV stack == max-min averages, exactly
    ns = [n for n, _ in levels]
    ss = [min(s, n * 5) for n, s in levels]
    pav = _pav_blocks(list(range(len(ns))), ns, ss)
    mm = isotonic_minimax_oracle(ns, ss)
    for (pn, pd), (mn, md) in zip(pav, mm):
        assert pn * md == mn * pd  # equal as rationals


def test_isotonic_fit_monotone_and_exact(spark):
    rows = (
        [(10, 1)] * 2 + [(10, 0)] * 2     # x=10: rate 1/2
        + [(20, 0)] * 3 + [(20, 1)]       # x=20: rate 1/4 (violation)
        + [(30, 1)] * 3                   # x=30: rate 1
    )
    df = spark.createDataFrame(
        [("g", x, y) for x, y in rows], schema="g string, x long, y long"
    )
    out = {r.x: r for r in isotonic_fit(df, ["g"], "x", "y").collect()}
    # x=10 and x=20 pool: (2+1)/(4+4) = 3/8; x=30 stays 1
    assert (out[10].yhat_num, out[10].yhat_den) == (3, 8)
    assert (out[20].yhat_num, out[20].yhat_den) == (3, 8)
    assert (out[30].yhat_num, out[30].yhat_den) == (1, 1)
    assert out[10].yhat_q6 == 375_000 and out[30].yhat_q6 == 1_000_000
    assert out[10].n == 4 and out[10].y_sum == 2


def test_heaps_growth_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "b c"), (5, "c d e")],
        schema="doc_id long, text string",
    )
    out = {r.cutoff: r for r in heaps_growth(df, [1, 2, 10]).collect()}
    assert (out[1].n_docs, out[1].n_tokens, out[1].vocab) == (1, 2, 2)
    assert (out[2].n_docs, out[2].n_tokens, out[2].vocab) == (2, 4, 3)
    assert (out[10].n_docs, out[10].n_tokens, out[10].vocab) == (3, 7, 5)


def test_preference_winrate_canonicalization(spark):
    rows = [
        ("b", "a", "a"),   # canonical (a, b): b wins
        ("a", "b", "a"),   # a wins
        ("a", "b", "a"),   # a wins
        ("a", "b", "tie"),
        ("c", "c", "a"),   # self-pair: dropped
    ]
    df = spark.createDataFrame(rows, schema="ma string, mb string, w string")
    out = preference_winrate(df, "ma", "mb", "w").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.model_a, r.model_b) == ("a", "b")
    assert (r.a_wins, r.b_wins, r.ties) == (2, 1, 1)
    assert r.winrate_q6 == 666_667
    # Wilson LB reproduced with the same formula in Python
    z = 1.959963984540054
    z2 = z * z
    n, p = 3.0, 2.0 / 3.0
    lb = (p + z2 / (2 * n) - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (
        1 + z2 / n
    )
    assert r.wilson_lb_q6 == math.floor(abs(1e6 * lb) + 0.5)


def test_preference_winrate_all_ties_null_rate(spark):
    df = spark.createDataFrame(
        [("a", "b", "tie")] * 3, schema="ma string, mb string, w string"
    )
    r = preference_winrate(df, "ma", "mb", "w").collect()[0]
    assert r.ties == 3 and r.winrate_q6 is None and r.wilson_lb_q6 is None
