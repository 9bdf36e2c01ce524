"""Benford digit drift, exact weighted median, gap-regularity bot flag."""

from __future__ import annotations

import numpy as np

from dads_spark.rollup import benford_digits, gap_regularity, weighted_median
from dads_spark.rollup.drift import BENFORD_PERMILLE


def test_benford_digit_extraction_and_shares(spark):
    # values engineered so floor(v*1000) has known first digits
    rows = [("k", 0.0012), ("k", 0.0019), ("k", 0.025), ("k", 0.31),
            ("k", 9.99), ("k", -5.0), ("k", 0.0)]  # last two dropped
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["digit"]: r for r in benford_digits(df, ["event_type"]).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert out[1]["n"] == 2 and out[1]["n_total"] == 5
    assert out[1]["share_permille"] == 400  # 2*1000 DIV 5
    assert out[1]["expected_permille"] == 301
    assert out[1]["delta_permille"] == 99
    assert out[9]["expected_permille"] == BENFORD_PERMILLE[8]


def test_benford_random_counts_sum(spark):
    rng = np.random.default_rng(5)
    vals = rng.lognormal(0, 2, 400)
    df = spark.createDataFrame(
        [("a", float(v)) for v in vals], "event_type string, value double"
    )
    rows = benford_digits(df, ["event_type"]).collect()
    kept = sum(1 for v in vals if np.floor(v * 1000) > 0)
    assert sum(r["n"] for r in rows) == kept
    assert all(r["n_total"] == kept for r in rows)


def test_weighted_median_lower_rank_selection(spark):
    # values 1..4 with weights 1,1,1,7 -> total 10, half 5 -> median 4;
    # and an all-equal-weight group -> classic lower median
    rows = [("g1", 1, 1), ("g1", 2, 1), ("g1", 3, 1), ("g1", 4, 7),
            ("g2", 10, 1), ("g2", 20, 1), ("g2", 30, 1), ("g2", 40, 1)]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    out = {r["k"]: (r["w_total"], r["w_median"])
           for r in weighted_median(df, ["k"], "v", "w").collect()}
    assert out["g1"] == (10, 4)
    assert out["g2"] == (4, 20)  # cum at v=20 is 2, 2*2 >= 4 -> lower median


def test_weighted_median_tie_values_deterministic(spark):
    # duplicate v rows: the tie group's FINAL cumulative weight decides,
    # so any intra-tie order gives the same answer
    rows = [("k", 5, 3), ("k", 5, 3), ("k", 9, 4)]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    for n_part in (1, 8):
        r = weighted_median(df.repartition(n_part), ["k"], "v", "w").collect()[0]
        assert (r["w_total"], r["w_median"]) == (10, 5)


def test_gap_regularity_flags_metronome_not_bursty(spark):
    rows = []
    # metronome: 12 requests exactly 60 s apart
    rows += [("bot", 1000 + 60 * i, i) for i in range(12)]
    # bursty human: irregular gaps
    for i, t in enumerate([0, 3, 500, 510, 5000, 5002, 9000, 20000]):
        rows.append(("human", t, 100 + i))
    df = spark.createDataFrame(rows, "k string, ts long, event_id long")
    out = {r["k"]: r for r in
           gap_regularity(df, ["k"], "ts", ["event_id"]).collect()}
    assert out["bot"]["is_bot"] is True
    assert out["bot"]["var_num"] == 0  # perfectly regular
    assert out["bot"]["n_distinct_gaps"] == 1
    assert out["human"]["is_bot"] is False
    assert out["human"]["n_gaps"] == 7


def test_gap_regularity_min_gaps_guard(spark):
    # 3 perfectly regular gaps still below min_gaps -> not flagged
    rows = [("u", 60 * i, i) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, ts long, event_id long")
    r = gap_regularity(df, ["k"], "ts", ["event_id"]).collect()[0]
    assert r["var_num"] == 0 and r["is_bot"] is False


def test_gap_regularity_moments_exact(spark):
    rows = [("u", t, i) for i, t in enumerate([0, 10, 30, 60])]  # gaps 10,20,30
    df = spark.createDataFrame(rows, "k string, ts long, event_id long")
    r = gap_regularity(df, ["k"], "ts", ["event_id"]).collect()[0]
    assert (r["n_gaps"], r["gap_sum"], r["gap_sum2"]) == (3, 60, 1400)
    assert r["var_num"] == 3 * 1400 - 3600  # 600
