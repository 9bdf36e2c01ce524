"""Max-min fair allocation and top-k + other rollup."""

from __future__ import annotations

from dads_spark.ops import maxmin_fair
from dads_spark.rollup import topk_other


def _dem(spark, d):
    return spark.createDataFrame(
        list(d.items()), "grp string, demand long"
    )


def test_maxmin_all_satisfied_when_capacity_ample(spark):
    out = {r["grp"]: r for r in maxmin_fair(
        _dem(spark, {"a": 5, "b": 10, "c": 2}), capacity=100
    ).collect()}
    assert all(r["satisfied"] for r in out.values())
    assert sum(r["allocated"] for r in out.values()) == 17


def test_maxmin_textbook_water_filling(spark):
    # demands 2, 8, 10 with capacity 12: 'a' fully satisfied (2),
    # residue 10 splits 5/5 across b and c
    out = {r["grp"]: r for r in maxmin_fair(
        _dem(spark, {"a": 2, "b": 8, "c": 10}), capacity=12
    ).collect()}
    assert out["a"]["allocated"] == 2 and out["a"]["satisfied"]
    assert out["b"]["allocated"] == 5 and not out["b"]["satisfied"]
    assert out["c"]["allocated"] == 5
    assert sum(r["allocated"] for r in out.values()) == 12


def test_maxmin_mod_leftover_deterministic(spark):
    # capacity 13 over the same demands: water level 5, one extra slot
    # goes to the unsatisfied group FIRST in (demand, key) order = b
    out = {r["grp"]: r for r in maxmin_fair(
        _dem(spark, {"a": 2, "b": 8, "c": 10}), capacity=13
    ).collect()}
    assert out["b"]["allocated"] == 6
    assert out["c"]["allocated"] == 5
    assert sum(r["allocated"] for r in out.values()) == 13


def test_maxmin_never_exceeds_demand_and_sums_exact(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    d = {f"g{i:03d}": int(v) for i, v in
         enumerate(rng.integers(1, 100, 40))}
    cap = 700
    out = maxmin_fair(_dem(spark, d), capacity=cap).collect()
    assert all(r["allocated"] <= r["demand"] for r in out)
    assert sum(r["allocated"] for r in out) == min(cap, sum(d.values()))
    # max-min property: any unsatisfied group's allocation >= every
    # other unsatisfied group's allocation - 1
    unsat = [r["allocated"] for r in out if not r["satisfied"]]
    if unsat:
        assert max(unsat) - min(unsat) <= 1


def _ev(spark, rows):
    return spark.createDataFrame(rows, "g string, cat string")


def test_topk_other_totals_preserved(spark):
    rows = [("x", f"c{i}") for i in range(5) for _ in range(i + 1)]
    out = {r["category"]: r for r in topk_other(
        _ev(spark, rows), ["g"], "cat", k=2
    ).collect()}
    # c4 (5), c3 (4) kept; c0+c1+c2 = 1+2+3 = 6 in __other__
    assert out["c4"]["weight"] == 5 and out["c4"]["n_members"] == 1
    assert out["c3"]["weight"] == 4
    assert out["__other__"]["weight"] == 6
    assert out["__other__"]["n_members"] == 3
    assert sum(r["weight"] for r in out.values()) == len(rows)


def test_topk_other_tie_cut_by_category_name(spark):
    rows = [("x", c) for c in ("b", "a", "c")]   # all weight 1
    out = {r["category"]: r for r in topk_other(
        _ev(spark, rows), ["g"], "cat", k=2
    ).collect()}
    # ties: rank by (weight desc, category asc) -> a, b kept; c other
    assert set(out) == {"a", "b", "__other__"}
    assert out["__other__"]["weight"] == 1


def test_topk_other_no_tail_no_other_bucket(spark):
    rows = [("x", "a"), ("x", "b")]
    out = topk_other(_ev(spark, rows), ["g"], "cat", k=5).collect()
    assert all(r["category"] != "__other__" for r in out)
