"""Spark pipeline vs NumPy oracle: bit-parity at equal partitioning."""

from __future__ import annotations

import numpy as np
import pytest

from dads_spark.fixtures import benchmark_series
from dads_spark.s2g import S2GParams, s2g_oracle
from dads_spark.s2g.pipeline import run_s2g_distributed, score_series_grouped

PARAMS = S2GParams(m=20, c=6, S=30, ell=30)


@pytest.fixture(scope="module")
def series():
    return benchmark_series(1500, seed=11)


def test_distributed_bit_parity(spark, series):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(series)], "idx long, value double"
    )
    for p in (1, 4):
        out = (
            # threshold=0: force the DISTRIBUTED plan (the adaptive
            # small-input path would trivially compare oracle to oracle)
            run_s2g_distributed(
                spark, df, PARAMS, n_slices=p, n=len(series),
                small_series_threshold=0,
            )
            .orderBy("window_idx")
            .toPandas()
        )
        ora = s2g_oracle(series, PARAMS, n_slices=p)
        assert len(out) == len(ora.scores)
        assert (out["window_idx"].to_numpy() == np.arange(len(out))).all()
        assert (out["score"].to_numpy() == ora.scores).all(), (
            f"spark vs oracle not bit-identical at P={p}"
        )


def test_small_series_adaptive_path_identical(spark, series):
    """The adaptive small-input path must return exactly the distributed
    plan's rows (same schema, same bits)."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(series)], "idx long, value double"
    )
    fast = run_s2g_distributed(
        spark, df, PARAMS, n_slices=4, n=len(series)
    ).orderBy("window_idx").toPandas()
    dist = run_s2g_distributed(
        spark, df, PARAMS, n_slices=4, n=len(series), small_series_threshold=0
    ).orderBy("window_idx").toPandas()
    assert list(fast.columns) == list(dist.columns)
    assert (fast["window_idx"].to_numpy() == dist["window_idx"].to_numpy()).all()
    assert (fast["score"].to_numpy() == dist["score"].to_numpy()).all()


def test_grouped_scorer_matches_oracle(spark):
    keys = ["a", "b", "c"]
    rows = []
    for k_i, k in enumerate(keys):
        x = benchmark_series(900, seed=k_i)
        rows += [(k, i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "domain string, t long, value double")
    out = score_series_grouped(df, ["domain"], "t", "value", PARAMS).toPandas()
    for k_i, k in enumerate(keys):
        x = benchmark_series(900, seed=k_i)
        ora = s2g_oracle(x, PARAMS, n_slices=1)
        got = out[out["domain"] == k].sort_values("window_idx")["score"].to_numpy()
        assert len(got) == len(ora.scores)
        assert (got == ora.scores).all()


def test_grouped_scorer_skips_short_series(spark):
    df = spark.createDataFrame(
        [("tiny", i, float(i)) for i in range(10)], "domain string, t long, value double"
    )
    out = score_series_grouped(df, ["domain"], "t", "value", PARAMS).toPandas()
    assert len(out) == 0


def test_heterogeneous_slice_plan_semantics():
    """slice_bounds_weighted replicates the reference's heterogeneous
    factory: weights sorted ascending, ceil(n*share)+overlap per slice,
    exact remainder for the last, advance = max(1, size-overlap)."""
    from dads_spark.s2g.core import slice_bounds_weighted

    n, m = 1000, 20  # overlap 19
    plan = slice_bounds_weighted(n, [2.0, 1.0, 1.0], m)  # sorted -> 1,1,2
    assert [s.slice_id for s in plan] == [0, 1, 2]
    # shares 0.25, 0.25, 0.5: lengths ceil(250)+19, ceil(250)+19, remainder
    assert (plan[0].start, plan[0].end) == (0, 269)
    assert plan[1].start == 0 + (269 - 19)
    assert plan[1].end == 250 + 269
    assert plan[2].end == n  # exact remainder
    assert plan[1].first_subseq == 250
    assert plan[2].first_subseq == 500
    # total coverage: every subsequence owned exactly once
    total_subseq = sum(s.n_subsequences(m) for s in plan)
    assert total_subseq == n - m + 1


def test_distributed_heterogeneous_bit_parity(spark, series):
    """The distributed plan under a memory-proportional slice plan is
    bit-identical to the oracle replaying the SAME plan."""
    from dads_spark.s2g.core import slice_bounds_weighted

    plan = slice_bounds_weighted(len(series), [1.0, 2.0, 4.0], PARAMS.m)
    assert len(plan) == 3 and len({s.end - s.start for s in plan}) > 1
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(series)], "idx long, value double"
    )
    out = (
        run_s2g_distributed(
            spark, df, PARAMS, n_slices=len(plan), n=len(series),
            small_series_threshold=0, slices=plan,
        )
        .orderBy("window_idx")
        .toPandas()
    )
    ora = s2g_oracle(series, PARAMS, slices=plan)
    assert (out["score"].to_numpy() == ora.scores).all()


def test_balanced_scorer_matches_grouped_and_balances(spark):
    """score_series_balanced: identical scores to the grouped scorer, and
    LPT packing bounds the heaviest partition near total/P even with a 10x
    series-length skew."""
    from dads_spark.s2g.pipeline import score_series_balanced

    lengths = {"big": 4000, "mid1": 1200, "mid2": 1100, "s1": 400, "s2": 400,
               "s3": 400, "s4": 400, "s5": 400}
    rows = []
    for i, (k, L) in enumerate(lengths.items()):
        x = benchmark_series(L, seed=i)
        rows += [(k, t, float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "domain string, t long, value double")

    got = (
        score_series_balanced(df, "domain", "t", "value", PARAMS, n_partitions=4)
        .toPandas()
        .sort_values(["domain", "window_idx"])
        .reset_index(drop=True)
    )
    want = (
        score_series_grouped(df, ["domain"], "t", "value", PARAMS)
        .toPandas()
        .sort_values(["domain", "window_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["domain"].to_numpy() == want["domain"].to_numpy()).all()
    assert (got["score"].to_numpy() == want["score"].to_numpy()).all()

    # balance check on the LPT assignment itself (deterministic, driver-side)
    import heapq

    sizes = sorted(lengths.items(), key=lambda kv: -kv[1])
    bins = [(0, p) for p in range(4)]
    heapq.heapify(bins)
    loads = {p: 0 for p in range(4)}
    for k, L in sizes:
        load, p = heapq.heappop(bins)
        loads[p] = load + L
        heapq.heappush(bins, (loads[p], p))
    total = sum(lengths.values())
    # LPT guarantee: makespan <= 4/3 of optimal; optimal >= max(mean load,
    # heaviest single indivisible series)
    opt_floor = max(total / 4, max(lengths.values()))
    assert max(loads.values()) <= opt_floor * (4 / 3)
    # and the heavy series must NOT share a bin with the mid-size ones
    assert max(loads.values()) == max(lengths.values())


def test_graph_edges_grouped_matches_oracle(spark):
    """The exposed per-series edge list equals the oracle's merged graph."""
    import numpy as np
    import pandas as pd

    from dads_spark.s2g import CANONICAL
    from dads_spark.s2g.oracle import s2g_oracle
    from dads_spark.s2g.pipeline import graph_edges_grouped
    from dads_spark.fixtures import benchmark_series

    x = benchmark_series(1200)
    df = spark.createDataFrame(
        pd.DataFrame({"k": "s", "t": np.arange(len(x)), "v": x})
    )
    got = graph_edges_grouped(df, ["k"], "t", "v", CANONICAL).toPandas()
    want = s2g_oracle(np.asarray(x), CANONICAL, n_slices=1).edge_weights
    got_map = {
        (r.from_seg, r.from_idx, r.to_seg, r.to_idx): r.weight
        for r in got.itertuples()
    }
    assert got_map == {k: int(v) for k, v in want.items()}
