"""Connected components / duplicate clustering semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import connected_components, dedup_by_cluster


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(df).toPandas()
    return dict(zip(out["node"], out["component"]))


def test_chain_collapses_transitively(spark):
    # 1-2, 2-3, 3-4 never emit (1,4) yet all four land in component 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_path_within_iteration_rail(spark):
    # a 64-node path needs ~log2(64) pointer-jumping rounds, far under the
    # rail; the min id (0) must win everywhere
    got = _cc(spark, [(i, i + 1) for i in range(63)])
    assert set(got.values()) == {0} and len(got) == 64


def test_direction_and_partitioning_invariance(spark):
    pairs = [(5, 2), (2, 9), (7, 3)]
    a = _cc(spark, pairs)
    flipped = spark.createDataFrame(
        [(b, a_) for a_, b in pairs], "id_a long, id_b long"
    ).repartition(7)
    b = connected_components(flipped).toPandas()
    assert a == dict(zip(b["node"], b["component"]))
    assert a == {5: 2, 2: 2, 9: 2, 7: 3, 3: 3}


def test_dedup_by_cluster_keeps_rep_and_singletons(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    comps = connected_components(
        spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    )
    kept = sorted(
        r["doc_id"] for r in dedup_by_cluster(corpus, comps).collect()
    )
    # cluster {0,1,2} -> keep 0; cluster {4,5} -> keep 4; 3 unclustered
    assert kept == [0, 3, 4]


def test_self_loops_ignored_empty_edges_ok(spark):
    got = _cc(spark, [(1, 1), (2, 3)])
    assert got == {2: 2, 3: 2}
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


# ------------------------------------------------------------ resolve_chains
def test_resolve_chains_chain_cycle_and_collapse(spark):
    from dads_spark.ops import resolve_chains

    edges = [
        # chain a -> b -> c -> T (3 hops from a)
        ("a", "b"), ("b", "c"), ("c", "T"),
        # 2-cycle
        ("x", "y"), ("y", "x"),
        # self-loop
        ("z", "z"),
        # multi-out-edge source collapses to min(dst): q -> m wins over q -> n
        ("q", "n"), ("q", "m"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["src"]: (r["terminal"], r["n_hops"], r["resolved"])
        for r in resolve_chains(df, max_hops=8).collect()
    }
    assert got["a"] == ("T", 3, 1)
    assert got["b"] == ("T", 2, 1)
    assert got["c"] == ("T", 1, 1)
    assert got["x"] == (None, None, 0)
    assert got["y"] == (None, None, 0)
    assert got["z"] == (None, None, 0)
    assert got["q"] == ("m", 1, 1)
    assert len(got) == 7  # one row per distinct source


def test_resolve_chains_hop_horizon(spark):
    from dads_spark.ops import resolve_chains

    # a path of exactly 4 hops resolves at max_hops=4, not at 2
    edges = [(f"n{i}", f"n{i+1}") for i in range(4)]
    df = spark.createDataFrame(edges, "src string, dst string")
    ok = {r["src"]: r["resolved"] for r in resolve_chains(df, max_hops=4).collect()}
    assert ok["n0"] == 1
    short = {r["src"]: r["resolved"] for r in resolve_chains(df, max_hops=2).collect()}
    assert short["n0"] == 0 and short["n2"] == 1


def test_resolve_chains_rejects_bad_horizon():
    import pytest as _pytest

    from dads_spark.ops import resolve_chains

    for bad in (0, 1, 3, 12):
        with _pytest.raises(ValueError):
            resolve_chains(None, max_hops=bad)
