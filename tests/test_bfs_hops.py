"""Multi-source BFS hop distances over a domain edge list."""

from __future__ import annotations

from dads_spark.ops import bfs_hops


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _hops(spark, pairs, seeds, **kw):
    out = bfs_hops(_edges(spark, pairs), seeds, **kw).collect()
    return {r["node"]: r["hops"] for r in out}


def test_chain_distances(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _hops(spark, pairs, ["a"]) == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_multi_source_takes_min(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d")]
    got = _hops(spark, pairs, ["a", "e"])
    assert got["d"] == 1 and got["c"] == 2 and got["e"] == 0


def test_cycle_terminates_and_unreachable_absent(spark):
    pairs = [("a", "b"), ("b", "a"), ("x", "y")]
    got = _hops(spark, pairs, ["a"])
    assert got == {"a": 0, "b": 1}


def test_max_hops_truncates(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _hops(spark, pairs, ["a"], max_hops=2)
    assert got == {"a": 0, "b": 1, "c": 2}


def test_seed_not_in_graph_still_reported(spark):
    got = _hops(spark, [("a", "b")], ["z"])
    assert got == {"z": 0}


def test_edges_are_directed(spark):
    got = _hops(spark, [("b", "a")], ["a"])
    assert got == {"a": 0}
