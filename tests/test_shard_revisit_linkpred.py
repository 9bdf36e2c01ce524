"""Rendezvous hashing, revisit scheduling, link prediction."""

from __future__ import annotations

import hashlib

from dads_spark.ops import (
    link_prediction,
    rendezvous_assign,
    rendezvous_moves,
    revisit_schedule,
)


def _hrw_scalar(key: str, nodes: list[str]) -> str:
    return max(
        sorted(nodes),
        key=lambda n: (hashlib.md5(f"{key}|{n}".encode()).hexdigest(), n),
    )


def test_rendezvous_matches_scalar_argmax(spark):
    keys = [f"k{i}" for i in range(200)]
    nodes = ["n0", "n1", "n2", "n3", "n4"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r["key"]: r["node"] for r in rendezvous_assign(df, "key", nodes).collect()}
    assert got == {k: _hrw_scalar(k, nodes) for k in keys}


def test_rendezvous_balanced_ish(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "key string")
    counts = {
        r["node"]: r["n"]
        for r in rendezvous_assign(df, "key", ["a", "b", "c", "d"])
        .groupBy("node").count().withColumnRenamed("count", "n").collect()
    }
    assert set(counts) == {"a", "b", "c", "d"}
    assert all(150 < c < 350 for c in counts.values())  # ~250 each


def test_rendezvous_minimal_disruption(spark):
    # remove node 'c': keys NOT on 'c' must stay put — the HRW guarantee
    df = spark.createDataFrame([(f"k{i}",) for i in range(500)], "key string")
    before = ["a", "b", "c", "d"]
    after = ["a", "b", "d"]
    moves = {
        (r["node_before"], r["node_after"]): r["n_keys"]
        for r in rendezvous_moves(df, "key", before, after).collect()
    }
    for (nb, na), n in moves.items():
        if nb != na:
            assert nb == "c", f"non-removed node {nb} lost {n} keys to {na}"
    # and c's keys were redistributed somewhere
    assert sum(n for (nb, na), n in moves.items() if nb == "c") > 0


def test_revisit_schedule_buckets(spark):
    # url A: changes every visit -> permille 1000 -> 1h
    # url B: never changes       -> permille 0    -> 720h
    # url C: 1 change in 5 gaps  -> permille 200  -> 4h
    rows = []
    rows += [("A", t, t) for t in range(6)]
    rows += [("B", t, 7) for t in range(6)]
    rows += [("C", t, 0 if t < 3 else 1) for t in range(6)]
    df = spark.createDataFrame(rows, "url string, crawl_ts long, fingerprint long")
    out = {r["url"]: r for r in revisit_schedule(df).collect()}
    assert (out["A"]["change_permille"], out["A"]["revisit_hours"]) == (1000, 1)
    assert (out["B"]["n_changes"], out["B"]["revisit_hours"]) == (0, 720)
    assert (out["C"]["change_permille"], out["C"]["revisit_hours"]) == (200, 4)


def test_revisit_single_visit(spark):
    df = spark.createDataFrame(
        [("X", 5, 1)], "url string, crawl_ts long, fingerprint long"
    )
    r = revisit_schedule(df).collect()[0]
    assert (r["n_visits"], r["change_permille"], r["revisit_hours"]) == (1, 0, 720)


def test_link_prediction_square_graph(spark):
    # square a-b-c-d-a: diagonals (a,c) and (b,d) share 2 neighbors each
    # and are non-adjacent -> exactly the predicted links
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {(r["src"], r["dst"]): r for r in link_prediction(df, min_common=2).collect()}
    assert set(out) == {("a", "c"), ("b", "d")}
    r = out[("a", "c")]
    assert (r["common"], r["deg_src"], r["deg_dst"]) == (2, 2, 2)
    assert r["jaccard_permille"] == 1000  # 2*1000 // (2+2-2)


def test_link_prediction_excludes_existing_edges(spark):
    # triangle + pendant: every 2-common pair is adjacent -> no output
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert link_prediction(df, min_common=2).count() == 0
