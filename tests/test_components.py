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
