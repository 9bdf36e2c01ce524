"""Exact Newman modularity of a community assignment."""

from __future__ import annotations

from dads_spark.ops import label_propagation, modularity


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _labels(spark, assign):
    return spark.createDataFrame(
        list(assign.items()), "node string, label string"
    )


def test_modularity_two_triangles_with_bridge(spark):
    # the textbook case: Q = 2*(4*7*3 - 7^2) / (4*7^2) = 70/196 = 0.357143
    pairs = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
             ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
             ("a3", "b1")]
    lab = {n: "A" for n in ("a1", "a2", "a3")}
    lab.update({n: "B" for n in ("b1", "b2", "b3")})
    out = {r["label"]: r for r in modularity(
        _edges(spark, pairs), _labels(spark, lab)
    ).collect()}
    for c in ("A", "B"):
        assert out[c]["e_intra"] == 3
        assert out[c]["d_sum"] == 7
        assert out[c]["m_edges"] == 7
        assert out[c]["q_q6"] == 357_143   # half-up of 70/196
    assert out["A"]["n_nodes"] == 3


def test_modularity_single_community_is_zero(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c")]
    lab = {"a": "X", "b": "X", "c": "X"}
    r = modularity(_edges(spark, pairs), _labels(spark, lab)).collect()[0]
    assert r["e_intra"] == 3 and r["d_sum"] == 6
    assert r["q_q6"] == 0


def test_modularity_disjoint_cliques_is_half(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z")]
    lab = {"a": "A", "b": "A", "c": "A", "x": "B", "y": "B", "z": "B"}
    out = modularity(_edges(spark, pairs), _labels(spark, lab)).collect()
    assert all(r["q_q6"] == 500_000 for r in out)


def test_modularity_anti_community_negative(spark):
    # labels split ACROSS the two cliques: every edge is inter-community
    pairs = [("a", "b"), ("x", "y")]
    lab = {"a": "P", "b": "Q", "x": "P", "y": "Q"}
    out = modularity(_edges(spark, pairs), _labels(spark, lab)).collect()
    assert all(r["e_intra"] == 0 for r in out)
    assert all(r["q_q6"] < 0 for r in out)


def test_modularity_dedupes_and_drops_self_loops(spark):
    pairs = [("a", "b"), ("b", "a"), ("a", "a"), ("a", "b")]
    lab = {"a": "X", "b": "X"}
    r = modularity(_edges(spark, pairs), _labels(spark, lab)).collect()[0]
    assert r["m_edges"] == 1 and r["e_intra"] == 1


def test_modularity_scores_lpa_communities(spark):
    # two dense families bridged once: LPA should find them and the
    # scored Q must be strongly positive
    fam_a = [("a%d" % i, "a%d" % j) for i in range(5) for j in range(i)]
    fam_b = [("b%d" % i, "b%d" % j) for i in range(5) for j in range(i)]
    pairs = fam_a + fam_b + [("a0", "b0")]
    edges = _edges(spark, pairs)
    labels = label_propagation(edges, rounds=3)
    out = modularity(edges, labels).collect()
    assert len(out) == 2
    assert all(r["q_q6"] > 300_000 for r in out)
