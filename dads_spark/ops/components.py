"""Distributed connected components over a near-duplicate pair graph.

The dedup operators (minhash_lsh_pairs / simhash_near_pairs /
ngram_jaccard_pairs) emit PAIRS; a training-data pipeline needs CLUSTERS —
"these 137 pages are the same article" — and then one canonical doc per
cluster. Transitive closure is the missing step: near-dup similarity is
not transitive, so pairs (a,b),(b,c) must collapse into one component even
when (a,c) was never emitted.

Algorithm: iterative min-label propagation with pointer-jumping (path
compression), the DataFrame-native formulation of classic MapReduce
connected components (cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — same min-id fixpoint, simpler schedule):

    label(u) <- min(label(u), min_{v in N(u)} label(v))   # propagate
    label(u) <- label(label(u))                           # compress

Labels are monotonically non-increasing and bounded below by the component
minimum, so the fixpoint is exactly "every node labeled with its
component's min id". Propagation alone needs O(diameter) rounds; the
compression join cuts chains in half each round (O(log d) for path-shaped
dup chains, and near-dup graphs are short-diameter in practice — the
sf0.01 fixture converges in 3 rounds).

Scale shape: each round is two shuffles on the node id (one edge join, one
min-agg) plus one label self-join, all key-partitioned — nothing global,
nothing driver-side except the O(1) convergence scalar. Lineage is cut
every round with localCheckpoint (mandatory for iterative plans: without
it the optimizer re-derives round k from round 0 and the plan grows
exponentially); on a real cluster with unreliable executors, prefer
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` — swap noted
below. Edge count bounds the per-round cost; band/bucket candidate
generation upstream keeps |E| ~ |near-dup pairs|, not |corpus|^2.

Reference analog: none (DADS has no dedup surface) — this extends the
training-data-pipeline mandate's dedup suite from pair emission to
cluster formation and canonical-doc selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    is the smallest node id reachable from the node. Deterministic, order-
    and partitioning-independent (min is commutative), engine-portable.

    ``max_iter`` is a safety rail: with pointer jumping, convergence takes
    O(log diameter) rounds, so 25 covers graphs of diameter ~2^25.
    Raises RuntimeError if the rail is hit (a correctness bug, not a data
    property, would be the only way).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()  # cluster: .checkpoint() to HDFS instead
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    prev_sig = None
    for _ in range(max_iter):
        # propagate: each node also sees the label of every neighbor
        via_edge = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("component").alias("nl")
                ),
                "b",
            )
            .select(F.col("a").alias("node"), F.col("nl").alias("component"))
        )
        labels = (
            labels.unionByName(via_edge)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # compress: node -> label(label(node)); labels always point at
        # in-component nodes, so the lookup misses only when the label is
        # already a root (coalesce keeps it)
        lookup = labels.select(
            F.col("node").alias("component"), F.col("component").alias("ll")
        )
        labels = (
            labels.join(lookup, "component", "left")
            .select(
                "node", F.coalesce("ll", "component").alias("component")
            )
            .localCheckpoint()
        )
        # labels decrease monotonically => equal (count, sum) means fixpoint
        row = labels.agg(
            F.count(F.lit(1)).alias("n"), F.sum("component").alias("s")
        ).collect()[0]
        sig = (row["n"], row["s"])
        if sig == prev_sig:
            return labels
        prev_sig = sig
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_by_cluster(
    corpus: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one canonical doc (the component-min id) per duplicate cluster,
    plus every doc that is in no cluster.

    The discard set (cluster members that are not the rep) is |dup docs| -
    |clusters| rows — small relative to the corpus by construction — so the
    anti-join broadcasts and the corpus is never reshuffled, mirroring the
    boilerplate-removal shape.
    """
    discard = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return corpus.join(F.broadcast(discard), id_col, "left_anti")
