"""Rendezvous (highest-random-weight) hashing: deterministic key->node
assignment with minimal disruption — the shard router a distributed
tier store needs when the node set changes.

Rendezvous hashing (Thaler & Ravishankar 1998) assigns each key to
``argmax_node H(key, node)``. Its defining property: removing a node
remaps ONLY that node's keys (each survivor keeps its argmax), and
adding one steals only the keys the new node now wins — no global
reshuffle, unlike ``hash(key) % N``. Consistent-hash rings need virtual
nodes to balance; HRW is balanced by construction for equal weights.

Engine portability: H = md5 of ``key || '|' || node`` compared AS THE
HEX STRING — equal-length lowercase hex compares identically to the
128-bit integer, and Spark/DuckDB md5 agree bytewise (the hash_split
idiom), so assignments are bit-reproducible with no integer conversion.

Scale shape: the argmax is a per-row ``array_max`` over an inline
struct array (one md5 per node, N small) — pure codegen projection,
ZERO shuffle; at 100 TB the router costs one map pass over keys already
being read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rendezvous_assign(
    df: DataFrame, key_col: str, nodes: list[str]
) -> DataFrame:
    """Add ``node`` = the rendezvous winner for each row's key.

    Struct max orders by digest first (node name breaks the
    cryptographically-unreachable tie) — the standard HRW argmax.
    """
    if not nodes:
        raise ValueError("rendezvous_assign needs at least one node")
    key = F.col(key_col).cast("string")
    cands = [
        F.struct(
            F.md5(F.concat(key, F.lit("|" + n))).alias("d"),
            F.lit(n).alias("node"),
        )
        for n in sorted(nodes)
    ]
    return df.withColumn("node", F.array_max(F.array(*cands))["node"])


def rendezvous_moves(
    df: DataFrame, key_col: str, nodes_before: list[str], nodes_after: list[str]
) -> DataFrame:
    """Audit of a topology change: per (node_before, node_after) key
    counts. The HRW guarantee is visible in the result — every row with
    node_before != node_after has node_before not in ``nodes_after`` or
    node_after not in ``nodes_before``."""
    a = rendezvous_assign(df, key_col, nodes_before).withColumnRenamed(
        "node", "node_before"
    )
    b = rendezvous_assign(a, key_col, nodes_after).withColumnRenamed(
        "node", "node_after"
    )
    return b.groupBy("node_before", "node_after").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys")
    )
