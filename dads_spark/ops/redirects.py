"""Redirect / rel=canonical chain resolution by pointer doubling.

A crawl yields a partial function url -> url (HTTP 3xx Location, or the
page's rel=canonical target). Canonicalizing a corpus means following
that mapping to its terminal for EVERY source — chains (A -> B -> C),
shared suffixes (many urls funneling into one terminal), and cycles
(A -> B -> A, which real crawls contain and which must not hang the
job). A naive resolver walks one hop per round: H shuffles for
hop-length-H chains. Pointer doubling squares the reach each round —
after r rounds every pointer has advanced up to 2^r hops — so
``ceil(log2(max_hops))`` self-joins keyed by url resolve everything
resolvable, and whatever is still unresolved after covering
``max_hops`` hops is, by construction, a cycle or an over-long chain.
That round count (5 for the default 32) is FIXED, so the physical plan
is static: no driver-side convergence loop, no collect, every join a
plain hash/sort-merge equi-join on the url key. At 100 TB the redirect
map is a small fraction of the corpus (one row per redirecting url)
and the per-round state is exactly one row per source — this is the
same O(log n) discipline as ``components.connected_components``.

Exact-hop tracking: beside the advancing pointer each row carries the
number of REAL hops it has covered (not the 2^r bound), composed
additively at each doubling — so the output's ``n_hops`` is the true
chain length, bit-comparable with a step-at-a-time recursive oracle.

Semantics pinned by the DuckDB recursive-CTE twin (walk <= max_hops
steps, terminal = node with no outgoing edge): sources whose chain
reaches a terminal within ``max_hops`` hops resolve identically in
both engines; cycles and longer chains come back unresolved
(terminal NULL, n_hops NULL, resolved 0) in both. ``max_hops`` must be
a power of two so the doubling horizon and the CTE's step cap agree
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_chains(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve every source url to its terminal through the redirect map.

    ``edges``: one row per redirecting url. Multiple outgoing edges per
    source (crawl noise) are collapsed deterministically to the minimum
    destination before walking. Returns one row per DISTINCT source:
    (src, terminal, n_hops, resolved) where resolved=0 marks cycle
    members and chains longer than ``max_hops`` (terminal/n_hops NULL).
    """
    if max_hops < 2 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError("max_hops must be a power of two >= 2")
    rounds = max_hops.bit_length() - 1  # log2

    # one outgoing edge per src, deterministically; done at INIT means
    # "p is already the terminal" (p has no outgoing edge) — detecting
    # terminal-ness eagerly keeps the doubling invariant exact: after r
    # rounds a chain of length <= 2^r is fully resolved, not 2^r minus a
    # detection-lag round
    mapped = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("p"))
        .groupBy("u")
        .agg(F.min("p").alias("p"))
    )
    ptr = (
        mapped.join(
            mapped.select(F.col("u").alias("_t")),
            mapped["p"] == F.col("_t"),
            "left",
        )
        .select(
            "u",
            "p",
            F.lit(1).cast("long").alias("hops"),
            F.col("_t").isNull().alias("done"),
        )
        .localCheckpoint()  # cluster: .checkpoint() to durable storage
    )

    for _ in range(rounds):
        # compose each undone pointer with the CURRENT row of its target
        # (always present: an undone p has an outgoing edge by the init
        # invariant); the target's done flag says whether the composed
        # pointer now rests on the terminal
        nxt = ptr.select(
            F.col("u").alias("_v"),
            F.col("p").alias("_vp"),
            F.col("hops").alias("_vh"),
            F.col("done").alias("_vdone"),
        )
        ptr = (
            ptr.join(nxt, ptr["p"] == nxt["_v"], "left")
            .select(
                "u",
                F.when(F.col("done"), F.col("p"))
                .otherwise(F.col("_vp"))
                .alias("p"),
                F.when(F.col("done"), F.col("hops"))
                .otherwise(F.col("hops") + F.col("_vh"))
                .alias("hops"),
                F.when(F.col("done"), F.lit(True))
                .otherwise(F.coalesce(F.col("_vdone"), F.lit(False)))
                .alias("done"),
            )
            .localCheckpoint()
        )

    return ptr.select(
        F.col("u").alias("src"),
        F.when(F.col("done"), F.col("p")).alias("terminal"),
        F.when(F.col("done"), F.col("hops")).alias("n_hops"),
        F.col("done").cast("int").alias("resolved"),
    )
