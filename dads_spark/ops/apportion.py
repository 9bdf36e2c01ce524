"""Largest-remainder (Hamilton) apportionment: exact integer budget split.

A crawl scheduler with N fetch slots per cycle, a sampler with a fixed
row budget, or a shard planner with N tasks must divide an INTEGER total
across groups proportionally to integer weights so the parts sum to the
total EXACTLY.  Naive floor(N * w / W) under-allocates by up to
|groups| - 1 slots; real-valued shares then need a float tie-break whose
boundary behavior differs across engines.  Hamilton's method stays in
BIGINT arithmetic end to end:

- base_g  = (N * w_g) div W          (integer floor quota)
- rem_g   = (N * w_g) mod W          (the fractional part, scaled by W)
- leftover = N - sum(base_g), handed out one slot each to the `leftover`
  groups with the LARGEST rem_g (key ASC tie-break — a total order).

Every allocation is base_g or base_g + 1 (quota-satisfying), the sum is
exactly N, and the whole computation is engine-exact: both sides of the
oracle gate evaluate the identical DIV / MOD / rank expressions.
Hamilton famously violates house monotonicity (the Alabama paradox:
raising N can LOWER a group's share) — that is a property of the method,
not a bug; the test pins one classic instance so the behavior is
documented rather than rediscovered.

Scale shape: the input is a per-group weight table (hosts, languages,
shards — a dimension, not the corpus), so the single-partition
remainder-rank window ranks |groups| rows, the same bounded-dimension
concession as the link-graph ops; W and the leftover count travel as
1-row broadcast joins.  The corpus itself is never touched — callers
join the resulting quota table back with a broadcast.

Overflow bound: N * max(w) must stay under 2^63 (N <= 2^31 with 32-bit
weights); asserted nowhere because the inputs are caller-domain, but
documented here and in the gated lane.

Reference analog: none; §2.4 training-data suite (crawl budget /
sampling quotas). Method: Hamilton 1792, standard apportionment
literature (public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["apportion", "maxmin_fair"]


def apportion(
    weights: DataFrame,
    key_col: str,
    weight_col: str,
    total: int,
) -> DataFrame:
    """(key, weight) -> (key, weight, base, extra, alloc) with
    sum(alloc) == total exactly.  Zero-weight groups allocate 0 and never
    receive a remainder slot; negative weights or an all-zero table
    raise."""
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    wsum = weights.agg(
        F.sum(F.col(weight_col).cast("long")).alias("_W"),
        F.min(F.col(weight_col).cast("long")).alias("_wmin"),
    )
    staged = (
        weights.select(
            F.col(key_col),
            F.col(weight_col).cast("long").alias(weight_col),
        )
        .crossJoin(F.broadcast(wsum))
        .select(
            key_col,
            weight_col,
            F.expr(
                f"CAST({total} AS BIGINT) * {weight_col} DIV _W"
            ).alias("base"),
            F.expr(
                f"CAST({total} AS BIGINT) * {weight_col} % _W"
            ).alias("_rem"),
            "_wmin",
        )
    )
    # driver-side sanity on the 1-row aggregate only (no data collect)
    row = wsum.first()
    if row["_W"] is None or row["_W"] <= 0:
        raise ValueError("weights must contain at least one positive weight")
    if row["_wmin"] < 0:
        raise ValueError("weights must be non-negative")
    leftover = staged.agg(
        (F.lit(total) - F.sum("base")).alias("_left")
    )
    rn = F.row_number().over(
        W.orderBy(F.col("_rem").desc(), F.col(key_col).asc())
    )
    return (
        staged.withColumn("_rn", rn)
        .crossJoin(F.broadcast(leftover))
        .select(
            key_col,
            weight_col,
            "base",
            F.when(
                (F.col("_rn") <= F.col("_left")) & (F.col("_rem") > 0), 1
            )
            .otherwise(0)
            .cast("long")
            .alias("extra"),
        )
        .withColumn("alloc", F.col("base") + F.col("extra"))
    )


def maxmin_fair(
    demands: DataFrame,
    capacity: int,
    group_col: str = "grp",
    demand_col: str = "demand",
) -> DataFrame:
    """Max-min fair (water-filling) allocation of an integer capacity
    across groups with integer demands — the OTHER canonical fair
    division beside Hamilton proportionality: bandwidth schedulers,
    crawl politeness budgets and fetch-slot arbiters use max-min so
    small demands are satisfied in full and the remainder splits
    evenly among the big ones (no group can gain without a
    smaller-allocated group losing).

    Exact integer construction over demands sorted (d asc, key asc):
    k = the largest prefix where prefix_sum_k + (n-k)*d_k <= C (those
    k groups are FULLY satisfied); the residue R = C - prefix_sum_k
    splits among the u = n-k unsatisfied groups as the integer water
    level L = R DIV u, with the R MOD u leftover slots handed one
    each to the unsatisfied groups in (d asc, key asc) order.  Every
    step is BIGINT DIV/MOD/rank arithmetic — allocations never exceed
    demands (d_{k+1} > R/u forces d >= L+1), and they sum to
    min(C, sum d) exactly.

    Scale shape: the input is a per-group demand table (a dimension,
    not the corpus), so the single-partition sort ranks |groups| rows
    — the same bounded-dimension concession as ``apportion``; the
    scalar water-level row travels as a 1-row broadcast.

    Returns (group, demand, allocated, satisfied) — satisfied means
    allocated == demand.
    """
    cap = int(capacity)
    d = demands.select(
        F.col(group_col).alias("grp"),
        F.col(demand_col).cast("long").alias("demand"),
    )
    wo = W.orderBy(F.col("demand").asc(), F.col("grp").asc())
    staged = d.select(
        "grp",
        "demand",
        F.row_number().over(wo).alias("_i"),
        F.sum("demand").over(
            wo.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("_prefix"),
        F.count(F.lit(1)).over(
            wo.rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("_n"),
    )
    feasible = staged.withColumn(
        "_ok",
        F.col("_prefix")
        + (F.col("_n") - F.col("_i")) * F.col("demand")
        <= F.lit(cap),
    )
    krow = feasible.agg(
        F.max(F.when(F.col("_ok"), F.col("_i"))).alias("_k"),
        F.max(F.when(F.col("_ok"), F.col("_prefix"))).alias("_pk"),
        F.max("_n").alias("_nn"),
    ).select(
        F.coalesce("_k", F.lit(0)).alias("_k"),
        F.coalesce("_pk", F.lit(0)).alias("_pk"),
        "_nn",
    ).select(
        "_k",
        (F.lit(cap) - F.col("_pk")).alias("_r"),
        (F.col("_nn") - F.col("_k")).alias("_u"),
    ).select(
        "_k",
        F.when(F.col("_u") > 0, F.expr("_r DIV _u"))
        .otherwise(F.lit(0)).alias("_lvl"),
        F.when(F.col("_u") > 0, F.expr("_r % _u"))
        .otherwise(F.lit(0)).alias("_extra"),
    )
    alloc = (
        feasible.crossJoin(F.broadcast(krow))
        .select(
            "grp",
            "demand",
            F.when(F.col("_i") <= F.col("_k"), F.col("demand"))
            .otherwise(
                F.col("_lvl")
                + F.when(
                    F.col("_i") - F.col("_k") <= F.col("_extra"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("allocated"),
        )
        .withColumn(
            "satisfied", F.col("allocated") == F.col("demand")
        )
    )
    return alloc
