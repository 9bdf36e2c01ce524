"""Distinct-count tier cascade over mergeable HLL sketches.

The distinct-count analog of the t-digest cascade (ops/sketch.py): exact
COUNT(DISTINCT) does not decompose across tiers — a day's distinct users is
not the sum of its hours' — so a continuous-aggregate store that wants
distinct counts at every retention tier must either re-scan raw data per
tier (untenable at 10^12 docs) or persist a mergeable sketch beside each
hour bucket and UNION sketches upward. This module does the latter with
Spark's built-in Apache DataSketches HLL bindings (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`), which run entirely JVM-side as
typed ImperativeAggregates with partial merge — the shuffle carries one
register array per (key, bucket), never the item stream.

Why the cascade is deterministic: an HLL register state is a per-bucket
MAX over hashed items — associative and commutative — so the union of the
24 hour sketches of a day holds exactly the register values of a sketch
built from the day's raw items, regardless of merge order or partition
topology. The ESTIMATE printed from a union result is a pure function of
that register state (DataSketches' composite estimator), so every
union-derived tier is bit-reproducible and repartition-invariant. One
honest caveat: a sketch built in a single pass WITHOUT any merge keeps
DataSketches' HIP accumulator, a slightly different (also unbiased)
estimator — so a direct single-scan estimate can differ from the cascaded
one by well under the sketch's RSE (~1% observed at lg_k=12) whenever a
group's rows land in one partition. Tiered stores always union (partial
aggregation is a union), so the cascade path is the reproducible one.
`tests/test_compact_distinct.py` pins cascade determinism, repartition
invariance, cascade-vs-direct agreement within the error envelope, and
the estimate-vs-exact bound.

Reference analog: none (DADS has no distinct-count machinery); spec source
is BASELINE.json:6 ("continuous aggregates", "language mix" — distinct
languages/users per domain per tier is the motivating rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tiers import TIER_ORDER, bucket_expr

__all__ = ["distinct_sketch_tier", "cascade_distinct", "with_estimate"]


def distinct_sketch_tier(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    item_col: str,
    tier: str = "hour",
    lg_k: int = 12,
) -> DataFrame:
    """Base tier: one HLL sketch of ``item_col`` per (keys..., bucket_ts).

    The single raw-data scan of the cascade; every higher tier derives from
    this output. ``lg_k=12`` -> 4096 registers, ~1.6% relative standard
    error, <=4 KB per sketch row — at 10^12 docs the hour tier is ~10^5x
    smaller than raw, and this adds one ~KB column to it.
    """
    return df.groupBy(*key_cols, bucket_expr(ts_col, tier)).agg(
        F.hll_sketch_agg(F.col(item_col), F.lit(lg_k)).alias("distinct_hll")
    )


def cascade_distinct(
    sketch_tier: DataFrame, key_cols: list[str], to_tier: str
) -> DataFrame:
    """Merge a finer sketch tier into a coarser one WITHOUT touching raw
    data: re-bucket ``bucket_ts`` to the coarser tier and union the
    sketches. Exact-equivalent to sketching the coarse tier from raw
    (register-max associativity), which the tests assert bit-for-bit via
    the estimates."""
    assert to_tier in TIER_ORDER, to_tier
    return sketch_tier.groupBy(
        *key_cols, bucket_expr("bucket_ts", to_tier)
    ).agg(F.hll_union_agg("distinct_hll").alias("distinct_hll"))


def with_estimate(sketch_df: DataFrame, out_col: str = "approx_distinct") -> DataFrame:
    """Materialize the cardinality estimate beside (or in place of) the
    binary sketch column for serving reads."""
    return sketch_df.withColumn(
        out_col, F.hll_sketch_estimate("distinct_hll")
    ).drop("distinct_hll")
