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

from pyspark.sql import DataFrame, Window as W, functions as F

from .tiers import TIER_ORDER, bucket_expr

__all__ = [
    "distinct_sketch_tier",
    "cascade_distinct",
    "with_estimate",
    "kmv_sketch_tier",
    "kmv_cascade",
    "kmv_estimate",
    "kmv_set_ops",
    "kmv_sliding",
]


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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) bottom-k sketch — the EXACTLY-PINNABLE sibling of
# the HLL cascade above.  HLL's register state is engine-opaque (a
# DataSketches binary), so its lane is necessarily estimate-level; a KMV
# sketch is just the k smallest md5(item) digests, and equal-length
# lowercase hex compares identically to the 128-bit value on every engine
# (the hash_split idiom) — so the ENTIRE sketch state, its merge result,
# and its integer-quantized estimate are bit-reproducible cross-engine and
# can sit under the oracle hash.  Beyond pinnability, KMV buys what HLL
# cannot: the retained digests support set operations (intersection /
# Jaccard between tiers via bottom-k of the union), per Beyer et al.,
# "On Synopses for Distinct-Value Estimation Under Multiset Operations"
# (SIGMOD 2007).
#
# Mergeability is exact by construction: any element of the bottom-k of a
# UNION is in the bottom-k of whichever child bucket it came from, so
# bottom-k(union of bottom-ks) == bottom-k(union of raw sets) — the same
# argument as HLL's register-max associativity, but over an inspectable
# state.  tests/test_compact_distinct.py pins cascade == direct bit-for-bit,
# exactness below k, repartition invariance, and the estimate's error
# envelope vs exact counts.
#
# Reference analog: none (DADS has no sketch machinery); spec source is
# BASELINE.json:6 — continuous aggregates over retention tiers need a
# mergeable distinct state beside each bucket, same motivation as the HLL
# cascade, plus the tier-intersection queries HLL cannot serve.


def kmv_sketch_tier(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    item_col: str,
    tier: str = "hour",
    k: int = 64,
) -> DataFrame:
    """Base tier: per (keys..., bucket_ts), the sorted array of the ``k``
    smallest DISTINCT md5(item) hex digests.

    Shape: one distinct shuffle on (keys, bucket, digest) — map-side
    partial distinct applies — then a per-(keys, bucket) bottom-k window.
    The window sort is bounded by the bucket's distinct count and spills;
    at 100 TB the hour grain keeps groups narrow, and the cascade never
    touches raw data again.  Memory per group in the final agg is k
    digests (k * 32 bytes), not the distinct set — the collect_list runs
    on the <=k survivors of the window filter.
    """
    h = F.md5(F.col(item_col).cast("string")).alias("_h")
    base = df.select(*key_cols, bucket_expr(ts_col, tier), h).distinct()
    rn = F.row_number().over(
        W.partitionBy(*key_cols, "bucket_ts").orderBy("_h")
    )
    return (
        base.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .groupBy(*key_cols, "bucket_ts")
        .agg(F.array_sort(F.collect_list("_h")).alias("kmv"))
    )


def kmv_cascade(
    sketch_tier: DataFrame, key_cols: list[str], to_tier: str, k: int = 64
) -> DataFrame:
    """Merge a finer KMV tier into a coarser one WITHOUT touching raw
    data: explode the child arrays, re-bucket, and keep the bottom-k of
    the union (distinct first — one digest can survive in several child
    buckets).  Bit-identical to sketching the coarse tier from raw."""
    assert to_tier in TIER_ORDER, to_tier
    exploded = (
        sketch_tier.select(
            *key_cols,
            bucket_expr("bucket_ts", to_tier),
            F.explode("kmv").alias("_h"),
        )
        .distinct()
    )
    rn = F.row_number().over(
        W.partitionBy(*key_cols, "bucket_ts").orderBy("_h")
    )
    return (
        exploded.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .groupBy(*key_cols, "bucket_ts")
        .agg(F.array_sort(F.collect_list("_h")).alias("kmv"))
    )


# hex -> 52-bit integer from the first 13 nibbles, as a codegen expression
# mirrored verbatim by the oracle (the minhash_md5 nibble-position idiom).
# Each (nibble - 1) subtracts a BIGINT literal so the per-term multiply is
# 64-bit: the 2^28-weight term otherwise stays in checked INT arithmetic
# (268435456 fits INT) and overflows for any nibble >= 8 under ANSI mode.
_KMV_V52 = " + ".join(
    f"((instr('0123456789abcdef', substr(_kth, {i + 1}, 1))"
    f" - CAST(1 AS BIGINT)) * {1 << (4 * (12 - i))})"
    for i in range(13)
)


def kmv_estimate(sketch_df: DataFrame, k: int = 64) -> DataFrame:
    """Integer-quantized KMV estimator beside the sketch: with n_kept == k
    the unbiased estimate is (k-1)/U(k) where U(k) is the kth smallest
    digest mapped to (0,1); below k the sketch holds the WHOLE distinct
    set and the count is exact.  The division runs on the digest's top 52
    bits in pure BIGINT arithmetic — (k-1) * 2^52 DIV v52 — so the
    estimate is bit-identical on any engine (k <= 512 keeps the product
    under 2^62).  v52 == 0 (13 leading zero nibbles, p ~ 2^-52) guards to
    1 rather than dividing by zero."""
    assert k <= 512, k
    out = sketch_df.select(
        "*",
        F.size("kmv").alias("n_kept"),
        F.element_at("kmv", F.size("kmv")).alias("_kth"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("long")
    ).otherwise(
        F.expr(
            f"CAST({(k - 1) * (1 << 52)} AS BIGINT)"
            f" DIV greatest(CAST({_KMV_V52} AS BIGINT), CAST(1 AS BIGINT))"
        )
    )
    return out.select(
        *[c for c in sketch_df.columns if c != "kmv"],
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("_kth").alias("kth_hex"),
        est.cast("long").alias("est_distinct"),
    )


def kmv_set_ops(
    a: DataFrame, b: DataFrame, key_cols: list[str], k: int = 64
) -> DataFrame:
    """Set operations between two KMV sketch tables — the payoff HLL
    cannot deliver (Beyer et al., SIGMOD 2007): because a KMV sketch IS
    a uniform bottom-k sample of the hashed set, the bottom-k of the
    union of two sketches is a uniform sample of the UNION, and the
    fraction of it present in both sides estimates the Jaccard
    similarity.  Per joined key:

    - K        = bottom-k of array_union(kmv_a, kmv_b)
    - n_kept   = |K|; kth_hex = max(K)
    - n_both   = |{h in K : h in kmv_a AND h in kmv_b}|
    - jaccard_permille = 1000 * n_both DIV n_kept          (exact ints)
    - union_est        = the kmv_estimate formula on K
    - inter_est        = union_est * n_both DIV n_kept

    All arithmetic is BIGINT and every intermediate is deterministic, so
    the whole row pins under an oracle hash; when both input sets were
    below k the sketches are complete and every number is EXACT.

    Shape: one equi-join on the sketch keys (tier-sized inputs, k-sized
    arrays), then pure codegen higher-order array functions (bounded by
    k per row) — no shuffle beyond the join, no Python, no re-scan of
    raw data: estimating month-over-month distinct-user overlap at
    100 TB touches only the sketch columns.
    """
    assert k <= 512, k
    ka, kb = "_kmv_a", "_kmv_b"
    j = a.withColumnRenamed("kmv", ka).join(
        b.withColumnRenamed("kmv", kb), key_cols
    )
    K = F.expr(f"slice(array_sort(array_union({ka}, {kb})), 1, {k})")
    staged = j.select(
        *key_cols,
        F.col(ka),
        F.col(kb),
        K.alias("_K"),
    ).select(
        *key_cols,
        F.size("_K").alias("n_kept"),
        F.element_at("_K", F.size("_K")).alias("_kth"),
        F.expr(
            f"CAST(size(filter(_K, h -> array_contains({ka}, h)"
            f" AND array_contains({kb}, h))) AS BIGINT)"
        ).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("long")
    ).otherwise(
        F.expr(
            f"CAST({(k - 1) * (1 << 52)} AS BIGINT)"
            f" DIV greatest(CAST({_KMV_V52} AS BIGINT), CAST(1 AS BIGINT))"
        )
    )
    out = staged.select(
        *key_cols,
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("_kth").alias("kth_hex"),
        "n_both",
        F.expr("CAST(1000 * n_both AS BIGINT) DIV n_kept").alias(
            "jaccard_permille"
        ),
        union_est.cast("long").alias("union_est"),
    )
    return out.withColumn(
        "inter_est",
        F.expr("CAST(union_est * n_both AS BIGINT) DIV n_kept"),
    )


def kmv_sliding(
    sketch_hour: DataFrame,
    key_cols: list[str],
    window_hours: int = 24,
    k: int = 64,
) -> DataFrame:
    """Sliding-window distinct estimates from the HOUR sketch tier — the
    'active users, trailing 24 h, every hour' query answered WITHOUT
    re-scanning raw data: each hour sketch contributes to the
    ``window_hours`` window ends it falls inside (a bounded explode of
    the sketch tier, never the item stream), and each window re-takes
    the bottom-k of its members' union — exact mergeability again, so
    the result equals sketching the window from raw.  Feed the output to
    :func:`kmv_estimate` for the integer estimates.

    Cost: |hour tier| x window_hours sketch rows into one keyed
    bottom-k — at 100 TB that is ~10^5x smaller than the raw-scan
    alternative, which is the entire point of keeping sketches beside
    buckets.
    """
    hour_us = 3_600_000_000
    ends = F.explode(
        F.sequence(
            F.unix_micros(F.col("bucket_ts")),
            F.unix_micros(F.col("bucket_ts"))
            + F.lit((window_hours - 1) * hour_us),
            F.lit(hour_us),
        )
    )
    member = (
        sketch_hour.select(*key_cols, ends.alias("_w_us"), "kmv")
        .select(
            *key_cols,
            F.timestamp_micros(F.col("_w_us")).alias("window_end"),
            F.explode("kmv").alias("_h"),
        )
        .distinct()
    )
    rn = F.row_number().over(
        W.partitionBy(*key_cols, "window_end").orderBy("_h")
    )
    return (
        member.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .groupBy(*key_cols, "window_end")
        .agg(F.array_sort(F.collect_list("_h")).alias("kmv"))
    )
