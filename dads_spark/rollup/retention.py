"""Retention-policy enforcement over materialized tiers.

north rule (BASELINE.json): the engine is a "rollup + downsample +
RETENTION engine" — each tier keeps data only within its retention
horizon (classic continuous-aggregate policy: raw/hour tiers short,
day/week tiers long or forever), measured against a watermark so the
policy is reproducible (no wall-clock dependence).

Scale shape: the filter is a single predicate on the bucket column — when
tiers are written ``partitionBy(bucket_date)`` (write_tier) or Iceberg
``days()``-partitioned, enforcement prunes whole partitions at the scan
and a DELETE under the same predicate is metadata-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: tier -> keep-seconds (None = keep forever); the defaults mirror the
#: usual telemetry ladder: fine tiers short, coarse tiers long
DEFAULT_POLICY: dict[str, int | None] = {
    "hour": 14 * 86_400,
    "day": 90 * 86_400,
    "week": None,
}


def enforce_retention(
    tier_df: DataFrame,
    keep_seconds: int | None,
    watermark: DataFrame | None = None,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Rows of ``tier_df`` within ``keep_seconds`` of the watermark.

    ``watermark`` is a 1-row DataFrame with column ``_wm_us`` (microseconds
    since epoch); default = this tier's own max bucket. It is broadcast —
    the enforcement itself is one scan-side predicate, no shuffle.
    """
    if keep_seconds is None:
        return tier_df
    us = F.unix_micros(F.col(bucket_col).cast("timestamp"))
    if watermark is None:
        watermark = tier_df.agg(F.max(us).alias("_wm_us"))
    return (
        tier_df.crossJoin(F.broadcast(watermark))
        .filter(us >= F.col("_wm_us") - F.lit(int(keep_seconds) * 1_000_000))
        .drop("_wm_us")
    )


def enforce_policy(
    tiers: dict[str, DataFrame],
    policy: dict[str, int | None] | None = None,
    watermark: DataFrame | None = None,
    bucket_col: str = "bucket_ts",
) -> dict[str, DataFrame]:
    """Apply a per-tier retention policy against ONE shared watermark
    (default: the finest tier's max bucket — all tiers age consistently)."""
    policy = DEFAULT_POLICY if policy is None else policy
    if watermark is None:
        finest = min(
            (t for t in tiers if policy.get(t) is not None),
            key=lambda t: policy[t],
            default=next(iter(tiers)),
        )
        us = F.unix_micros(F.col(bucket_col).cast("timestamp"))
        watermark = tiers[finest].agg(F.max(us).alias("_wm_us"))
    return {
        tier: enforce_retention(df, policy.get(tier), watermark, bucket_col)
        for tier, df in tiers.items()
    }


def downsample_on_expiry(
    hour_df: DataFrame,
    day_df: DataFrame,
    keep_hour_seconds: int = DEFAULT_POLICY["hour"],
    watermark: DataFrame | None = None,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """The retention engine's multi-resolution READ path: hour rows inside
    the hour-tier horizon, day rows for everything older — one seamless
    relation where fresh data is fine-grained and aged data is coarse,
    which is what "retention + downsample" means operationally (the
    TimescaleDB / InfluxDB continuous-aggregate ladder).

    The cut is snapped DOWN to a day boundary so the two resolutions never
    overlap and never leave a gap: the day bucket containing the horizon
    stays fine-grained in full; every strictly older day appears exactly
    once as a day row. The watermark (default: the hour tier's own max
    bucket) is a broadcast 1-row relation, so both sides remain one
    scan-side predicate — partition-prunable under a ``days()``/
    ``bucket_date`` layout, no shuffle added.

    Output: (keys..., bucket_sec, resolution, doc_count, value_sum,
    value_min, value_max).
    """
    us = F.unix_micros(F.col(bucket_col).cast("timestamp"))
    if watermark is None:
        watermark = hour_df.agg(F.max(us).alias("_wm_us"))
    day_us = 86_400 * 1_000_000
    cut_day_us = (
        F.floor(
            (F.col("_wm_us") - F.lit(int(keep_hour_seconds) * 1_000_000))
            / F.lit(day_us)
        )
        * F.lit(day_us)
    ).alias("_cut_us")
    cut = F.broadcast(watermark.select(cut_day_us))

    def shape(df: DataFrame, resolution: str, pred) -> DataFrame:
        return (
            df.crossJoin(cut)
            .filter(pred(us, F.col("_cut_us")))
            .select(
                *[c for c in df.columns if c not in (bucket_col, "_cut_us")
                  and not c.startswith("value") and c != "doc_count"],
                (us / 1_000_000).cast("long").alias("bucket_sec"),
                F.lit(resolution).alias("resolution"),
                "doc_count",
                "value_sum",
                "value_min",
                "value_max",
            )
        )

    fine = shape(hour_df, "hour", lambda u, c: u >= c)
    coarse = shape(day_df, "day", lambda u, c: u < c)
    return fine.unionByName(coarse)


def retention_cost_plan(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    policy: dict[str, tuple[int, int]],
) -> DataFrame:
    """Price a retention policy BEFORE enforcing it: for each tier,
    how many bucket-rows exist, how many survive the tier's retention
    horizon (measured back from the data's max timestamp), and the
    storage bytes they cost at the tier's measured encoding rate.

    ``policy`` maps tier name -> (retention_days, bytes_per_row);
    bytes_per_row comes from measured blobstore/encoding-advisor stats
    — this operator does the exact integer arithmetic, not the
    estimation. One pass per tier over TIER-sized aggregates (the raw
    stream collapses in the first rollup); the global max-ts is a
    single-row broadcast. The sizing companion to enforce_retention:
    the same horizon rule, priced instead of applied.

    Returns (tier, total_buckets, retained_buckets, retained_bytes,
    retention_days).
    """
    from .tiers import rollup_from_raw

    frames = []
    for tier, (days, bpr) in sorted(policy.items()):
        t = rollup_from_raw(df, key_cols, ts_col, None, tier).select(
            F.unix_micros(F.col("bucket_ts")).alias("_us")
        )
        mx = t.agg(F.max("_us").alias("_mx"))
        horizon_us = int(days) * 86_400_000_000
        frames.append(
            t.crossJoin(F.broadcast(mx)).agg(
                F.lit(tier).alias("tier"),
                F.count(F.lit(1)).alias("total_buckets"),
                F.sum(
                    (F.col("_us") >= F.col("_mx") - horizon_us).cast("long")
                ).alias("retained_buckets"),
                (
                    F.sum(
                        (F.col("_us") >= F.col("_mx") - horizon_us).cast(
                            "long"
                        )
                    )
                    * int(bpr)
                ).alias("retained_bytes"),
                F.lit(int(days)).alias("retention_days"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
