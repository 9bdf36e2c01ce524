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
