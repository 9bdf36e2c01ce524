"""Invalidation-based continuous-aggregate refresh for late data.

The TimescaleDB/materialized-view maintenance shape the streaming
backfill (streaming/backfill.py) solves for a live stream, here as a
BATCH operator: a materialized tier is stale because late rows arrived
after it was built; rather than rebuilding the tier, derive the
*invalidation set* — the distinct (key, bucket) pairs the late rows
touch — recompute ONLY those buckets from the fact table, and splice
them over the stale materialization.

Scale shape (10^12 rows): the invalidation set is tiny (late data
clusters in recent buckets), so it broadcasts; the fact-table rescan is
a broadcast LEFT SEMI join on (key, bucket), and because the bucket is
a pure function of the partition column (days(warc_ts) hidden
partitioning in the north rule's Iceberg layout), the rescan prunes to
the invalidated days — the cost is proportional to the LATE span, not
the table. The stale tier is similarly anti-joined (broadcast) — no
wide shuffle anywhere except the pruned re-aggregation itself, which is
the same map-side-partial rollup shape as the original build.

Exactness: the refreshed tier must be bit-identical to rebuilding the
tier from scratch over (base ∪ late) — metrics here are exact-integer
count/sum/min/max, so no float-order surface exists. The `refreshed`
flag marks spliced buckets for lineage/metrics.

Reference analog: none (the reference scores static series); SURVEY
§2.3 north-rule suite — the batch twin of streaming_tier_backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tiers import bucket_expr, rollup_from_raw


def invalidation_set(
    late: DataFrame, key_cols: list[str], ts_col: str, tier: str = "hour"
) -> DataFrame:
    """Distinct (keys..., bucket_ts) pairs the late rows touch."""
    return late.select(*key_cols, bucket_expr(ts_col, tier)).distinct()


def invalidate_and_refresh(
    stale_tier: DataFrame,
    facts: DataFrame,
    late: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str | None,
    tier: str = "hour",
) -> DataFrame:
    """Splice recomputed buckets over a stale tier materialization.

    ``facts`` is the post-ingest fact table (base rows AND late rows —
    what a fresh rebuild would read); ``stale_tier`` was built before
    ``late`` landed. Returns the refreshed tier plus a ``refreshed``
    boolean, bit-identical to ``rollup_from_raw(facts, ...)`` with the
    flag marking invalidated buckets.
    """
    inval = invalidation_set(late, key_cols, ts_col, tier)
    on = [*key_cols, "bucket_ts"]

    # pruned rescan: only rows landing in an invalidated bucket survive;
    # the broadcast semi join evaluates before the wide agg, so the
    # re-aggregation's input is bounded by the late rows' bucket span
    touched = facts.withColumn(
        "bucket_ts", bucket_expr(ts_col, tier)
    ).join(F.broadcast(inval), on, "left_semi")
    recomputed = rollup_from_raw(
        touched.drop("bucket_ts"), key_cols, ts_col, value_col, tier
    ).withColumn("refreshed", F.lit(True))

    kept = stale_tier.join(F.broadcast(inval), on, "left_anti").withColumn(
        "refreshed", F.lit(False)
    )
    return kept.unionByName(recomputed)
