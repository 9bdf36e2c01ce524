"""Merkle fingerprint tree over a tier table: cheap integrity + diff.

Verifying that two copies of a 100 TB tier agree — a replica after
recovery, a compaction rewrite, a migrated store — must not compare
rows.  A Merkle tree over the natural tier hierarchy does it with log
depth: hash every row, combine row hashes per hour bucket, combine hour
hashes per day, combine day hashes into one root.  Equal roots prove
equal content; unequal roots descend only into the differing subtrees,
so a single corrupted bucket is located in O(depth) hash comparisons
instead of a full scan — the same discipline as the reference's
checksum-based resume (checkpoint manifests fingerprint their inputs;
this fingerprints the DATA at every grain).

Determinism: a level hash is md5 over the CONCATENATION OF ITS SORTED
child hashes (duplicates kept — bag semantics, so duplicate rows are
part of the fingerprint), which is partition- and order-invariant by
construction and mirrored exactly by the oracle's
``string_agg(h, '' ORDER BY h)``.  Each combine's input is bounded by
the level fan-in (rows per bucket, buckets per day, days per root), the
same boundedness argument the tier cascade itself rests on.

Reference analog: checkpoint fingerprinting (checkpoint/manifest.py
cites the reference's resume protocol); this extends it from file
manifests to content. Public semantics: Merkle 1987 hash trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tiers import bucket_expr

__all__ = ["merkle_tiers"]


def _combine(df: DataFrame, group_cols: list[str]) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.md5(
            F.concat_ws("", F.array_sort(F.collect_list("h")))
        ).alias("h")
    )


def merkle_tiers(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Three-level Merkle fingerprint of a (key, ts, values...) table:
    one hash per (key, hour), per (key, day), and per key (the key
    root).  Output: (level, key, bucket_ts, h) with bucket_ts NULL at
    the key-root level; rows hash as md5 of a '|'-joined stringification
    (NULL-safe via coalesce to the empty string)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in value_cols]
    rows = df.select(
        F.col(key_col).alias("key"),
        bucket_expr(ts_col, "hour"),
        F.md5(F.concat_ws("|", *parts)).alias("h"),
    )
    hour = _combine(rows, ["key", "bucket_ts"])
    day = _combine(
        hour.select("key", bucket_expr("bucket_ts", "day"), "h"),
        ["key", "bucket_ts"],
    )
    root = _combine(day.select("key", "h"), ["key"])
    fmt = F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss")
    return (
        hour.select(F.lit("hour").alias("level"), "key", fmt.alias("bucket_ts"), "h")
        .unionByName(
            day.select(F.lit("day").alias("level"), "key", fmt.alias("bucket_ts"), "h")
        )
        .unionByName(
            root.select(
                F.lit("root").alias("level"), "key",
                F.lit(None).cast("string").alias("bucket_ts"), "h",
            )
        )
    )


def merkle_changed(
    old_level: DataFrame, new_level: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Buckets whose content fingerprint differs between two table
    states — the invalidation set for hash-driven incremental refresh.
    ``old_level``/``new_level`` are same-grain merkle level tables
    (key cols + ``h``); a bucket is changed when it is new, gone, or its
    hash moved.  Full outer join on the (bounded, tier-sized) level
    tables; output = key cols + change ('added'|'removed'|'changed').

    This is the refresh trigger refresh.py's invalidation_set cannot
    provide when the LATE ROWS ARE UNKNOWN — e.g. an upstream backfill
    replaced whole files: diff the hour-level fingerprints of old vs new
    state and recompute exactly the moved buckets.
    """
    o = old_level.select(*key_cols, F.col("h").alias("_ho"))
    n = new_level.select(*key_cols, F.col("h").alias("_hn"))
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_ho").isNull(), "added")
        .when(F.col("_hn").isNull(), "removed")
        .otherwise("changed")
    )
    return (
        j.filter(
            F.col("_ho").isNull()
            | F.col("_hn").isNull()
            | (F.col("_ho") != F.col("_hn"))
        )
        .select(*key_cols, change.alias("change"))
    )
