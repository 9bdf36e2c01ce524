"""Blocked fuzzy self-join by edit distance — entity/record linkage for
near-identical strings (misspelled hosts, OCR'd titles, tracking-param
host variants) where exact dedup misses and MinHash shingles are overkill.

The all-pairs Levenshtein join is O(n²); the standard fix is BLOCKING
(Christen 2012, "Data Matching"): candidate pairs are generated only
inside small blocks chosen so that true matches share a block. Here the
block key is (length bucket, prefix) — two strings within edit distance
``max_dist`` differ in length by at most ``max_dist``, so comparing
adjacent length buckets with a shared prefix guarantees recall for
same-prefix variants while keeping every block tiny. Each candidate pair
is scored with the built-in ``levenshtein`` (exact integer — JVM-side in
Spark, identical metric in any engine; no float surface at all).

Scale shape: one shuffle keyed by block; block sizes are bounded by the
key cardinality design (prefix length is the knob), so no hot all-pairs
bucket exists — the same guarantee the LSH band bucket and the SemDeDup
cluster give their families. Pairs are emitted once (left id < right id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["fuzzy_pairs"]


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    prefix_len: int = 3,
    len_bucket: int = 4,
) -> DataFrame:
    """Within-block near-match pairs: (id_a, id_b, str_a, str_b, dist)
    with ``dist <= max_dist``, id_a < id_b, each unordered pair once.

    Blocking key = (prefix_len-char prefix, floor(length / len_bucket));
    each string is assigned to ITS bucket and — when ``max_dist`` could
    cross a bucket boundary — to the neighbor bucket too, so pairs whose
    lengths straddle a boundary still meet (the standard overlapping-
    blocks trick). A pair meeting in two blocks is deduplicated by
    keeping the canonical (lower) block id.
    """
    lb = (F.length(str_col) / len_bucket).cast("long")
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.lower(F.substring(str_col, 1, prefix_len)).alias("_pfx"),
        lb.alias("_lb"),
    )
    # assign to own bucket and the next-lower one (overlap window covers
    # length differences up to len_bucket >= max_dist)
    blocked = base.select(
        "_id", "_s", "_pfx", F.explode(F.array(F.col("_lb"), F.col("_lb") - 1)).alias("_blk")
    )
    a = blocked.select(
        F.col("_id").alias("id_a"),
        F.col("_s").alias("str_a"),
        F.col("_pfx").alias("_pfx"),
        F.col("_blk").alias("_blk"),
    )
    b = blocked.select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("str_b"),
        F.col("_pfx").alias("_pfx"),
        F.col("_blk").alias("_blk"),
    )
    pairs = (
        a.join(b, ["_pfx", "_blk"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "str_a", "str_b")
        .agg(F.count(F.lit(1)).alias("_dup"))  # pair may meet in 2 blocks
        .drop("_dup")
    )
    return pairs.select(
        "id_a",
        "id_b",
        "str_a",
        "str_b",
        F.levenshtein("str_a", "str_b").alias("dist"),
    ).where(F.col("dist") <= max_dist)
