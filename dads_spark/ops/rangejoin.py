"""Bucketed range-lookup join: point-in-interval matching as an
EQUI-join.

``fact.value BETWEEN range.lo AND range.hi`` is the IP-geolocation /
tariff-table / sensor-calibration lookup shape. Spark's optimizer has no
hash strategy for a bare interval predicate — it falls back to
BroadcastNestedLoopJoin (every fact row probes every range: O(N*R),
catastrophic at corpus scale). The standard fix is PREFIX BUCKETING:
explode each range to the fixed-width buckets it covers, bucket each
fact value the same way, hash-join on the bucket, and re-check the exact
interval. Join cost drops to O(N + R * width/bucket) with full
shuffle-hash/AQE machinery available; the explode factor is bounded by
(max range width / bucket width) + 1, a deployment knob.

Correctness is bucketing-independent (the exact BETWEEN re-check runs
after the join), so the gate pins this plan hash-equal to the direct
nested-loop oracle. Overlapping ranges simply produce one output row per
covering range.

Reference analog: none in DADS; the same trick underlies the tier
router's coarsest-covering selection and interval libraries everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket: int = 1 << 24,
) -> DataFrame:
    """All (fact, range) pairs with lo <= value <= hi, via the bucketed
    equi-join. Integer columns only (``div`` keeps the bucket ids exact
    at any magnitude); returns facts' columns + the ranges' columns.
    """
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    r = ranges.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} div {bucket}"),
                F.expr(f"{hi_col} div {bucket}"),
            )
        ),
    )
    f2 = facts.withColumn("_b", F.expr(f"{value_col} div {bucket}"))
    return (
        f2.join(r, "_b")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) <= F.col(hi_col))
        )
        .drop("_b")
    )
