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


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str = "lo",
    left_hi: str = "hi",
    right_lo: str = "r_lo",
    right_hi: str = "r_hi",
    bucket: int = 1 << 24,
) -> DataFrame:
    """Interval-OVERLAP join (temporal join): all (left, right) pairs
    with ``left_lo <= right_hi AND right_lo <= left_hi`` (closed
    intervals), as a bucketed EQUI-join.

    The session-x-incident / downtime-x-deploy shape. A bare overlap
    predicate is a nested-loop in every SQL engine; bucketing both
    interval sets to fixed-width cells turns it into a hash join whose
    cost is O((|L| + |R|) * avg_span/bucket). A pair sharing several
    cells would join once per shared cell, so each pair is ANCHORED at
    the single cell containing ``greatest(l.lo, r.lo)`` — the overlap
    region's start, which both intervals cover whenever they overlap —
    making the output exactly the distinct overlap pairs with no
    DISTINCT pass. Integer bounds only (``div`` stays exact at any
    magnitude); column names must be disjoint across the two inputs.

    Reference analog: none in DADS; SURVEY §2.4 temporal-join row. The
    gate pins the plan hash-equal to the direct nested-loop oracle.
    """
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    l2 = left.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{left_lo} div {bucket}"),
                F.expr(f"{left_hi} div {bucket}"),
            )
        ),
    )
    r2 = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{right_lo} div {bucket}"),
                F.expr(f"{right_hi} div {bucket}"),
            )
        ),
    )
    return (
        l2.join(r2, "_b")
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (
                F.col("_b")
                == F.expr(f"greatest({left_lo}, {right_lo}) div {bucket}")
            )
        )
        .drop("_b")
    )
