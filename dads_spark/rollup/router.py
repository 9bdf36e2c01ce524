"""Multi-tier range router: serve a time-range query from the coarsest
tiers that cover it.

A continuous-aggregate store answers "totals per key over [t0, t1)" from
its TIERS, not from raw: full weeks inside the range come from the week
tier, the day-aligned fringes from the day tier, and the remaining hour
fringes from the hour tier — the classic TimescaleDB/materialized-rollup
serving plan. For a one-year range that is ~52 week rows + ≤12 day rows
+ ≤46 hour rows per key instead of 8760 hour rows, and the per-tier
bucket predicates are partition-pruning-friendly (`write_tier` lays
tiers out by bucket date), so the scan cost tracks the COARSE row count.

Exactness: the three segment sets partition [t0, t1) by construction
(no overlap, no gap — asserted in code) and tier aggregates are exact
decomposable sums, so the stitched totals equal a raw-table aggregate
bit-for-bit (counts are integers; the `tier_route` gate query pins this
against raw SQL).

The segmentation runs on the driver over BOUNDARIES ONLY (six integer
alignments); the data-side work is three pruned scans and one union-agg.

Reference analog: none; spec source BASELINE.json:6 ("continuous
aggregates at hour/day/week retention tiers" — a store with tiers needs
the read path that exploits them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tiers import TIERS, _OFFSET_US

__all__ = ["range_segments", "route_range"]

_SEC = {t: us // 1_000_000 for t, us in TIERS.items()}
_OFF_SEC = {t: us // 1_000_000 for t, us in _OFFSET_US.items()}


def _align_up(t: int, tier: str) -> int:
    w, o = _SEC[tier], _OFF_SEC[tier]
    return -((-(t - o)) // w) * w + o


def _align_down(t: int, tier: str) -> int:
    w, o = _SEC[tier], _OFF_SEC[tier]
    return ((t - o) // w) * w + o


def range_segments(t0: int, t1: int) -> list[tuple[str, int, int]]:
    """Partition [t0, t1) (epoch seconds, hour-aligned) into maximal
    tier-aligned segments, coarsest-first: [(tier, lo, hi), ...].
    Raises if the bounds are not hour-aligned."""
    if t0 % _SEC["hour"] or t1 % _SEC["hour"]:
        raise ValueError("range bounds must be hour-aligned epoch seconds")
    if t1 <= t0:
        return []
    segs: list[tuple[str, int, int]] = []

    def carve(lo: int, hi: int, tiers: list[str]) -> None:
        if lo >= hi:
            return
        tier, *finer = tiers
        a, b = _align_up(lo, tier), _align_down(hi, tier)
        if a < b:  # a full coarse stretch exists inside [lo, hi)
            segs.append((tier, a, b))
            carve(lo, a, finer)
            carve(b, hi, finer)
        elif finer:
            carve(lo, hi, finer)
        else:
            segs.append((tier, lo, hi))

    carve(t0, t1, ["week", "day", "hour"])
    # partition invariant: segments tile [t0, t1) exactly
    tiled = sorted((lo, hi) for _, lo, hi in segs)
    assert tiled[0][0] == t0 and tiled[-1][1] == t1
    assert all(a[1] == b[0] for a, b in zip(tiled, tiled[1:]))
    return segs


def route_range(
    tiers: dict[str, DataFrame],
    key_cols: list[str],
    t0: int,
    t1: int,
) -> DataFrame:
    """Per-key exact totals over [t0, t1) stitched from the coarsest
    covering tiers. ``tiers`` maps tier name -> tier DataFrame (the
    `rollup_from_raw`/`cascade` schema: keys..., bucket_ts, doc_count,
    value_sum, ...). Output: keys..., doc_count, value_sum, plus
    n_segments_<tier> provenance counts showing which tiers served."""
    segs = range_segments(t0, t1)
    parts = []
    for tier_name, lo, hi in segs:
        df = tiers[tier_name]
        b = F.unix_timestamp(F.col("bucket_ts").cast("timestamp"))
        parts.append(
            df.filter((b >= lo) & (b < hi)).select(
                *key_cols,
                F.col("doc_count"),
                F.col("value_sum"),
                F.lit(tier_name).alias("_tier"),
            )
        )
    if not parts:
        raise ValueError("empty range")
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return (
        unioned.groupBy(*key_cols)
        .agg(
            F.sum("doc_count").cast("long").alias("doc_count"),
            F.sum("value_sum").alias("value_sum"),
            *[
                F.sum((F.col("_tier") == t).cast("long"))
                .cast("long")
                .alias(f"n_rows_{t}")
                for t in ("week", "day", "hour")
            ],
        )
    )
