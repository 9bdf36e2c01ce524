"""Interval operators: hopping-window rollups and gaps-and-islands merges.

Hopping (overlapping) windows are the tier rollup's sliding cousin: every
event lands in ``window/slide`` buckets instead of one, which Spark's
``F.window(ts, win, slide)`` expands JVM-side (a generator expression in
whole-stage codegen — no Python, no join against a calendar table). The
shuffle still carries one PARTIAL row per (key, window) per map task, so
the map-side combine story of the aligned tiers carries over; the only
scale cost vs tumbling is the ``window/slide`` output multiplier, which is
a constant chosen by the caller.

Interval merge (gaps-and-islands) is the classic cumulative-max formulation:
an interval starts a new island iff its start exceeds the running max end
of every earlier interval in the key. One shuffle on the key (the window
partition), then a per-island aggregate that reuses the same partitioning
— Catalyst collapses both windows + the groupBy into a single exchange.
At 100 TB the key (user, domain, ...) is the natural partition and islands
are computed without any join; skewed keys fall back to AQE skew handling
since nothing here requires a key to fit in one task's memory beyond its
own rows (same bound as any window function).

Reference analog: none (DADS has no calendar/window SQL surface); these
are north-rule tier-rollup extensions (BASELINE.json: hour/day/week tiers
-> sliding variants) + sessionization support for the webtext pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def hopping_rollup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str | None,
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Overlapping-window aggregate: count/sum/min/max of ``value_col`` per
    (keys..., window_start) where windows are ``window`` long every
    ``slide``. Emits ``window_start`` as a timestamp column.
    """
    w = F.window(F.col(ts_col), window, slide)
    aggs = [F.count(F.lit(1)).alias("n")]
    agg_names = ["n"]
    if value_col is not None:
        aggs += [
            F.sum(value_col).alias("value_sum"),
            F.min(value_col).alias("value_min"),
            F.max(value_col).alias("value_max"),
        ]
        agg_names += ["value_sum", "value_min", "value_max"]
    return (
        df.groupBy(*key_cols, w.alias("w"))
        .agg(*aggs)
        .select(
            *key_cols, F.col("w.start").alias("window_start"), *agg_names
        )
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching [start, end] intervals per key into
    islands: one row per maximal run with ``island_start``, ``island_end``
    and ``n_intervals``. Intervals touch when ``start <= prev_max_end``
    (closed-interval semantics, ties merge).
    """
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    by_key = Window.partitionBy(*key_cols).orderBy(*order)
    prev_max_end = F.max(end_col).over(
        by_key.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        F.when(prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1)
        .otherwise(0)
    )
    island = F.sum(new_island).over(
        by_key.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_island", island)
        .groupBy(*key_cols, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("_island")
    )
