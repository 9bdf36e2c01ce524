"""Peak detection with topographic prominence, integer-exact.

Monitoring pipelines rank spikes not by raw height but by PROMINENCE —
how far a peak rises above the higher of its two flanking valleys
(scipy.signal ``find_peaks(..., prominence=)``, the de-facto spec).  A
10k-requests/s peak on a 9.9k plateau is noise; a 2k peak out of a
200-baseline is an incident.  This module computes the classic
definition in EXACT INTEGER form over tier series:

- values quantize to q6 longs (``sign * floor(|v|*1e6 + 0.5)``, the
  repo-wide convention) so every comparison and subtraction is long
  arithmetic;
- a peak is a sample STRICTLY greater than both neighbours (series
  endpoints are never peaks — their outer flank is unobserved);
- for a peak of height h at position t, the left bound is the nearest
  position to the left with value > h (else the series start), the left
  base is the minimum over the open interval between them, symmetrically
  on the right, and  ``prominence = h - max(left_base, right_base)``.

Spark shape: the series stages once per key (one window pass for
neighbours + position), then peaks — a small fraction of the series —
join back to the staged series on the series key and the bounds/bases
fall out of two conditional aggregations.  Both joins shuffle on the
series key only, so the work partitions per series on a 1000-executor
cluster; the per-key cost is |peaks| x series_len, which is why this
runs on TIER series (hour tier = at most 8,760 points/key-year), never
on raw events.  No per-row Python anywhere.

Reference analog: none; spec source is SURVEY §2.3 (per-series
diagnostics battery beside matrix-profile discords / burst intervals)
+ BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["peak_prominence"]


def peak_prominence(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    min_prom_q6: int = 0,
) -> DataFrame:
    """Peaks + prominence per key over the ``order_col``-ordered series
    (module docstring).  Returns one row per peak with
    (keys..., peak_pos, height_q6, prominence_q6), ``peak_pos`` the
    1-based position in the ordered series; peaks below ``min_prom_q6``
    are dropped.
    """
    q6v = (
        F.signum(F.col(value_col))
        * F.floor(F.abs(F.col(value_col)) * 1e6 + F.lit(0.5))
    ).cast("long")
    ws = W.partitionBy(*key_cols).orderBy(order_col)
    s = df.select(*key_cols, order_col, q6v.alias("_xq")).select(
        *key_cols,
        F.row_number().over(ws).alias("_t"),
        "_xq",
        F.lag("_xq").over(ws).alias("_lo"),
        F.lead("_xq").over(ws).alias("_hi"),
    )
    series = s.select(*key_cols, "_t", "_xq")
    n_per_key = series.groupBy(*key_cols).agg(F.max("_t").alias("_n"))
    peaks = (
        s.filter((F.col("_xq") > F.col("_lo")) & (F.col("_xq") > F.col("_hi")))
        .select(*key_cols, F.col("_t").alias("_tp"), F.col("_xq").alias("_h"))
        .join(F.broadcast(n_per_key), key_cols)
    )

    # bounds: nearest strictly-higher sample on each side (else the ends)
    joined = peaks.join(
        series.withColumnRenamed("_t", "_ts").withColumnRenamed("_xq", "_vs"),
        key_cols,
    )
    bounds = joined.groupBy(*key_cols, "_tp", "_h", "_n").agg(
        F.coalesce(
            F.max(
                F.when(
                    (F.col("_ts") < F.col("_tp")) & (F.col("_vs") > F.col("_h")),
                    F.col("_ts"),
                )
            ),
            F.lit(0),
        ).alias("_lb"),
        F.coalesce(
            F.min(
                F.when(
                    (F.col("_ts") > F.col("_tp")) & (F.col("_vs") > F.col("_h")),
                    F.col("_ts"),
                )
            ),
            F.col("_n") + 1,
        ).alias("_rb"),
    )

    # bases: the valley minima on the open intervals (lb, tp) and (tp, rb);
    # both are non-empty — the peak's immediate neighbours are < h, so they
    # can never be the bound samples themselves
    based = bounds.join(
        series.withColumnRenamed("_t", "_ts").withColumnRenamed("_xq", "_vs"),
        key_cols,
    ).groupBy(*key_cols, "_tp", "_h", "_lb", "_rb").agg(
        F.min(
            F.when(
                (F.col("_ts") > F.col("_lb")) & (F.col("_ts") < F.col("_tp")),
                F.col("_vs"),
            )
        ).alias("_bl"),
        F.min(
            F.when(
                (F.col("_ts") > F.col("_tp")) & (F.col("_ts") < F.col("_rb")),
                F.col("_vs"),
            )
        ).alias("_br"),
    )
    return (
        based.select(
            *key_cols,
            F.col("_tp").cast("long").alias("peak_pos"),
            F.col("_h").alias("height_q6"),
            (F.col("_h") - F.greatest("_bl", "_br")).alias("prominence_q6"),
        )
        .filter(F.col("prominence_q6") >= F.lit(int(min_prom_q6)))
    )
