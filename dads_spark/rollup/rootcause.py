"""Metric-delta dimension attribution — "why did the metric move".

The on-call root-cause question: a topline metric changed between a
baseline period and a comparison period; which dimension values explain
the change? Additive attribution is exact for sum-metrics: the topline
delta equals the sum of per-value deltas within ANY single dimension,
so ranking values of each dimension by |delta| decomposes the move with
zero residual per dimension.

Scale shape: ONE pass over the fact table. Rows are tagged with their
period, melted to (dimension, dim_value) pairs with a map-side
``explode(array(struct...))`` (a xD row expansion that partial
aggregation collapses before the wire), then hash-aggregated keyed on
(dimension, dim_value) with a conditional-sum pivot per period — the
same mergeable partial->final shape as every tier rollup. No joins, no
window over the fact table; the final per-dimension ranking windows run
on |dims| x |values| aggregate rows. All counts stay integers; the
share of the topline delta is emitted as a half-up micro-unit quantity
(``share_q6``), bit-stable across engines.

Reference analog: none in DADS (it scores anomalies on one series);
SURVEY §2.3 north-rule suite — the diagnosis companion to the
wow_delta / changepoint lanes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def delta_attribution(
    df: DataFrame,
    dims: list[str],
    value: Column,
    in_p0: Column,
    in_p1: Column,
    top_k: int = 5,
) -> DataFrame:
    """Per-dimension-value contribution to the (p1 - p0) delta of
    ``sum(value)``.

    ``in_p0`` / ``in_p1`` are boolean period predicates (rows matching
    neither are ignored; a row matching both counts in both, so pass
    disjoint periods). Returns, for each dimension in ``dims``, its
    ``top_k`` values by |delta| (ties broken by dim_value ascending):
    (dimension, dim_value, v0, v1, delta, share_q6, rnk) where share_q6
    = round(1e6 * delta / topline_delta), NULL when the topline did not
    move.
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).alias("dimension"),
                F.col(d).cast("string").alias("dim_value"),
            )
            for d in dims
        ]
    )
    tagged = (
        df.filter(in_p0 | in_p1)
        .select(
            F.explode(pairs).alias("_d"),
            (in_p0.cast("long") * value).alias("_v0"),
            (in_p1.cast("long") * value).alias("_v1"),
        )
        .select("_d.dimension", "_d.dim_value", "_v0", "_v1")
    )
    per_value = tagged.groupBy("dimension", "dim_value").agg(
        F.sum("_v0").alias("v0"), F.sum("_v1").alias("v1")
    )
    # topline delta is dimension-independent: derive it from any one
    # dimension's aggregate rows (broadcast single-row join)
    topline = (
        per_value.filter(F.col("dimension") == dims[0])
        .agg((F.sum("v1") - F.sum("v0")).alias("_total_delta"))
    )
    w = Window.partitionBy("dimension").orderBy(
        F.abs(F.col("v1") - F.col("v0")).desc(), F.col("dim_value").asc()
    )
    delta = F.col("v1") - F.col("v0")
    share = 1e6 * delta.cast("double") / F.col("_total_delta").cast("double")
    return (
        per_value.crossJoin(F.broadcast(topline))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            "dimension",
            "dim_value",
            "v0",
            "v1",
            delta.alias("delta"),
            F.when(
                F.col("_total_delta") != 0,
                (
                    F.signum(share)
                    * F.floor(F.abs(share) + F.lit(0.5))
                ).cast("long"),
            ).alias("share_q6"),
            "rnk",
        )
    )
