"""Concentration / diversity indices over grouped item counts.

Training-data curation needs a one-number answer to "how concentrated
is this slice?" — is a domain's traffic spread across many pages or one
hot URL, is a language bucket dominated by a single site, did the
mixture rebalance actually flatten the source distribution? The
standard indices are the Herfindahl-Hirschman index (HHI, sum of
squared shares — 1/k at uniform, 1.0 at monopoly), its Simpson-
diversity complement, the top-1 share, and the Gini coefficient of the
count distribution.

Everything is exact integer arithmetic until the final quantized
ratios: HHI's numerator is ``sum(c_i^2)`` over the denominator ``n^2``,
and Gini uses the rank formula ``sum((2i - k - 1) * c_(i)) / (k * n)``
with counts sorted ascending — rank ties carry equal counts, so the
within-tie order cannot change the sum and the index is deterministic
without a tiebreak column. Ratios are emitted as half-up micro-units
(``*_q6``), bit-stable across engines (double division of exact
integers is IEEE-specified; no ln/exp surface).

Scale shape: one hash aggregation to (group, item) counts — map-side
partials absorb the item stream — then a group-keyed window ranks the
per-group count rows (|groups| x |items| aggregate rows, not corpus
rows), then a final group aggregation. No joins, no Python stages.

Reference analog: none; SURVEY §2.4 curation suite — the reporting
companion to mixture_balance / domain_cap (which *enforce* balance,
while this *measures* it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _q6(x):
    return (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast("long")


def concentration_metrics(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
) -> DataFrame:
    """Per-group concentration indices over ``count(*)`` by item.

    Returns (groups..., k_items, n_total, sum_sq, hhi_q6, top_share_q6,
    gini_q6): hhi_q6 = 1e6 * sum(c_i^2)/n^2, top_share_q6 = 1e6 *
    max(c_i)/n, gini_q6 = 1e6 * sum((2i - k - 1) c_(i)) / (k * n) with
    counts ranked ascending (0 at uniform, -> 1 as one item takes all).
    """
    counts = df.groupBy(*group_cols, F.col(item_col).alias("_item")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_c").asc(), F.col("_item").asc()
    )
    ranked = counts.withColumn("_i", F.row_number().over(w))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("k_items"),
        F.sum("_c").alias("n_total"),
        F.sum(F.col("_c") * F.col("_c")).alias("sum_sq"),
        F.max("_c").alias("_top"),
        F.sum(
            (2 * F.col("_i") - F.lit(1)) * F.col("_c")
        ).alias("_g2i"),  # sum((2i - 1) c_i); the (k+... ) terms factor out
    )
    n = F.col("n_total").cast("double")
    hhi = 1e6 * F.col("sum_sq").cast("double") / (n * n)
    top = 1e6 * F.col("_top").cast("double") / n
    # sum((2i - k - 1) c_(i)) = sum((2i - 1) c_i) - k * n
    gini_num = (
        F.col("_g2i") - F.col("k_items") * F.col("n_total")
    ).cast("double")
    gini = 1e6 * gini_num / (F.col("k_items").cast("double") * n)
    return agg.select(
        *group_cols,
        "k_items",
        "n_total",
        "sum_sq",
        _q6(hhi).alias("hhi_q6"),
        _q6(top).alias("top_share_q6"),
        _q6(gini).alias("gini_q6"),
    )
