"""Cross-group score calibration: quantile normalization.

A corpus-wide quality score is only comparable across domains/languages
if each group's score DISTRIBUTION is comparable — a perplexity of 180
means something different for German than for English, and a length
score skews by site template. Quantile normalization is the standard
fix (borrowed from microarray statistics, routine in LLM-data quality
pipelines): replace each value by the GLOBAL distribution's value at
the same within-group rank, so every group ends up with an identical
(the pooled) distribution and downstream threshold filters cut each
group at the same quantile.

EXACT-integer construction: within-group rank r of n maps to global
target rank ceil(r*N/n) computed as (r*N + n - 1) div N-free integer
arithmetic — no float quantile interpolation anywhere, so results are
bit-identical on any engine. Ties break on an explicit id column
(ordinal ranks), making the map a deterministic permutation-invariant
function of the table.

Scale shape: one window rank per group (shuffle keyed by group), one
GLOBAL ordinal rank (a total sort — this is the definition of the
statistic, same cost class as any exact global quantile), then a join
keyed on the dense integer rank. At 100 TB the exact global rank is
the costly step; the approximate production path substitutes the
mergeable quantile digest (ops/sketch.py) for the global side and keeps
the per-group ranks exact — this module is the exact reference the
digest path is validated against.

Reference analog: none in DADS (pure web-corpus op); SURVEY §2.4 suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def quantile_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Map each row's value to the pooled distribution's value at the
    same within-group quantile.

    Returns the input key columns plus ``rank_in_group``, ``group_n``,
    ``target_rank`` (the exact global rank the row maps to) and
    ``normalized`` (the global value at that rank). The highest row of
    every group maps to the global maximum (r=n -> ceil(N) = N); the
    lowest maps to the global value at rank ceil(N/n).
    """
    base = df.select(*group_cols, id_col, F.col(value_col).alias("_v"))
    gw = W.partitionBy(*group_cols).orderBy("_v", id_col)
    ranked = base.select(
        *group_cols,
        id_col,
        "_v",
        F.row_number().over(gw).cast("long").alias("rank_in_group"),
        F.count(F.lit(1)).over(W.partitionBy(*group_cols)).cast("long").alias(
            "group_n"
        ),
    )
    n_total = base.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    # global ordinal rank -> value lookup (the pooled distribution)
    gg = W.orderBy("_v", *[F.col(c) for c in group_cols], id_col)
    glob = base.select(
        F.row_number().over(gg).cast("long").alias("target_rank"),
        F.col("_v").alias("normalized"),
    )
    # ceil(r*N/n) in pure integer arithmetic; r,n >= 1 so the result is
    # in [1, N] and the rank join below never misses
    target = (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn(
            # `div` is true 64-bit integer division — a double quotient
            # cast long can round across the boundary once r*N nears 2^53
            "target_rank",
            F.expr("(rank_in_group * _n + group_n - 1) div group_n"),
        )
        .drop("_n")
    )
    return target.join(glob, "target_rank").select(
        *group_cols,
        id_col,
        F.col("_v").alias(value_col),
        "rank_in_group",
        "group_n",
        "target_rank",
        "normalized",
    )
