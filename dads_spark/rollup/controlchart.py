"""Western-Electric / Nelson control-chart rules, integer-exact.

The classic SPC rule set over a per-series metric chart (hourly counts
per domain/event type): flag the points where the process left its
own statistical control band. Four rules, each a pure window predicate:

- **R1** one point beyond 3 sigma;
- **R2** nine consecutive points on the same side of the mean;
- **R3** six consecutive strictly-increasing (or -decreasing) points;
- **R4** two of three consecutive points beyond 2 sigma on the SAME side.

Exactness: with per-series exact long moments n, s = sum(v), q = sum(v^2)
over integer-valued points, every sigma test is an INTEGER comparison —
no division, no sqrt:

    |v - mu| > k*sigma
      <=>  (n*v - s)^2 > k^2 * (n*q - s^2)        [multiply by n^2]

so R1 compares dev^2 > 9*A and R4 dev^2 > 4*A with dev = n*v - s and
A = n*q - s^2, all longs. Run rules (R2/R3) are window counts of exact
sign indicators. The whole operator — and therefore its oracle — is
plain ANSI window SQL; no floats exist anywhere.

Caller bound (documented, holds for bucketed counts by construction):
n * max(v)^2 * 9 < 2^63 — e.g. 10^5 hourly buckets of counts up to
10^6 stay exact.

Spark shape: one keyed exchange. The moment aggregates ride unbounded
window frames over the same (key) partitioning as the lag/run frames —
Catalyst plans a single Exchange followed by sorted window passes, and
the final filter keeps only flagged rows (output ∝ anomalies, not
points).

Reference analog: none; spec source is BASELINE.json:6 (per-tier series
diagnostics) — the ops-facing complement of the S2G subsequence scorer:
S2G finds anomalous SHAPES, the chart rules find out-of-control LEVELS
and RUNS with an auditable integer decision per point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["control_chart_flags", "runs_test"]


def control_chart_flags(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-point rule flags for every (key, point) that violates at
    least one of R1/R2/R3/R4. ``value_col`` must be integer-valued
    (counts, byte totals); ``order_col`` a unique-per-key long (epoch
    bucket seconds). Returns (keys..., order, v, dev, a3, r1..r4) with
    the exact decision operands so the pin carries the arithmetic, not
    just the verdict.
    """
    keyw = W.partitionBy(*key_cols)
    ordw = keyw.orderBy(order_col)
    v = F.col(value_col).cast("long")

    n = F.count(F.lit(1)).over(keyw)
    s = F.sum(v).over(keyw)
    q = F.sum(v * v).over(keyw)

    dev = (n * v - s).alias("dev")
    base = df.select(
        *key_cols,
        F.col(order_col).cast("long").alias("t"),
        v.alias("v"),
        dev,
        (n * q - s * s).alias("a"),
    )

    ow = W.partitionBy(*key_cols).orderBy("t")
    last9 = ow.rowsBetween(-8, 0)
    last5 = ow.rowsBetween(-4, 0)
    last3 = ow.rowsBetween(-2, 0)

    d = F.col("dev")
    a = F.col("a")
    above = F.when(d > 0, 1).otherwise(0)
    below = F.when(d < 0, 1).otherwise(0)
    above2 = F.when((d > 0) & (d * d > 4 * a), 1).otherwise(0)
    below2 = F.when((d < 0) & (d * d > 4 * a), 1).otherwise(0)
    prev = F.lag("v").over(ow)
    inc = F.when(prev.isNull(), 0).when(F.col("v") > prev, 1).otherwise(0)
    dec = F.when(prev.isNull(), 0).when(F.col("v") < prev, 1).otherwise(0)

    flagged = base.select(
        *key_cols,
        "t",
        "v",
        "dev",
        "a",
        F.when(d * d > 9 * a, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r1"),
        F.when(
            (F.sum(above).over(last9) == 9) | (F.sum(below).over(last9) == 9),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r2"),
        F.when(
            (F.sum(inc).over(last5) == 5) | (F.sum(dec).over(last5) == 5),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r3"),
        F.when(
            (F.sum(above2).over(last3) >= 2) | (F.sum(below2).over(last3) >= 2),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r4"),
    )
    anyrule = (
        (F.col("r1") == 1)
        | (F.col("r2") == 1)
        | (F.col("r3") == 1)
        | (F.col("r4") == 1)
    )
    return flagged.filter(anyrule)


def runs_test(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Wald-Wolfowitz runs test per series: is the sequence of
    above/below-median points RANDOM, or does it cluster (trend,
    regime stickiness) / alternate (oscillation, load-balancer
    flapping)? The randomness companion to the chart rules: R2/R3
    flag individual runs, this scores the WHOLE series.

    Exactness: the median is carried as the exact 2x order-statistic
    sum; points equal to the median drop (the standard convention);
    run count R and side counts (n1, n0) are exact longs and carry
    the pin. z_q6 = (R - mu)/sigma is one fixed-shape float chain on
    exact operands: mu = 1 + 2*n1*n0/n and
    sigma^2 = 2*n1*n0*(2*n1*n0 - n) / (n^2*(n-1)).

    Scale shape: the order-statistic selection, the lag pass and the
    final aggregate all ride ONE keyed exchange.
    """
    kw = W.partitionBy(*key_cols)
    ow = kw.orderBy(F.col(value_col).cast("long"), order_col)
    ranked = df.select(
        *key_cols,
        F.col(order_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
        F.row_number().over(ow).alias("_rn"),
        F.count(F.lit(1)).over(kw).alias("_n"),
    )
    mid = ranked.filter(
        (F.col("_rn") == F.expr("(_n + 1) DIV 2"))
        | (F.col("_rn") == F.expr("_n DIV 2 + 1"))
    ).groupBy(*key_cols).agg(
        F.when(F.count(F.lit(1)) == 1, 2 * F.sum("_v"))
        .otherwise(F.sum("_v"))
        .alias("_med2")
    )
    sided = (
        ranked.join(mid, key_cols)
        .filter(2 * F.col("_v") != F.col("_med2"))
        .select(
            *key_cols,
            "_t",
            F.when(2 * F.col("_v") > F.col("_med2"), 1)
            .otherwise(0)
            .alias("_side"),
        )
    )
    tw = W.partitionBy(*key_cols).orderBy("_t")
    runs = sided.select(
        *key_cols,
        "_side",
        F.when(
            F.lag("_side").over(tw).isNull()
            | (F.lag("_side").over(tw) != F.col("_side")),
            1,
        )
        .otherwise(0)
        .alias("_new_run"),
    )
    agg = runs.groupBy(*key_cols).agg(
        F.sum("_new_run").alias("n_runs"),
        F.sum("_side").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("_side")).alias("n_below"),
    )
    n = (F.col("n_above") + F.col("n_below")).cast("double")
    p2 = (2 * F.col("n_above") * F.col("n_below")).cast("double")
    mu = 1 + p2 / n
    var = p2 * (p2 - n) / (n * n * (n - 1))
    z = (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    z_q6 = (
        F.when(z < 0, F.lit(-1)).otherwise(F.lit(1))
        * F.floor(F.abs(z) * 1e6 + F.lit(0.5))
    ).cast("long")
    return agg.select(
        *key_cols,
        F.col("n_runs").cast("long").alias("n_runs"),
        F.col("n_above").cast("long").alias("n_above"),
        F.col("n_below").cast("long").alias("n_below"),
        F.when(
            (F.col("n_above") > 0) & (F.col("n_below") > 0)
            & (F.col("n_above") + F.col("n_below") > 1)
            # variance term must be positive: when 2*n1*n0 == n (e.g. one
            # point on each side of the median) var is 0 and z would
            # divide by zero — NULL the statistic like the other
            # degenerate cases so Spark and DuckDB agree
            & (2 * F.col("n_above") * F.col("n_below")
               > F.col("n_above") + F.col("n_below")),
            z_q6,
        ).alias("z_q6"),
    )
