"""A/B experiment readout: deterministic arm assignment + two-proportion
z-statistic.

The product-analytics counterpart of ``hash_split``: units (users) land
in arm A or B by md5-prefix (the same engine-portable convention the
sampling module uses — no RNG, re-runs and engines agree), successes
are counted per group, and the standard two-proportion z-score

    z = (pa - pb) / sqrt(p_pool (1 - p_pool) (1/na + 1/nb))

is emitted from the four EXACT long counts through one fixed double
expression tree — the oracle mirrors the tree node-for-node, so even
the float z hashes bit-identical (same discipline as promql). No
p-value column: Spark SQL has no erf, and the 1.96/2.58 thresholds are
what dashboards use anyway.

Scale shape: one map stage assigns arms (md5 + substring, codegen), one
groupBy(group) with four conditional-count aggregates — the cost of a
count(*), regardless of corpus size.

Reference analog: none in DADS; SURVEY §2.4 suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ab_test_proportions(
    df: DataFrame,
    unit_col: str,
    success: Column,
    group_cols: list[str],
    a_nibbles: str = "01234567",
) -> DataFrame:
    """Per group: arm sizes, success counts, rates, and the pooled
    two-proportion z-score. Arm A = rows whose md5(unit) first hex
    nibble is in ``a_nibbles`` (default = exactly half the nibble
    space, a 50/50 split in expectation).

    Returns (groups..., n_a, x_a, n_b, x_b, rate_a, rate_b, z). Groups
    where either arm is empty or the pooled rate is degenerate (0 or 1)
    emit z = NULL rather than dividing by zero.
    """
    nib = F.substring(F.md5(F.col(unit_col).cast("string")), 1, 1)
    in_a = nib.isin(list(a_nibbles))
    s = success.cast("boolean")
    agg = df.groupBy(*group_cols).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(in_a & s, 1).otherwise(0)).cast("long").alias("x_a"),
        F.sum(F.when(~in_a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(~in_a & s, 1).otherwise(0)).cast("long").alias("x_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.col("x_a").cast("double") / na
    pb = F.col("x_b").cast("double") / nb
    pool = (F.col("x_a") + F.col("x_b")).cast("double") / (na + nb)
    denom = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (denom > 0),
        (pa - pb) / denom,
    )
    return agg.select(
        *group_cols,
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.when(F.col("n_a") > 0, pa).alias("rate_a"),
        F.when(F.col("n_b") > 0, pb).alias("rate_b"),
        z.alias("z"),
    )
