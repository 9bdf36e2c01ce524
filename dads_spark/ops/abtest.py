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


#: z for a 95% one-sided Wilson bound; injected as ONE literal on both
#: engines so no erf/quantile implementation enters the value.
WILSON_Z_95 = 1.959963984540054


def preference_winrate(
    prefs: DataFrame,
    a_col: str,
    b_col: str,
    winner_col: str,
) -> DataFrame:
    """Pairwise-preference readout: per unordered model pair, win/loss/
    tie counts, the win rate, and the Wilson 95% lower bound — the
    standard 'is A actually better than B or is it sample noise' gate
    over human/LLM preference data.

    ``winner_col`` is 'a', 'b' or 'tie' relative to the row's (a, b)
    order; pairs are canonicalized to a < b (flipping the winner), so
    each unordered pair aggregates once. Ties are excluded from the
    rate (the standard convention). Every input to the Wilson formula
    is an exact integer; the formula itself uses only +,-,*,/ and
    sqrt — ALL correctly-rounded IEEE operations — with z as a shared
    literal, so the q6 result is bit-identical on any engine evaluating
    the same expression tree.

    Scale shape: one hash aggregation keyed on the canonical pair; the
    preference stream never joins anything.

    Reference analog: none; SURVEY §2.4 curation/eval suite — the
    preference-data companion to ab_test_proportions.
    """
    a, b, w = F.col(a_col), F.col(b_col), F.col(winner_col)
    canon = prefs.select(
        F.least(a, b).alias("model_a"),
        F.greatest(a, b).alias("model_b"),
        F.when(
            a <= b, w
        ).otherwise(
            F.when(w == "a", F.lit("b")).when(w == "b", F.lit("a"))
            .otherwise(F.lit("tie"))
        ).alias("_w"),
    ).filter(F.col("model_a") != F.col("model_b"))
    agg = canon.groupBy("model_a", "model_b").agg(
        F.sum((F.col("_w") == "a").cast("long")).alias("a_wins"),
        F.sum((F.col("_w") == "b").cast("long")).alias("b_wins"),
        F.sum((F.col("_w") == "tie").cast("long")).alias("ties"),
    )
    z = F.lit(WILSON_Z_95)
    z2 = z * z
    n = (F.col("a_wins") + F.col("b_wins")).cast("double")
    p = F.col("a_wins").cast("double") / n
    lb = (
        p + z2 / (2.0 * n)
        - z * F.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)
    ) / (1.0 + z2 / n)
    q6 = lambda x: (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast(  # noqa: E731
        "long"
    )
    return agg.select(
        "model_a",
        "model_b",
        "a_wins",
        "b_wins",
        "ties",
        F.when(n > 0, q6(1e6 * p)).alias("winrate_q6"),
        F.when(n > 0, q6(1e6 * lb)).alias("wilson_lb_q6"),
    )
