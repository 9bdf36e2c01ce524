"""Distribution-drift detection between time periods, integer-exact.

Training-data pipelines watch whether a feature's distribution moved
between ingestion periods (new crawl vs reference crawl, this week vs
baseline). Two metrics over the same baseline-binned histogram grid:

- :func:`tv_drift` — total-variation distance in EXACT INTEGER form (no
  logarithms at all);
- :func:`psi_drift` — the industry-standard Population Stability Index,
  whose ln() cross-engine hazard (paa_sax precedent) is contained by
  quantizing each per-bin term to integer nano-units before the exact
  integer sum (the pmi/unigram_logprob discipline).

The TV identity:

    TV = 1/2 * sum_i | n_i/N - m_i/M |
       = sum_i | n_i*M - m_i*N |  /  (2*N*M)

The numerator ``tv_numer`` and the totals (N, M) are integers — the
metric is pinned bit-for-bit by the oracle; the float quotient is a
display projection. Equal-width binning over the baseline's [min, max]
(ids clamped into [0, bins-1]) keeps bin assignment engine-portable,
unlike percentile bins whose interpolation rules differ.

Spark shape: histograms are groupBy counts with map-side partials — the
shuffle carries (key, period, bin) count rows, never raw values; baseline
bounds/histogram are broadcast (keys x bins rows). The (period x bin)
comparison grid is built with ``sequence``+``explode`` on the tiny period
table, so every downstream join is small-side-broadcast.

Reference analog: none; spec source is §2.4 (corpus-quality monitoring
over time) + BASELINE.json:6 (per-tier series diagnostics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tiers import bucket_expr

__all__ = ["tv_drift", "psi_drift"]


def _drift_grid(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    baseline_days: int,
    period: str,
    bins: int,
) -> DataFrame:
    """Shared drift scaffolding: per-key baseline window + equal-width
    baseline bins, period/baseline histograms, and the completed
    (key, period-bucket, bin) grid with integer counts (n_i, m_i) and
    totals (n_total, m_total). tv_drift and psi_drift are finalizers
    over this grid."""
    us_per_day = 86_400_000_000
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    # per-key baseline window [first_ts, first_ts + baseline_days) and
    # equal-width bin bounds from the baseline value range
    bounds = df.groupBy(*key_cols).agg(F.min(t_us).alias("t0_us"))
    with_t = df.join(F.broadcast(bounds), key_cols).withColumn("_t_us", t_us)
    is_base = F.col("_t_us") < F.col("t0_us") + F.lit(baseline_days * us_per_day)
    base_stats = (
        with_t.filter(is_base)
        .groupBy(*key_cols)
        .agg(F.min(value_col).alias("v_lo"), F.max(value_col).alias("v_hi"))
    )
    binned = (
        with_t.join(F.broadcast(base_stats), key_cols)
        .withColumn(
            "_bin",
            # a constant baseline (v_hi == v_lo) degenerates to one bin —
            # guard the width division (ANSI mode throws on /0)
            F.when(F.col("v_hi") == F.col("v_lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col(value_col) - F.col("v_lo"))
                            / ((F.col("v_hi") - F.col("v_lo")) / F.lit(float(bins)))
                        ).cast("int"),
                    ),
                )
            ),
        )
        .withColumn("_is_base", is_base)
    )

    base_hist = (
        binned.filter("_is_base")
        .groupBy(*key_cols, "_bin")
        .agg(F.count(F.lit(1)).alias("m_i"))
    )
    base_total = base_hist.groupBy(*key_cols).agg(F.sum("m_i").alias("m_total"))

    per_hist = (
        binned.filter(~F.col("_is_base"))
        .groupBy(*key_cols, bucket_expr(ts_col, period), "_bin")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    per_total = per_hist.groupBy(*key_cols, "bucket_ts").agg(
        F.sum("n_i").alias("n_total")
    )

    # complete (key, period, bin) grid so bins empty on either side still
    # contribute |0*M - m_i*N| / |n_i*M - 0*N| terms
    grid = per_total.select(
        *key_cols,
        "bucket_ts",
        "n_total",
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("_bin"),
    )
    joined = (
        grid.join(per_hist, [*key_cols, "bucket_ts", "_bin"], "left")
        .join(F.broadcast(base_hist), [*key_cols, "_bin"], "left")
        .join(F.broadcast(base_total), key_cols)
        .withColumn("n_i", F.coalesce("n_i", F.lit(0)))
        .withColumn("m_i", F.coalesce("m_i", F.lit(0)))
    )
    return joined


def tv_drift(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    baseline_days: int = 7,
    period: str = "day",
    bins: int = 10,
) -> DataFrame:
    """Per (keys..., period bucket) AFTER each key's baseline window: the
    total-variation distance between that period's ``value_col``
    distribution and the key's baseline (its first ``baseline_days`` days),
    over ``bins`` equal-width bins fitted on the baseline range.

    Output: keys..., bucket_ts, tv_numer (exact sum |n_i*M - m_i*N|),
    n_period, n_baseline, tv (float = tv_numer/(2*N*M), 6 dp).
    """
    joined = _drift_grid(
        df, key_cols, ts_col, value_col, baseline_days, period, bins
    )
    term = F.abs(
        F.col("n_i").cast("long") * F.col("m_total").cast("long")
        - F.col("m_i").cast("long") * F.col("n_total").cast("long")
    )
    return (
        joined.groupBy(*key_cols, "bucket_ts", "m_total", "n_total")
        .agg(F.sum(term).alias("tv_numer"))
        .select(
            *key_cols,
            "bucket_ts",
            F.col("tv_numer").cast("long").alias("tv_numer"),
            F.col("n_total").cast("long").alias("n_period"),
            F.col("m_total").cast("long").alias("n_baseline"),
            F.round(
                F.col("tv_numer")
                / (F.lit(2.0) * F.col("n_total") * F.col("m_total")),
                6,
            ).alias("tv"),
        )
    )


def psi_drift(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    baseline_days: int = 7,
    period: str = "day",
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index per (keys..., period bucket) vs the
    key's baseline window — the monitoring metric scorecard/feature-drift
    dashboards standardize on (PSI < 0.1 stable, > 0.25 shifted), beside
    tv_drift's exact-integer twin.

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i) with Laplace +1 smoothing
    (p_i = (n_i+1)/(N+bins), q_i = (m_i+1)/(M+bins)) so empty bins are
    finite. The ln hazard this module's docstring avoids is contained the
    way pmi/unigram_logprob contain it: each PER-BIN term is quantized to
    integer nano-units — the same double expression on any engine — and
    the bin SUM is exact integer arithmetic, so the metric is
    partition-invariant and oracle-pinnable. psi float = psi_q9 / 1e9 is
    a display projection.

    Same plan shape as tv_drift: histograms with map-side partials over
    (key, period, bin) count rows, baseline side broadcast, grid built
    from sequence+explode on the tiny period table.
    """
    joined = _drift_grid(
        df, key_cols, ts_col, value_col, baseline_days, period, bins
    )
    p_num = F.col("n_i").cast("long") + 1
    q_num = F.col("m_i").cast("long") + 1
    p_den = F.col("n_total").cast("long") + F.lit(bins)
    q_den = F.col("m_total").cast("long") + F.lit(bins)
    p = p_num.cast("double") / p_den.cast("double")
    q = q_num.cast("double") / q_den.cast("double")
    # ln(p/q) = ln(p_num*q_den) - ln(q_num*p_den): logs of exact integer
    # products (exact in double to 2^53), identical expression both engines
    lnr = F.log(p_num.cast("double") * q_den.cast("double")) - F.log(
        q_num.cast("double") * p_den.cast("double")
    )
    term_q9 = F.floor((p - q) * lnr * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        joined.groupBy(*key_cols, "bucket_ts", "m_total", "n_total")
        .agg(F.sum(term_q9).alias("psi_q9"))
        .select(
            *key_cols,
            "bucket_ts",
            F.col("psi_q9").cast("long").alias("psi_q9"),
            F.col("n_total").cast("long").alias("n_period"),
            F.col("m_total").cast("long").alias("n_baseline"),
            F.round(F.col("psi_q9") / F.lit(1e9), 6).alias("psi"),
        )
    )


#: Benford's law first-digit shares in permille (floor(log10(1+1/d)*1000)
#: would lose a unit on d=1; these are the standard rounded values and are
#: part of the contract — both engines compare against the same integers).
BENFORD_PERMILLE = (301, 176, 125, 97, 79, 67, 58, 51, 46)


def benford_digits(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    scale: int = 1000,
) -> DataFrame:
    """First-significant-digit distribution per group vs Benford's law —
    the classic fabricated-data / pipeline-bug smell test for metric
    streams (a counter that suddenly violates Benford usually means a
    synthetic backfill or a unit change, not traffic).

    The digit is extracted from ``floor(value * scale)`` as an integer
    (IEEE double multiply + floor are bit-identical cross-engine;
    extracting digits from a double's decimal rendering is NOT), values
    <= 0 are dropped. Output per (keys..., digit): n, n_total,
    share_permille (integer floor), expected_permille, delta_permille —
    all exact integers.

    Scale shape: one codegen projection + one groupBy with <= 9 rows per
    key — partial aggregation makes the shuffle negligible at any size.
    """
    v_int = F.floor(F.col(value_col) * F.lit(int(scale))).cast("long")
    digit = F.substring(v_int.cast("string"), 1, 1).cast("long")
    per = (
        df.where(v_int > 0)
        .select(*key_cols, digit.alias("digit"))
        .groupBy(*key_cols, "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = per.groupBy(*key_cols).agg(F.sum("n").alias("n_total"))
    expected = F.element_at(
        F.array(*[F.lit(x) for x in BENFORD_PERMILLE]),
        F.col("digit").cast("int"),
    ).cast("long")
    share = F.expr("(n * 1000) DIV n_total")
    return (
        per.join(totals, key_cols)
        .select(
            *key_cols,
            F.col("digit"),
            F.col("n").cast("long").alias("n"),
            F.col("n_total").cast("long").alias("n_total"),
            share.cast("long").alias("share_permille"),
            expected.alias("expected_permille"),
            (share - expected).cast("long").alias("delta_permille"),
        )
    )


def chi2_drift(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    baseline_days: int = 7,
    period: str = "day",
    bins: int = 16,
) -> DataFrame:
    """Pearson chi-square homogeneity drift per (key, period) vs the
    baseline histogram — the classical test statistic beside tv_drift's
    distance and psi_drift's information measure (three finalizers,
    one shared grid; chi-square is what monitoring stacks threshold
    against chi2 critical values).

    chi2 = sum over baseline-supported bins of (n_i - E_i)^2 / E_i with
    E_i = n_total * m_i / m_total, computed as
    d^2 / (m_i * n_total * m_total) with the EXACT integer cross term
    d = n_i * m_total - m_i * n_total (longs; squared in double —
    d^2 can pass 2^63). Bins the baseline never saw are excluded (the
    standard convention: expected must be positive) and reported via
    ``dof`` = supported_bins - 1 so the consumer can pick the right
    critical value.
    """
    grid = _drift_grid(
        df, key_cols, ts_col, value_col, baseline_days, period, bins
    )
    d = (
        F.col("n_i") * F.col("m_total") - F.col("m_i") * F.col("n_total")
    ).cast("long")
    term = (
        d.cast("double")
        * d.cast("double")
        / (
            F.col("m_i").cast("double")
            * F.col("n_total").cast("double")
            * F.col("m_total").cast("double")
        )
    )
    q6 = lambda x: (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast(  # noqa: E731
        "long"
    )
    return (
        grid.groupBy(*key_cols, "bucket_ts")
        .agg(
            F.max("n_total").alias("n_total"),
            F.sum((F.col("m_i") > 0).cast("long")).alias("_supported"),
            F.sum(F.when(F.col("m_i") > 0, term).otherwise(0.0)).alias(
                "_chi2"
            ),
        )
        .select(
            *key_cols,
            "bucket_ts",
            "n_total",
            (F.col("_supported") - 1).alias("dof"),
            q6(1e6 * F.col("_chi2")).alias("chi2_q6"),
        )
    )
