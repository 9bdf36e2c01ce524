"""Per-series time-series feature battery, integer-exact.

Feature-store / series-triage pipelines (tsfresh, catch22, Prometheus
recording-rule "series profiles") extract a fixed vector of shape
descriptors per series to cluster, route, or screen millions of series
cheaply before any expensive per-series model runs.  This module
computes the canonical battery in EXACT INTEGER form so every feature is
oracle-pinnable bit-for-bit:

- values quantize to q6 longs (``v_q6 = sign * floor(|v|*1e6 + 0.5)``,
  the repo-wide convention) and everything downstream is long
  arithmetic;
- "above the mean" avoids the division entirely: with n = count and
  S = sum(v_q6), ``v > mean  <=>  v_q6 * n > S`` (longs; v_q6 <= ~5.6e8
  on the events scale x n <= ~1e6 stays far under 2^63);
- mean itself is reported as the exact pair (sum_q6, n), not a float.

Features per key (all BIGINT):
  n, sum_q6, min_q6, max_q6,
  n_above          — #points strictly above the series mean,
  n_cross          — #sign changes of the above-mean indicator between
                     consecutive points (tsfresh ``number_crossing_m``
                     at m = mean),
  longest_above    — longest run of consecutive above-mean points
                     (tsfresh ``longest_strike_above_mean``),
  first_max_pos    — 1-based position of the first maximum
                     (``first_location_of_maximum``),
  abs_change_sum_q6 — sum |x_t - x_{t-1}| in q6 units
                     (``absolute_sum_of_changes``),
  n_distinct_q6    — distinct quantized values.

Spark shape: one window pass per key (rows stream through their
executor in ts order) plus a key-level aggregate broadcast back — the
shuffle carries each row once, keyed by the series key, which is exactly
how the work partitions on a 1000-executor cluster; no per-row Python.

Reference analog: none; spec source is §2.3 (per-series diagnostics
battery beside paa_sax / seasonal_strength) + BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = [
    "ts_features",
    "sample_entropy",
    "perm_entropy",
    "nonlinearity_stats",
    "trimmed_mean",
]


def ts_features(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """The per-key feature battery (module docstring).  ``order_cols``
    break ts ties deterministically (pass the event id)."""
    order_cols = order_cols or []
    q6v = (
        F.signum(F.col(value_col))
        * F.floor(F.abs(F.col(value_col)) * 1e6 + F.lit(0.5))
    ).cast("long")

    ws = W.partitionBy(*key_cols).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    staged = df.select(*key_cols, ts_col, *order_cols, q6v.alias("_xq")).select(
        *key_cols,
        "_xq",
        F.row_number().over(ws).alias("_t"),
        F.lag("_xq").over(ws).alias("_prev"),
    )
    totals = staged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_xq").alias("sum_q6"),
        F.min("_xq").alias("min_q6"),
        F.max("_xq").alias("max_q6"),
        F.count_distinct("_xq").alias("n_distinct_q6"),
        F.sum(F.abs(F.col("_xq") - F.col("_prev"))).alias(
            "abs_change_sum_q6"
        ),
    )
    rows = staged.join(F.broadcast(totals), key_cols).select(
        *key_cols,
        "_t",
        "n",
        "sum_q6",
        "min_q6",
        "max_q6",
        "n_distinct_q6",
        "abs_change_sum_q6",
        # exact: v > mean  <=>  v_q6 * n > sum_q6
        (F.col("_xq") * F.col("n") > F.col("sum_q6")).alias("_above"),
        (F.col("_prev") * F.col("n") > F.col("sum_q6")).alias("_pabove"),
        (F.col("_xq") == F.col("max_q6")).alias("_ismax"),
        F.col("_prev").isNull().alias("_first"),
    )
    # island id for above-mean runs: cumulative count of indicator flips
    wrun = (
        W.partitionBy(*key_cols)
        .orderBy("_t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flip = (
        (~F.col("_first"))
        & (F.col("_above") != F.col("_pabove"))
    ).cast("long")
    islands = rows.select(
        *key_cols,
        "_t",
        "n",
        "sum_q6",
        "min_q6",
        "max_q6",
        "n_distinct_q6",
        "abs_change_sum_q6",
        "_above",
        "_ismax",
        flip.alias("_flip"),
        F.sum(flip).over(wrun).alias("_island"),
    )
    run_len = (
        islands.filter("_above")
        .groupBy(*key_cols, "_island")
        .agg(F.count(F.lit(1)).alias("_len"))
        .groupBy(*key_cols)
        .agg(F.max("_len").alias("longest_above"))
    )
    per_key = islands.groupBy(*key_cols).agg(
        F.max("n").alias("n"),
        F.max("sum_q6").alias("sum_q6"),
        F.max("min_q6").alias("min_q6"),
        F.max("max_q6").alias("max_q6"),
        F.max("n_distinct_q6").alias("n_distinct_q6"),
        F.coalesce(F.max("abs_change_sum_q6"), F.lit(0)).alias(
            "abs_change_sum_q6"
        ),
        F.sum(F.col("_above").cast("long")).alias("n_above"),
        F.sum("_flip").alias("n_cross"),
        F.min(F.when(F.col("_ismax"), F.col("_t"))).alias("first_max_pos"),
    )
    return per_key.join(F.broadcast(run_len), key_cols, "left").select(
        *key_cols,
        "n",
        "sum_q6",
        "min_q6",
        "max_q6",
        "n_above",
        "n_cross",
        F.coalesce("longest_above", F.lit(0)).cast("long").alias(
            "longest_above"
        ),
        F.col("first_max_pos").cast("long").alias("first_max_pos"),
        "abs_change_sum_q6",
        "n_distinct_q6",
    )


def sample_entropy(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    r: int = 2,
) -> DataFrame:
    """Sample entropy (SampEn, m=2) per series over a NONNEGATIVE
    integer series — the regularity/complexity gauge (Richman &
    Moorman 2000; the physionet/tsfresh canon): low SampEn means the
    series repeats its own templates (predictable, compressible),
    high SampEn means new patterns keep appearing (bursty, hard to
    forecast).  Counts are EXACT:

    - templates are the (x_t, x_{t+1}) pairs (m=2) and (x_t, x_{t+1},
      x_{t+2}) triples, both over t = 1..N-2 (the Richman-Moorman
      index set, so B >= A always);
    - B = #{unordered template pairs with Chebyshev distance <= r on
      the first two components}, A = same with the third component
      too — exact longs from a band-bucketed self-join;
    - sampen_q3 = floor((ln(B) - ln(A)) * 1000 + 0.5) — two logs of
      exact longs (the pmi/zipf discipline), NULL when A = 0.

    Scale shape: the naive SampEn self-join is O(n^2) per series; here
    the join is banded on bucket = x DIV (r+1) with 3 probe buckets
    per template ({-1,0,+1}), so only value-close candidate pairs meet
    — the shuffle is keyed by (series, bucket) and a hot bucket is a
    value plateau, bounded by the series' own repetitiveness (exactly
    the regime where SampEn matters).  Both A and B come out of ONE
    join pass (A is a conditional sum over B's matches).

    Caller bound: values must be nonnegative integers (counts; DIV
    truncation == floor only for x >= 0) and n*r moments small enough
    that pair counts stay in long range — always true for pair counts.
    """
    ws = W.partitionBy(*key_cols).orderBy(order_col)
    x = F.col(value_col).cast("long")
    base = (
        df.select(
            *key_cols,
            x.alias("_x0"),
            F.lead(x, 1).over(ws).alias("_x1"),
            F.lead(x, 2).over(ws).alias("_x2"),
            F.row_number().over(ws).alias("_t"),
        )
        .filter(F.col("_x2").isNotNull())
        .withColumn("_b", F.expr(f"_x0 DIV {int(r) + 1}"))
    )
    left = base.select(
        *key_cols,
        F.col("_t").alias("_tl"),
        F.col("_x0").alias("_l0"),
        F.col("_x1").alias("_l1"),
        F.col("_x2").alias("_l2"),
        F.explode(
            F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1)
        ).alias("_pb"),
    )
    rq = F.lit(int(r))
    pairs = left.join(
        base, [*key_cols] if key_cols else None, "inner"
    ).filter(
        (F.col("_pb") == F.col("_b"))
        & (F.col("_tl") < F.col("_t"))
        & (F.abs(F.col("_l0") - F.col("_x0")) <= rq)
        & (F.abs(F.col("_l1") - F.col("_x1")) <= rq)
    )
    counts = pairs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("b_count"),
        F.sum(
            F.when(
                F.abs(F.col("_l2") - F.col("_x2")) <= rq, F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("a_count"),
    )
    n_templates = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_templates")
    )
    joined = (
        n_templates.join(counts, list(key_cols), "left")
        if key_cols
        else n_templates.crossJoin(counts)
    )
    sampen = F.floor(
        (
            F.log(F.col("b_count").cast("double"))
            - F.log(F.col("a_count").cast("double"))
        )
        * 1000
        + F.lit(0.5)
    ).cast("long")
    return joined.select(
        *key_cols,
        "n_templates",
        F.coalesce(F.col("b_count"), F.lit(0)).alias("b_count"),
        F.coalesce(F.col("a_count"), F.lit(0)).alias("a_count"),
        F.when(
            (F.col("a_count") > 0) & (F.col("b_count") > 0), sampen
        ).alias("sampen_q3"),
    )


# the six stable ordinal patterns of a length-3 window, keyed by
# id = 9*r0 + 3*r1 + r2 where r_i is the STABLE rank of position i
# (ties broken by position, earlier wins) — fixed output column order
_PERM3_IDS: tuple[tuple[int, str], ...] = (
    (5, "c012"),   # x0 <= x1 <= x2   (ranks 0,1,2)
    (7, "c021"),   # x0 <= x2 <  x1   (ranks 0,2,1)
    (11, "c102"),  # x1 <  x0 <= x2   (ranks 1,0,2)
    (15, "c120"),  # x2 <  x0 <= x1   (ranks 1,2,0)
    (19, "c201"),  # x1 <= x2 <  x0   (ranks 2,0,1)
    (21, "c210"),  # x2 <= x1 <  x0   (ranks 2,1,0)
)


def perm_entropy(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Permutation entropy (Bandt & Pompe 2002, m=3) per series — the
    ordinal-pattern complexity gauge beside ``sample_entropy``: SampEn
    asks "do value templates recur", PE asks "how evenly are the six
    up/down SHAPES distributed" (a pure trend uses 1 of 6 patterns,
    PE=0; white noise uses all 6 evenly, PE=ln 6).  Amplitude-blind by
    construction, so it survives level shifts that break value-based
    gauges.

    Exactness: the six pattern counts are EXACT longs.  Ties use the
    STABLE rule (rank of position i = #{j : x_j < x_i or (x_j = x_i
    and j < i)}) so constant runs deterministically land in c012 on
    any engine.  The entropy finalizer quantizes per-pattern BEFORE
    summing — t_p = floor(c_p * ln(c_p) * 1000 + 0.5) — so the
    cross-pattern sum is long addition (order-free) and

        pe_q3 = floor(ln(n)*1000 + 0.5) - (2*sum_t + n) DIV (2*n)

    is integer arithmetic on exact operands; ln only ever sees an
    exact long (the pmi/zipf/hurst q3-log discipline).

    Scale shape: one keyed window pass (two leads), then the keyed
    conditional aggregate reuses the SAME hash partitioning — a
    single exchange end-to-end, no join, no Python.
    """
    ws = W.partitionBy(*key_cols).orderBy(order_col)
    x = F.col(value_col).cast("long")
    base = df.select(
        *key_cols,
        x.alias("_x0"),
        F.lead(x, 1).over(ws).alias("_x1"),
        F.lead(x, 2).over(ws).alias("_x2"),
    ).filter(F.col("_x2").isNotNull())
    x0, x1, x2 = F.col("_x0"), F.col("_x1"), F.col("_x2")
    as_int = lambda c: c.cast("int")  # noqa: E731
    r0 = as_int(x1 < x0) + as_int(x2 < x0)
    r1 = as_int(x0 <= x1) + as_int(x2 < x1)
    r2 = as_int(x0 <= x2) + as_int(x1 <= x2)
    pid = (r0 * 9 + r1 * 3 + r2).alias("_pid")
    patt = base.select(*key_cols, pid)
    aggs = [
        F.sum(F.when(F.col("_pid") == v, 1).otherwise(0))
        .cast("long")
        .alias(nm)
        for v, nm in _PERM3_IDS
    ]
    counted = patt.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_templates"), *aggs
    )
    t_term = lambda nm: F.when(  # noqa: E731
        F.col(nm) > 0,
        F.floor(
            F.col(nm).cast("double") * F.log(F.col(nm).cast("double"))
            * 1000
            + F.lit(0.5)
        ),
    ).otherwise(F.lit(0))
    sum_t = t_term("c012")
    for _, nm in _PERM3_IDS[1:]:
        sum_t = sum_t + t_term(nm)
    n = F.col("n_templates")
    pe = (
        F.floor(F.log(n.cast("double")) * 1000 + F.lit(0.5))
        - F.expr(
            "(2 * _sum_t + n_templates) DIV (2 * n_templates)"
        )
    ).cast("long")
    return (
        counted.withColumn("_sum_t", sum_t.cast("long"))
        .withColumn("pe_q3", pe)
        .drop("_sum_t")
    )


def nonlinearity_stats(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 24),
) -> DataFrame:
    """tsfresh-canon nonlinearity pair per (series, lag), EXACT:

    - c3 (Schreiber & Schmitz 1997 higher-order autocovariance):
      num_c3 = sum_t x_t * x_{t+lag} * x_{t+2lag} — a linear Gaussian
      process drives it to ~mean^3; excess signals multiplicative
      dynamics (traffic cascades, retry storms).
    - trev (time-reversal asymmetry): num_trev = sum_t
      x_{t+2lag}^2 * x_{t+lag} - x_{t+lag} * x_t^2 — time-symmetric
      processes (any linear Gaussian) give ~0; sawtooth load patterns
      (slow ramp, sharp drop) show up signed.

    Both numerators are exact long sums; the means are signed HALF-UP
    integer divisions sign*((2*|num| + n) DIV (2*n)) — no float
    anywhere in the operator, so any engine reproduces it bit-for-bit.

    Caller bound: |x|^3 * n < 2^63 — hourly/daily tier counts by
    construction (x ~ 1e4, n ~ 1e4 -> 1e16).

    Scale shape: ONE keyed window pass computes the leads for every
    lag, the lag axis explodes (x len(lags)), and the keyed aggregate
    reuses the window's partitioning — no join, no Python.
    """
    ws = W.partitionBy(*key_cols).orderBy(order_col)
    x = F.col(value_col).cast("long")
    lead_cols = []
    for lag in lags:
        lead_cols.append(F.lead(x, int(lag)).over(ws).alias(f"_xl_{lag}"))
        lead_cols.append(
            F.lead(x, 2 * int(lag)).over(ws).alias(f"_x2l_{lag}")
        )
    with_leads = df.select(*key_cols, x.alias("_x0"), *lead_cols)
    per_lag = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(lag)).cast("long").alias("lag"),
                    F.col(f"_xl_{lag}").alias("xl"),
                    F.col(f"_x2l_{lag}").alias("x2l"),
                )
                for lag in lags
            ]
        )
    ).alias("_s")
    rows = (
        with_leads.select(*key_cols, "_x0", per_lag)
        .select(*key_cols, "_x0", "_s.lag", "_s.xl", "_s.x2l")
        .filter(F.col("x2l").isNotNull())
    )
    agg = rows.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x0") * F.col("xl") * F.col("x2l")).alias("c3_num"),
        F.sum(
            F.col("x2l") * F.col("x2l") * F.col("xl")
            - F.col("xl") * F.col("_x0") * F.col("_x0")
        ).alias("trev_num"),
    )
    def half_up(name: str) -> F.Column:
        return (
            F.when(F.col(name) < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(f"(2 * abs({name}) + n) DIV (2 * n)")
        ).cast("long")

    return agg.select(
        *key_cols,
        "lag",
        "n",
        "c3_num",
        "trev_num",
        half_up("c3_num").alias("c3_mean"),
        half_up("trev_num").alias("trev_mean"),
    )


def trimmed_mean(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    trim_q6: int = 100_000,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Symmetric trimmed mean per key — the robust location gauge
    between the mean (trim 0) and the median (trim 0.5): drop the k
    lowest and k highest values, average the rest.  Monitoring uses it
    where a handful of bot bursts or timeouts should not move the
    center (the p-trimmed mean is the textbook robust estimator with a
    tunable breakdown point).

    Exact: values quantize to q6 longs (repo convention),
    k = (n * trim_q6) DIV 1e6 exactly, the kept-rank sum is a long,
    and tmean_q6 is a signed half-up integer division — no float.
    Tie handling needs no tiebreaker column for correctness: ranks cut
    by COUNT, and rows tied at the cut boundary carry equal q6 values,
    so the kept SUM is identical whichever tied row is dropped.

    Scale shape: one keyed window pass (rank + per-key count ride the
    same partitioning), and the final aggregate reuses that
    partitioning — a single exchange end-to-end.
    """
    order_cols = order_cols or []
    q6v = (
        F.signum(F.col(value_col))
        * F.floor(F.abs(F.col(value_col)) * 1e6 + F.lit(0.5))
    ).cast("long")
    ws = W.partitionBy(*key_cols).orderBy("_xq", *order_cols)
    wn = W.partitionBy(*key_cols)
    staged = (
        df.select(*key_cols, *order_cols, q6v.alias("_xq"))
        .select(
            *key_cols,
            "_xq",
            F.row_number().over(ws).alias("_r"),
            F.count(F.lit(1)).over(wn).alias("_n"),
        )
        .withColumn(
            "_k", F.expr(f"(_n * {int(trim_q6)}) DIV 1000000")
        )
        .filter(
            (F.col("_r") > F.col("_k"))
            & (F.col("_r") <= F.col("_n") - F.col("_k"))
        )
    )
    agg = staged.groupBy(*key_cols).agg(
        F.max("_n").alias("n"),
        F.max("_k").alias("n_trimmed_each_side"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("_xq").alias("sum_kept_q6"),
    )
    tmean = (
        F.when(F.col("sum_kept_q6") < 0, F.lit(-1)).otherwise(F.lit(1))
        * F.expr("(2 * abs(sum_kept_q6) + n_kept) DIV (2 * n_kept)")
    ).cast("long")
    return agg.select(
        *key_cols,
        "n",
        "n_trimmed_each_side",
        "n_kept",
        "sum_kept_q6",
        tmean.alias("tmean_q6"),
    )
