"""PromQL-style range-vector counter functions with Prometheus's
boundary-extrapolation semantics.

``counter_rate`` (analytics.py) answers "how much did the counter grow
inside each tumbling bucket" — the warehouse rollup shape. Monitoring
systems ask a different question: "evaluated at time t, what was the
increase over the trailing window (t-W, t]", with W typically a multiple
of the evaluation step so windows OVERLAP, and with the raw in-window
delta *extrapolated* to the window edges so the result is comparable
across windows that caught different sample phases. This module
implements that evaluation model — the ``extrapolatedRate`` algorithm
Prometheus applies to ``increase``/``rate`` (promql/functions.go), which
is subtle enough that naive last-minus-first implementations
systematically under-report by one sample interval:

- reset adjustment: a decrease between consecutive in-window samples is
  a counter reset; the delta is corrected by adding the full
  pre-reset value (the counter restarted from zero),
- extrapolation: the sampled interval [first_ts, last_ts] is extended
  toward each window edge by the actual gap when the gap is plausibly
  one sampling period (< 1.1x the average in-window interval), else by
  half an average interval,
- zero-cap: a counter cannot have been negative, so the start-side
  extension is capped at the point where the line through the in-window
  delta would cross zero.

Distribution shape (the 100 TB argument): each sample serves exactly
W/step evaluation times, so the plan is a bounded explode (x W/step,
typically 2-4) followed by ONE groupBy (series, eval_ts) with
decomposable aggregates (count/min/max/min_by/max_by/sum) — the same
shuffle shape as a tier rollup, no self-join, no window re-sort per
evaluation time. The per-pair reset flags are computed once per sample
with a lag window BEFORE the explode, so overlapping windows reuse them.

Reference behavior (public): Prometheus promql/functions.go
extrapolatedRate; semantics cross-checked against the documented
examples in the PromQL docs. Oracle twin: ``promql_rate`` in
__spark_entry__.py (identical double expression tree in DuckDB SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _explode_to_eval_grid(
    df: DataFrame, ts_col: str, window_s: int, step_s: int
) -> DataFrame:
    """Replicate each sample row to every ``step_s``-aligned evaluation
    time t whose trailing window (t-window_s, t] contains it: a BOUNDED
    explode (x window_s/step_s rows), never a range join."""
    k = window_s // step_s
    t0 = (F.floor((F.col(ts_col) + step_s - 1) / step_s) * step_s).cast(
        "long"
    )
    return (
        df.withColumn("_j", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("eval_ts", t0 + F.col("_j") * step_s)
        .filter(F.col("eval_ts") < F.col(ts_col) + window_s)
        .drop("_j")
    )


def extrapolated_increase(
    samples: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_epoch",
    value_col: str = "value",
    window_s: int = 7200,
    step_s: int = 3600,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Evaluate PromQL ``increase``/``rate`` on a counter at every
    ``step_s``-aligned time, each over the trailing ``window_s`` range.

    ``samples``: one row per scrape with integer-second ``ts_col`` and a
    (long) counter ``value_col``. Returns one row per (series, eval_ts)
    that contains >= 2 samples spanning a positive interval, with:
    n_samples, n_resets, raw_delta (reset-adjusted, exact long),
    increase and rate (doubles, Prometheus extrapolation).
    """
    if window_s % step_s != 0:
        raise ValueError("window_s must be a multiple of step_s")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order)

    ts = F.col(ts_col).cast("long")
    val = F.col(value_col).cast("long")
    # per-sample pair state vs the GLOBAL predecessor: inside any window
    # the consecutive-pair chain is the global chain restricted to the
    # window (windows are time-contiguous), so one lag pass serves every
    # overlapping window
    paired = samples.select(
        *key_cols,
        ts.alias("_ts"),
        val.alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.lag(ts).over(w).alias("_prev_ts"),
        F.lag(val).over(w).alias("_prev_v"),
    ).withColumn(
        # Prometheus reset correction: the counter restarted (near) zero
        # and climbed back to v, so the pair's true delta is v - 0 plus
        # whatever the old counter reached — corrected by adding the FULL
        # previous value (functions.go: `resultFloat += prevValue`), not
        # just the drop amount
        "_drop",
        F.when(F.col("_v") < F.col("_prev_v"), F.col("_prev_v"))
        .otherwise(F.lit(0).cast("long")),
    )

    exploded = _explode_to_eval_grid(paired, "_ts", window_s, step_s)

    win_start = F.col("eval_ts") - window_s
    pair_in = F.col("_prev_ts").isNotNull() & (F.col("_prev_ts") > win_start)
    agg = exploded.groupBy(*key_cols, "eval_ts").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.min("_ts").alias("_first_ts"),
        F.max("_ts").alias("_last_ts"),
        F.min_by("_v", "_rn").alias("_first_v"),
        F.max_by("_v", "_rn").alias("_last_v"),
        F.sum(F.when(pair_in & (F.col("_drop") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
        F.sum(F.when(pair_in, F.col("_drop")).otherwise(F.lit(0).cast("long")))
        .alias("_drops"),
    )

    # Prometheus extrapolatedRate, as one double expression tree (the
    # DuckDB oracle mirrors this tree node-for-node so the doubles are
    # bit-identical)
    raw = (F.col("_last_v") - F.col("_first_v") + F.col("_drops")).alias("raw")
    agg = agg.withColumn("raw_delta", raw).filter(
        (F.col("n_samples") >= 2) & (F.col("_last_ts") > F.col("_first_ts"))
    )
    si = (F.col("_last_ts") - F.col("_first_ts")).cast("double")
    dts = (F.col("_first_ts") - (F.col("eval_ts") - window_s)).cast("double")
    dte = (F.col("eval_ts") - F.col("_last_ts")).cast("double")
    avg = si / (F.col("n_samples") - 1).cast("double")
    thr = avg * F.lit(1.1)
    dtz = si * (F.col("_first_v").cast("double") / F.col("raw_delta").cast("double"))
    zero_cap = (F.col("raw_delta") > 0) & (F.col("_first_v") >= 0) & (dtz < dts)
    dts_eff = F.when(zero_cap, dtz).otherwise(dts)
    ext = (
        si
        + F.when(dts_eff < thr, dts_eff).otherwise(avg / F.lit(2.0))
        + F.when(dte < thr, dte).otherwise(avg / F.lit(2.0))
    )
    increase = F.col("raw_delta").cast("double") * (ext / si)
    return agg.select(
        *key_cols,
        "eval_ts",
        "n_samples",
        "n_resets",
        "raw_delta",
        increase.alias("increase"),
        (increase / F.lit(float(window_s))).alias("rate"),
    )


def histogram_quantile(
    buckets: DataFrame,
    key_cols: list[str],
    q: float | list[float],
    le_col: str = "le",
    count_col: str = "cum_count",
    out_col: str = "quantile",
) -> DataFrame:
    """Evaluate PromQL ``histogram_quantile`` over classic cumulative
    le-buckets: one input row per (series, le) carrying the CUMULATIVE
    observation count at upper bound ``le`` (+Inf bucket required — the
    Prometheus histogram contract), one output row per series with the
    q-quantile linearly interpolated inside the owning bucket.

    Semantics follow Prometheus promql/quantile.go ``bucketQuantile``
    (public source), including its edge cases:

    - monotonic repair: cumulative counts forced non-decreasing by a
      running max (scraped float counters can jitter backwards),
    - rank = q * total; the owning bucket is the FIRST whose cumulative
      count reaches rank,
    - +Inf bucket owns the rank -> return the highest finite upper bound
      (no width to interpolate into),
    - first bucket owns it and its upper bound <= 0 -> return that bound
      (le <= 0 buckets carry their own scale); otherwise the first
      bucket's lower bound is 0,
    - groups with < 2 buckets, zero observations, or no +Inf bucket
      yield no row (Prometheus returns NaN; relationally: dropped).

    Distribution shape: the bucket table is tiny relative to raw samples
    (series x ~10 les) — one window pass ordered by le inside each
    series, then a per-group single-row filter. No joins, no explode;
    the expensive part (bucketing raw observations) happens upstream in
    whatever rollup built the cumulative counts. The interpolation is a
    fixed double expression tree the DuckDB oracle mirrors
    node-for-node.

    ``q`` may be a list (e.g. [0.5, 0.9, 0.99] — the dashboard band):
    the window pass runs ONCE and the per-quantile owning-bucket
    selection is a bounded explode over the already-windowed rows, so K
    quantiles cost one extra projection, not K passes. With a list, the
    output carries an extra ``q`` column (one row per series per
    quantile).
    """
    qs = [q] if isinstance(q, (int, float)) else [float(x) for x in q]
    if not qs or any(not 0.0 < x < 1.0 for x in qs):
        raise ValueError("every q must be in (0, 1)")
    single = isinstance(q, (int, float))
    w_ord = W.partitionBy(*key_cols).orderBy(le_col)
    w_all = W.partitionBy(*key_cols)
    cum = F.max(F.col(count_col)).over(
        w_ord.rowsBetween(W.unboundedPreceding, 0)
    )
    marked = buckets.select(
        *key_cols,
        F.col(le_col).cast("double").alias("_le"),
        cum.cast("long").alias("_cum"),
    ).select(
        *key_cols,
        "_le",
        "_cum",
        F.lag("_le").over(w_ord.orderBy("_le")).alias("_prev_le"),
        F.lag("_cum").over(w_ord.orderBy("_le")).alias("_prev_cum"),
        F.max("_cum").over(w_all).alias("_total"),
        F.count(F.lit(1)).over(w_all).alias("_nb"),
        F.max("_le").over(w_all).alias("_max_le"),
    )
    marked = marked.withColumn(
        "q", F.explode(F.array(*[F.lit(float(x)) for x in qs]))
    )
    rank = F.col("q") * F.col("_total").cast("double")
    owning = (F.col("_cum").cast("double") >= rank) & (
        F.col("_prev_cum").isNull()
        | (F.col("_prev_cum").cast("double") < rank)
    )
    valid = (
        (F.col("_total") > 0)
        & (F.col("_nb") >= 2)
        & (F.col("_max_le") == F.lit(float("inf")))
    )
    sel = marked.filter(valid & owning)
    prev_cum_d = F.coalesce(F.col("_prev_cum"), F.lit(0)).cast("double")
    bucket_start = F.coalesce(F.col("_prev_le"), F.lit(0.0))
    width = F.col("_le") - bucket_start
    interp = bucket_start + width * (
        (rank - prev_cum_d) / (F.col("_cum").cast("double") - prev_cum_d)
    )
    result = (
        F.when(F.col("_le") == F.lit(float("inf")), F.col("_prev_le"))
        .when(F.col("_prev_le").isNull() & (F.col("_le") <= 0), F.col("_le"))
        .otherwise(interp)
    )
    extra = [] if single else [F.col("q")]
    return sel.select(
        *key_cols,
        *extra,
        F.col("_total").alias("n_obs"),
        result.alias(out_col),
    )


def predict_linear(
    samples: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_epoch",
    value_col: str = "value",
    window_s: int = 7200,
    step_s: int = 3600,
    horizon_s: int = 3600,
) -> DataFrame:
    """Evaluate PromQL ``predict_linear`` (and its slope, ``deriv``) on a
    gauge at every ``step_s``-aligned time over the trailing ``window_s``
    range: simple least-squares over the in-window samples with x taken
    RELATIVE TO THE EVALUATION TIME (Prometheus linearRegression passes
    interceptTime = enh.Ts), then the fit line read ``horizon_s`` ahead
    (predicted = intercept + slope * horizon).

    Distribution shape: identical to ``extrapolated_increase`` — one
    bounded explode (x window_s/step_s) then ONE groupBy(series, eval_ts)
    whose aggregates are the four regression moments n, Σx, Σy, Σxy, Σx²
    — all exact longs (x = ts - eval_ts is a small in-window offset,
    |x| < window_s, so the moments stay far from long range at any
    realistic scrape density), summed in any order. The slope/intercept
    division happens once per output row in a fixed double expression
    tree the DuckDB oracle mirrors node-for-node.

    Reference behavior (public): Prometheus promql/functions.go
    linearRegression / funcPredictLinear.
    """
    if window_s % step_s != 0:
        raise ValueError("window_s must be a multiple of step_s")
    ts = F.col(ts_col).cast("long")
    val = F.col(value_col).cast("long")
    base = samples.select(*key_cols, ts.alias("_ts"), val.alias("_v"))
    exploded = _explode_to_eval_grid(base, "_ts", window_s, step_s)
    x = (F.col("_ts") - F.col("eval_ts")).cast("long")
    agg = (
        exploded.withColumn("_x", x)
        .groupBy(*key_cols, "eval_ts")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("_x").alias("_sx"),
            F.sum("_v").alias("_sy"),
            F.sum(F.col("_x") * F.col("_v")).alias("_sxy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        )
        # Prometheus requires >= 2 samples; distinct timestamps make the
        # denominator strictly positive (Cauchy-Schwarz is tight only
        # when all x equal)
        .filter(
            (F.col("n_samples") >= 2)
            & (
                F.col("n_samples") * F.col("_sxx")
                != F.col("_sx") * F.col("_sx")
            )
        )
    )
    n = F.col("n_samples").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return agg.select(
        *key_cols,
        "eval_ts",
        "n_samples",
        slope.alias("slope"),
        (intercept + slope * F.lit(float(horizon_s))).alias("predicted"),
    )


def resets_changes(
    samples: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_epoch",
    value_col: str = "value",
    window_s: int = 7200,
    step_s: int = 3600,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """PromQL ``resets(v[w])`` and ``changes(v[w])`` at every
    ``step_s``-aligned evaluation time: over the trailing window, the
    number of adjacent-sample pairs where the value DROPPED (a counter
    reset) and where it changed at all (gauge flappiness) — both pure
    counts, exact longs end-to-end.

    Same execution shape as ``extrapolated_increase``: ONE lag pass
    builds the global adjacent-pair chain (a window's pair chain is the
    global chain restricted to it, since windows are time-contiguous),
    then pairs replicate to their covering evaluation times via the
    shared bounded explode (x window_s/step_s, never a range join). A
    pair counts at eval time t iff BOTH its samples lie in
    (t - window_s, t]. Windows with < 2 samples emit 0s (the row
    appears whenever >= 1 sample is in the window, matching an instant
    vector's presence semantics).
    """
    if window_s % step_s != 0:
        raise ValueError("window_s must be a multiple of step_s")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order)
    ts = F.col(ts_col).cast("long")
    val = F.col(value_col).cast("long")
    paired = samples.select(
        *key_cols,
        ts.alias("_ts"),
        val.alias("_v"),
        F.lag(ts).over(w).alias("_prev_ts"),
        F.lag(val).over(w).alias("_prev_v"),
    )
    grid = _explode_to_eval_grid(paired, "_ts", window_s, step_s)
    in_win = F.col("_prev_ts").isNotNull() & (
        F.col("_prev_ts") > F.col("eval_ts") - window_s
    )
    return grid.groupBy(*key_cols, "eval_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum(
            F.when(in_win & (F.col("_v") < F.col("_prev_v")), 1).otherwise(0)
        )
        .cast("long")
        .alias("resets"),
        F.sum(
            F.when(in_win & (F.col("_v") != F.col("_prev_v")), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("changes"),
    )
