"""Multi-window, multi-burn-rate SLO alerting over event streams.

The SRE-workbook alerting shape: an SLO (e.g. 99% success) defines an
error budget (1 - slo); the *burn rate* of a window is the window's
error ratio divided by the budget (burn 1.0 = spending exactly the
budget; burn 14.4 exhausts a 30-day budget in 2 days). Paging on a
single window is either noisy (short window) or slow (long window), so
the standard rule requires BOTH a long and a short window to burn hot
— the short window proves the problem is still happening, the long one
that enough budget went up in smoke to matter.

Scale shape: events reduce to (service, grain) counter pairs first —
one hash aggregation with map-side partials, the only pass over the
fact table. Every window burn rate is then a RANGE-frame sum over the
grain series, all frames sharing ONE service-keyed exchange and sort
(Catalyst collapses same-partitioning windows into a single Window
node). Integer epoch-bucket arithmetic throughout; burn rates are
(int/int)/budget doubles, bit-identical on any engine evaluating the
same expression tree.

Reference analog: none (the reference scores anomalies, not SLOs);
SURVEY §2.3 north-rule suite — the ops-monitoring twin of the
counter-rate / EWMA lanes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: (name, window_seconds, partner window, threshold) — the SRE-workbook
#: recommended pairs for a 30-day SLO: page on fast burn, ticket on slow.
DEFAULT_RULES = {
    "page": (3600, 300, 14.4),  # 1h AND 5m both above 14.4
    "ticket": (21600, 1800, 6.0),  # 6h AND 30m both above 6.0
}


def slo_burn_rates(
    events: DataFrame,
    service_col: str,
    ts_col: str,
    is_error: Column,
    budget: float = 0.01,
    grain_s: int = 300,
    rules: dict[str, tuple[int, int, float]] | None = None,
) -> DataFrame:
    """Per-(service, grain) burn rates for every window any rule uses,
    plus one boolean alert column per rule.

    Output: (service, grain_epoch, n_total, n_err, burn_<sec>s... ,
    <rule>...) — grain_epoch is the integer bucket start in seconds.
    Grains with zero events produce no row; RANGE frames keep the
    window sums correct across the gaps.
    """
    rules = DEFAULT_RULES if rules is None else rules
    secs = sorted({s for pair in rules.values() for s in pair[:2]})

    # integer bucket arithmetic (epoch - epoch % g), never double division
    sec = F.unix_timestamp(F.col(ts_col))
    epoch = sec - sec % grain_s
    grains = (
        events.select(
            F.col(service_col).alias("service"),
            epoch.alias("grain_epoch"),
            is_error.cast("int").alias("_e"),
        )
        .groupBy("service", "grain_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("_e").alias("n_err"),
        )
    )

    base = Window.partitionBy("service").orderBy("grain_epoch")
    out = grains
    for s in secs:
        w = base.rangeBetween(-(s - grain_s), 0)
        burn = (
            F.sum("n_err").over(w).cast("double")
            / F.sum("n_total").over(w).cast("double")
        ) / F.lit(budget)
        out = out.withColumn(f"burn_{s}s", burn)
    for name, (long_s, short_s, thr) in rules.items():
        out = out.withColumn(
            name,
            (F.col(f"burn_{long_s}s") > F.lit(thr))
            & (F.col(f"burn_{short_s}s") > F.lit(thr)),
        )
    return out


def alert_hysteresis(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tier: str = "hour",
    baseline_days: int = 7,
    fire_n: int = 3,
    clear_m: int = 2,
    num: int = 3,
    den: int = 2,
) -> DataFrame:
    """Alert EPISODES with hysteresis over a rollup tier — the
    Prometheus ``for:`` / ``keep_firing_for:`` semantics that turn point
    breaches into actionable incidents instead of flapping pages.

    Breach rule (exact integers, no float threshold): a bucket breaches
    iff ``den * B * doc_count > num * S`` — i.e. doc_count exceeds
    (num/den)x the key's baseline mean S/B, where (B, S) are the bucket
    count and doc_count sum of the key's first ``baseline_days`` days.
    An alert FIRES at the ``fire_n``-th consecutive breaching bucket and
    CLEARS at the ``clear_m``-th consecutive non-breaching bucket;
    shorter opposing runs in between do not change state (hysteresis).
    "Consecutive" is row-adjacent on the tier grid (gap-filled tiers
    make it wall-clock).

    Everything is window algebra — gaps-and-islands run ids, in-run
    positions, an alternation filter over the event stream — so the
    episode list is exactly expressible in ANSI SQL on any engine, and
    the oracle pins it bit-for-bit.

    Returns (keys..., fired_ts, cleared_ts) — cleared_ts NULL while the
    episode is still firing at end of data.
    """
    from .tiers import bucket_expr, rollup_from_raw

    hourly = rollup_from_raw(df, key_cols, ts_col, None, tier).select(
        *key_cols, "bucket_ts", "doc_count"
    )
    us_per_day = 86_400_000_000
    t_us = F.unix_micros(F.col("bucket_ts"))
    t0 = hourly.groupBy(*key_cols).agg(F.min(t_us).alias("t0_us"))
    with_t = hourly.join(F.broadcast(t0), key_cols).withColumn("_t_us", t_us)
    base = (
        with_t.filter(
            F.col("_t_us") < F.col("t0_us") + F.lit(baseline_days * us_per_day)
        )
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("b"),
            F.sum("doc_count").alias("s"),
        )
    )
    w_all = Window.partitionBy(*key_cols).orderBy("bucket_ts")
    flagged = (
        with_t.join(F.broadcast(base), key_cols)
        .withColumn(
            "_breach",
            F.lit(den) * F.col("b") * F.col("doc_count") > F.lit(num) * F.col("s"),
        )
        .withColumn("_rn", F.row_number().over(w_all))
        .withColumn(
            "_rnb",
            F.row_number().over(
                Window.partitionBy(*key_cols, "_breach").orderBy("bucket_ts")
            ),
        )
        .withColumn("_grp", F.col("_rn") - F.col("_rnb"))
    )
    w_run = Window.partitionBy(*key_cols, "_breach", "_grp").orderBy("bucket_ts")
    events = flagged.withColumn("_pos", F.row_number().over(w_run)).where(
        (F.col("_breach") & (F.col("_pos") == fire_n))
        | (~F.col("_breach") & (F.col("_pos") == clear_m))
    )
    w_ev = Window.partitionBy(*key_cols).orderBy("bucket_ts")
    alt = events.withColumn("_prev", F.lag("_breach").over(w_ev)).where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("_breach"))
    )
    w_alt = Window.partitionBy(*key_cols).orderBy("bucket_ts")
    return (
        alt.withColumn("_next_ts", F.lead("bucket_ts").over(w_alt))
        .where(F.col("_breach"))
        .select(
            *key_cols,
            F.col("bucket_ts").alias("fired_ts"),
            F.col("_next_ts").alias("cleared_ts"),
        )
    )
