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
