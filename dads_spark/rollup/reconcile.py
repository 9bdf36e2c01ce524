"""Hierarchical forecast reconciliation (top-down proportional).

A tiered warehouse forecasts at several grains of the same hierarchy —
total traffic, per-source, per-domain — and independent ("base")
forecasts are incoherent: the children don't sum to the parent, so
dashboards at different grains disagree. Reconciliation projects the
base forecasts onto the coherent subspace. This module implements the
top-down forecast-proportions method (Gross & Sohl / Hyndman &
Athanasopoulos, *Forecasting: Principles and Practice* ch. 11 — public
textbook material): the parent's base forecast is authoritative and is
distributed to children proportionally to their own base forecasts,

    reconciled_child = child_fc * (parent_fc / sum(child_fc)),

which guarantees sum(reconciled) == parent_fc exactly (up to float
representation) while preserving the children's relative structure.

Distribution shape: the children table is grouped once to one row (the
proportions denominator), which is broadcast back — the child side never
reshuffles, so the pattern costs one scalar aggregate regardless of
child count. At 100 TB the hierarchy table is tiny next to the fact
table that produced the forecasts; reconciliation is free.

Oracle twin: ``forecast_reconcile`` in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def topdown_reconcile(
    children: DataFrame,
    parent_fc: DataFrame,
    key_cols: list[str],
    fc_col: str = "fc",
    parent_fc_col: str = "parent_fc",
) -> DataFrame:
    """Reconcile per-child base forecasts to a parent base forecast.

    ``children``: one row per child key with a double ``fc_col``.
    ``parent_fc``: a ONE-ROW frame with ``parent_fc_col`` (kept as a
    DataFrame so the whole computation stays in one lazy plan).
    Returns children + ``reconciled`` with sum(reconciled) == parent.
    """
    denom = children.agg(F.sum(fc_col).alias("_child_sum"))
    # one-row x one-row cross joins: broadcast, no shuffle on the child side
    out = children.crossJoin(F.broadcast(denom)).crossJoin(
        F.broadcast(parent_fc)
    )
    share = F.col(fc_col) / F.col("_child_sum")
    return out.select(
        *key_cols,
        F.col(fc_col),
        share.alias("share"),
        (F.col(parent_fc_col) * share).alias("reconciled"),
    )
