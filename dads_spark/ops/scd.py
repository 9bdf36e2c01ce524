"""Slowly-changing-dimension (SCD2) history derivation.

A web-corpus warehouse tracks entity state over time — a page's language,
a domain's blocklist verdict, a crawler's per-host policy — as a change
stream (key, ts, attrs...). SCD2 turns that stream into interval rows
(key, attrs..., valid_from, valid_to, is_current): consecutive identical
states collapse into one row, each state's interval closes when the next
distinct state opens, and the latest state per key stays open.

Shape at scale: two window passes over the SAME (key) partitioning —
Catalyst reuses one sort+shuffle for both (no second exchange; asserted
in tests via the executed plan), so the whole derivation costs exactly
one shuffle keyed by the entity, the minimum possible for an
order-dependent per-key computation. Comparisons are null-safe
(``eqNullSafe`` / SQL ``IS DISTINCT FROM``), so NULL attribute values
form states like any other value.

Reference analog: none; §2.4 training-data suite (warehouse temporal
modeling beside the versioned tier store — SnapshotStore versions whole
TABLES, SCD2 versions individual ENTITIES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["scd2_history"]


def scd2_history(
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """(key, ts, attrs) change stream -> SCD2 interval rows.

    Output: keys..., attrs..., valid_from (the state's first ``ts``),
    valid_to (the NEXT distinct state's ``ts``, NULL while current),
    is_current. ``tiebreak_cols`` makes the per-key ordering total when
    ``ts`` can collide (mandatory for deterministic output on real data).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order)
    prev_same = [
        F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)) for c in attr_cols
    ]
    state_change = ~prev_same[0]
    for p in prev_same[1:]:
        state_change = state_change | ~p
    # the first row per key is ALWAYS a state open — it cannot be derived
    # from the lag comparison alone, because eqNullSafe(NULL attr, NULL
    # lag) is true and would silently swallow an opening NULL state
    state_change = (F.row_number().over(w) == 1) | state_change
    changes = updates.withColumn("_chg", state_change).filter(F.col("_chg"))
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )
