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


def asof_dimension_join(
    facts: DataFrame,
    dim_history: DataFrame,
    key_cols: list[str],
    fact_ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Point-in-time (AS-OF) dimension enrichment: each fact row joined
    to the SCD2 interval containing its timestamp —

        valid_from <= fact_ts AND (valid_to IS NULL OR fact_ts < valid_to)

    — the warehouse rule that makes historical reports reproducible
    (yesterday's fact sees yesterday's dimension attributes, not
    today's). SCD2 intervals are half-open and non-overlapping per key,
    so each fact matches at most one row; ``how='left'`` keeps facts that
    predate any dimension state (NULL attributes).

    Scale shape: the join keys on ``key_cols`` equality (the shuffle),
    with the interval test as a join residual — the dimension side is
    interval rows (states, not updates), orders of magnitude smaller
    than the fact table, and broadcast-eligible when the entity set is
    bounded.
    """
    f = facts.alias("_f")
    d = dim_history.alias("_d")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"_f.{k}") == F.col(f"_d.{k}"))
    ts = F.col(f"_f.{fact_ts_col}")
    cond = cond & (ts >= F.col("_d.valid_from"))
    cond = cond & (
        F.col("_d.valid_to").isNull() | (ts < F.col("_d.valid_to"))
    )
    dim_attrs = [
        c for c in dim_history.columns
        if c not in (*key_cols, "valid_from", "valid_to", "is_current")
    ]
    return f.join(d, cond, how).select(
        "_f.*",
        *[F.col(f"_d.{c}").alias(c) for c in dim_attrs],
        F.col("_d.valid_from").alias("state_valid_from"),
    )
