"""Incremental view maintenance for JOIN views under insert-only deltas.

A tier store's continuous aggregates (refresh.py) keep AGGREGATE views
fresh by recomputing invalidated buckets; JOIN views (link graph x page
metadata, request log x host dim) need different algebra: with inserts
``dA`` into A and ``dB`` into B, the delta of V = A JOIN B is exactly

    dV = (dA JOIN B_old) UNION ALL (A_old JOIN dB) UNION ALL (dA JOIN dB)

(the cross term appears once — textbook delta-join / DBToaster-style
derivation, insert-only case).  Appending dV to the stored view equals a
full recompute over the updated bases, row-for-row including duplicate
multiplicity — UNION ALL, never UNION, because join views are bags.

Why this matters at 100 TB: the full join re-scan costs |A|·|B|
join-side work every refresh cycle, while dV costs work proportional to
the DELTA times join selectivity.  A day's crawl against a multi-year
corpus is the motivating shape: |dA| is 0.1% of |A|, so maintenance is
~1000x cheaper than recompute — the same argument the tier cascade makes
for aggregates.  The two delta-sided terms broadcast their delta side
when it is small (Spark's own size estimate decides; the gated lane's
plan audit asserts at least one BroadcastHashJoin), and the stored view
is never read at all — maintenance is append-only.

Correctness pin: the gated query computes the view THROUGH the
maintenance path (old view + dV) while the oracle joins the full updated
tables directly; tests additionally pin dV == full_join MINUS old_view
as exact multisets and the empty-delta fixed point.

Reference analog: none; spec source BASELINE.json:6 (continuous
aggregates / incremental refresh) — the join-view half of refresh.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ivm_join_delta", "ivm_join_maintain"]


def ivm_join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """The view delta dV for V = A JOIN B (inner, equi on ``on``) under
    insert-only deltas. UNION ALL of the three delta terms; column order
    follows Spark's join output (key cols, A cols, B cols)."""
    d1 = a_delta.join(b_old, on)
    d2 = a_old.join(b_delta, on)
    d3 = a_delta.join(b_delta, on)
    return d1.unionByName(d2).unionByName(d3)


def ivm_join_maintain(
    view_old: DataFrame,
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """The maintained view: stored rows plus the delta — equal as a bag
    to (A_old ∪ dA) JOIN (B_old ∪ dB) recomputed from scratch."""
    return view_old.unionByName(
        ivm_join_delta(a_old, a_delta, b_old, b_delta, on)
    )
