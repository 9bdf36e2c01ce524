"""Bitemporal as-of reads: valid time x transaction time.

A tier store under late corrections has TWO time axes per fact: when the
value was TRUE (valid time — the metric's own timestamp) and when the
store LEARNED it (transaction time — the ingest/backfill batch).  A
backfill that revises last Tuesday's counter writes a new version with
old valid_from but new tx_from.  Two different questions follow:

- current read:  latest knowledge about valid time V
- audit read:    what did the store BELIEVE about V as of transaction
                 time T — "reproduce the dashboard as rendered on date T",
                 the regulatory / incident-forensics query that plain
                 SCD2 (one axis) cannot answer.

``bitemporal_asof`` answers both (current = T -> infinity) with one
window: among versions with valid_from <= V and tx_from <= T, the winner
has the LARGEST valid_from, tie-broken by LARGEST tx_from (the newest
correction of the governing fact).  Deterministic total order; one
row_number over (entity) after pushing both as-of predicates into the
scan — at 100 TB the predicates prune version files by their
valid_from/tx_from zone maps before any shuffle.

Multiple as-of points batch as a small probe dimension broadcast against
the version table (the asof_dimension_join discipline), not one query
per point.

Reference analog: none; spec source BASELINE.json:6 (out-of-order
ingest / late-data refresh — ingest.py handles the WRITE side, this is
the versioned READ side). Public semantics: SQL:2011 bitemporal tables
(application-time + system-time periods).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = ["bitemporal_asof"]


def bitemporal_asof(
    versions: DataFrame,
    entity_cols: list[str],
    valid_from_col: str,
    tx_from_col: str,
    valid_asof,
    tx_asof,
) -> DataFrame:
    """One row per entity: the version governing valid time
    ``valid_asof`` as known at transaction time ``tx_asof``.  Both
    as-ofs are literal bounds (epoch-comparable values or Columns);
    entities with no qualifying version emit no row."""
    v = valid_asof if isinstance(valid_asof, Column) else F.lit(valid_asof)
    t = tx_asof if isinstance(tx_asof, Column) else F.lit(tx_asof)
    rn = F.row_number().over(
        W.partitionBy(*entity_cols).orderBy(
            F.col(valid_from_col).desc(), F.col(tx_from_col).desc()
        )
    )
    return (
        versions.filter(
            (F.col(valid_from_col) <= v) & (F.col(tx_from_col) <= t)
        )
        .withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
