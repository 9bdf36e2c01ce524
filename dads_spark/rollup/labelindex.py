"""TSDB label inverted index: series discovery by label selectors.

A time-series database's query path starts before any samples are
touched: `{job="api", region="eu", status!="500"}` must be turned into
a set of series ids using an INVERTED INDEX over label pairs —
Prometheus's TSDB keeps exactly this structure (one posting list per
(label name, value), public tsdb/index docs), and at web scale the
label catalog is itself a big table (series churn grows it without
bound — see ``analytics.series_churn``).

Relational re-expression:

- ``build_label_index``: melt the series catalog (one row per series,
  one column per label) into postings (label_name, label_value,
  series_id) with one ``stack`` projection — map-only, no shuffle; at
  rest this table is partition-pruned by label_name.
- ``series_by_labels``: a conjunctive selector with K equality matchers
  becomes ONE filtered scan of the postings (the filter is an OR of K
  (name,value) pairs — pushed to the parquet scan) followed by ONE
  groupBy(series_id) keeping groups with all K distinct names matched.
  No join chain: posting-list intersection as count-matching, a single
  shuffle keyed by series id, sized by the SELECTED postings only.
  Not-equal matchers subtract their posting lists afterwards with a
  broadcast-able anti-join (the matched set is already small).

The correctness pin (same discipline as the trigram index): selection
through the index must EQUAL direct predicate evaluation on the series
catalog — the index prunes, it never loses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_label_index(
    series: DataFrame, series_id_col: str, label_cols: list[str]
) -> DataFrame:
    """Melt a series catalog into (label_name, label_value, series_id)
    postings. Label values are stringified (the index is type-blind,
    like the TSDB it mirrors); NULL labels produce no posting."""
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in label_cols
    )
    return (
        series.select(
            F.col(series_id_col).alias("series_id"),
            F.expr(f"stack({len(label_cols)}, {pairs})").alias(
                "label_name", "label_value"
            ),
        )
        .filter(F.col("label_value").isNotNull())
        .select("label_name", "label_value", "series_id")
    )


def series_by_labels(
    index: DataFrame,
    eq: dict[str, str],
    neq: dict[str, str] | None = None,
) -> DataFrame:
    """Series ids matching ALL ``eq`` selectors and NONE of the ``neq``
    selectors. Returns a single-column (series_id) DataFrame."""
    if not eq:
        raise ValueError("at least one equality selector is required")
    cond = None
    for name, value in eq.items():
        c = (F.col("label_name") == name) & (F.col("label_value") == value)
        cond = c if cond is None else (cond | c)
    matched = (
        index.filter(cond)
        .groupBy("series_id")
        .agg(F.countDistinct("label_name").alias("_n"))
        .filter(F.col("_n") == len(eq))
        .select("series_id")
    )
    for name, value in (neq or {}).items():
        bad = index.filter(
            (F.col("label_name") == name) & (F.col("label_value") == value)
        ).select("series_id")
        matched = matched.join(bad, "series_id", "left_anti")
    return matched


def label_cardinality(index: DataFrame, top_permille: bool = True) -> DataFrame:
    """Cardinality explorer over the postings table — the TSDB admin
    query behind Prometheus's /api/v1/status (label cardinality) page:
    per label NAME, how many distinct values it takes, how many series
    carry it, the single value covering the most series, and that
    value's share.  This is THE first diagnostic when a tier store's
    series count explodes (an unbounded label — request id, pod hash —
    shows up as n_values ~ n_series).

    All exact integers: share is permille via BIGINT DIV.  Shape: one
    (name, value) count agg with map-side partials, then a |values|-sized
    per-name agg; the top value picks by max(struct(n, value)) where the
    tie-break is deterministic because equal counts compare on the value
    string itself (DESC struct order => largest count, then largest
    value — mirrored exactly by the oracle's row_number).

    Input is ``build_label_index`` output (label_name, label_value,
    series_id), assumed deduplicated per series (one posting per
    (series, name)); n_series counts postings under that contract.
    """
    per_value = index.groupBy("label_name", "label_value").agg(
        F.count(F.lit(1)).alias("_n")
    )
    out = per_value.groupBy("label_name").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum("_n").alias("n_series"),
        F.max(F.struct(F.col("_n"), F.col("label_value"))).alias("_top"),
    )
    top_n = F.col("_top._n")
    cols = [
        F.col("label_name"),
        F.col("n_values").cast("long").alias("n_values"),
        F.col("n_series").cast("long").alias("n_series"),
        F.col("_top.label_value").alias("top_value"),
        top_n.cast("long").alias("top_series"),
    ]
    if top_permille:
        cols.append(
            F.expr("CAST(_top._n AS BIGINT) * 1000 DIV n_series").alias(
                "top_share_permille"
            )
        )
    return out.select(*cols)
