"""Retrieval-ranking evaluation metrics: nDCG@k, MRR, P@k, R@k.

The engine ships several rankers (BM25, cosine/ANN top-k, hybrid RRF
fusion); this is the harness that scores them against relevance labels
— the standard IR evaluation battery, per query, so rankers can be
compared on the same labeled set at corpus scale.

Numeric discipline: every metric that is a single division of exact
integers (precision, recall, MRR) quantizes deterministically; DCG's
position discounts 1/log2(rank+1) are injected as PRECOMPUTED double
literals (a CASE over ranks 1..k, built driver-side in Python), so no
engine's log implementation enters the value — the only float surface
is a sum of <= k products of identical literals, then one division and
a half-up micro-unit quantize.

Scale shape: one window per query ordering (the input already carries
the ranker's rank; the ideal ordering needs one more rank window, both
sharing the query-keyed exchange), then a single hash aggregation to
per-query rows. Metrics cost one pass over the ranked candidates — not
the corpus.

Reference analog: none; SURVEY §2.4 similarity-search suite — the
evaluation companion to knn/ann/hybrid_retrieval.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _q6(x):
    return (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast("long")


def _discount(rank_col: str, k: int):
    """1/log2(rank+1) for ranks 1..k as literal doubles (no engine log)."""
    expr = F.lit(0.0)
    for r in range(1, k + 1):
        expr = F.when(
            F.col(rank_col) == r, F.lit(1.0 / math.log2(r + 1))
        ).otherwise(expr)
    return expr


def ranking_metrics(
    df: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query IR metrics over a ranked candidate list.

    ``rank_col`` is the ranker's 1-based position; ``rel_col`` is a
    non-negative integer relevance grade (0 = irrelevant; binary
    metrics use rel > 0). Returns (query, n_results, n_rel,
    p_at_k_q6, r_at_k_q6, mrr_q6, ndcg_at_k_q6) — micro-unit
    quantities; ndcg/recall NULL for queries with no relevant result.

    DCG gain is the standard (2^rel - 1); the ideal ordering re-ranks
    by rel descending (ties are weight-sum invariant, so no tiebreak
    column is needed for determinism).
    """
    q = F.col(query_col)
    rel = F.col(rel_col).cast("long")
    rank = F.col(rank_col).cast("long")
    # the Python shiftleft helper rejects a Column bit count; the SQL
    # form takes any int expression (exact integer gains, then double)
    gain = F.expr(
        f"cast(shiftleft(cast(1 as bigint), cast({rel_col} as int)) - 1"
        " as double)"
    )
    base = df.select(
        q.alias("query"),
        rank.alias("_rank"),
        rel.alias("_rel"),
        gain.alias("_gain"),
    ).withColumn("_irank", F.row_number().over(
        Window.partitionBy("query").orderBy(
            F.col("_rel").desc(), F.col("_rank").asc()
        )
    ))
    dcg_w = _discount("_rank", k)
    idcg_w = _discount("_irank", k)
    agg = base.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_results"),
        F.sum((F.col("_rel") > 0).cast("long")).alias("n_rel"),
        F.sum(
            ((F.col("_rel") > 0) & (F.col("_rank") <= k)).cast("long")
        ).alias("_hits_k"),
        F.min(
            F.when(F.col("_rel") > 0, F.col("_rank"))
        ).alias("_first_rel"),
        F.sum(F.col("_gain") * dcg_w).alias("_dcg"),
        F.sum(F.col("_gain") * idcg_w).alias("_idcg"),
    )
    return agg.select(
        "query",
        "n_results",
        "n_rel",
        _q6(1e6 * F.col("_hits_k").cast("double") / F.lit(float(k))).alias(
            "p_at_k_q6"
        ),
        F.when(
            F.col("n_rel") > 0,
            _q6(
                1e6
                * F.col("_hits_k").cast("double")
                / F.col("n_rel").cast("double")
            ),
        ).alias("r_at_k_q6"),
        F.when(
            F.col("_first_rel").isNotNull(),
            _q6(1e6 / F.col("_first_rel").cast("double")),
        ).alias("mrr_q6"),
        F.when(
            F.col("_idcg") > 0,
            _q6(1e6 * F.col("_dcg") / F.col("_idcg")),
        ).alias("ndcg_at_k_q6"),
    )


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    query_col: str,
    id_col: str,
    rank_col: str,
    p: float = 0.9,
    k: int = 20,
) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between two rankers'
    top-k lists, per query — the ranker-drift metric: "did the new
    index/model change what users actually see", weighted toward the
    top of the list.

    Truncated form RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |A_d ∩ B_d|/d.
    A doc present in BOTH lists at ranks (ra, rb) contributes to every
    depth d >= max(ra, rb), so its total weight is the SUFFIX SUM
    W(m) = sum_{d=m..k} p^(d-1)/d — precomputed driver-side and
    injected as double literals (the ranking_metrics discount
    pattern; no engine pow/log in the value). One equi-join on
    (query, doc) + one aggregation.

    Returns (query, n_common, rbo_q6).
    """
    w = [0.0] * (k + 2)
    for d in range(k, 0, -1):
        w[d] = w[d + 1] + (p ** (d - 1)) / d
    expr = F.lit(0.0)
    for m in range(1, k + 1):
        expr = F.when(F.col("_m") == m, F.lit((1.0 - p) * w[m])).otherwise(
            expr
        )
    a2 = a.select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).alias("_ra"),
    ).filter(F.col("_ra") <= k)
    b2 = b.select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).alias("_rb"),
    ).filter(F.col("_rb") <= k)
    pairs = a2.join(b2, ["query", "_id"]).withColumn(
        "_m", F.greatest(F.col("_ra"), F.col("_rb"))
    )
    return pairs.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_common"),
        _q6(1e6 * F.sum(expr)).alias("rbo_q6"),
    )
