"""Crawl-to-crawl content drift over web-page snapshots.

Common-Crawl-style corpora are re-crawled on a cadence; the per-url
delta between consecutive crawls is BOTH a curation signal (an
unchanged page need not be re-extracted, a heavily-churned page is
often template/ad noise) and a time series in its own right (per-domain
churn rate over crawls). This module classifies every (url, crawl)
observation as one of::

    new             first time the url carries content
    unchanged       content digest equals the most recent prior version
    changed_minor   token-set Jaccard vs prior version >= threshold
    changed_major   token-set Jaccard vs prior version <  threshold
    gone            url was present at crawl k, absent at crawl k+1
                    (emitted once, at the first absent crawl)

Semantics are CONTENT-level across gaps: a url that disappears and
later reappears is compared against its most recent previously-seen
version (reappear-identical => unchanged), and ``new`` fires only on a
url's first-ever appearance. ``gone`` fires only on the present→absent
transition, not for every absent crawl.

Scale shape (the 100 TB argument): the crawl spine (distinct crawl
timestamps) is tiny — tens to hundreds of rows — so it travels as a
BROADCAST on both attach points (index attach, gone-timestamp lookup).
The corpus pays exactly ONE shuffle: the per-url window that orders a
url's observations by crawl index. No urls×crawls grid is ever
materialized (absences are derived from index gaps), so the operator's
row count stays at |snapshots| + |gone transitions|, not
|urls|×|crawls|. Jaccard is exact integer arithmetic over distinct
token arrays (array_intersect/array_union sizes), all JVM codegen — no
Python anywhere.

Reference analog: none (the reference's pipeline is single-corpus);
SURVEY §2.4 training-data suite, webtext×timeseries axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def crawl_delta(
    snapshots: DataFrame,
    url_col: str = "url",
    ts_col: str = "crawl_ts",
    text_col: str = "text",
    minor_jaccard: float = 0.5,
) -> DataFrame:
    """Per-(url, crawl) change classification across crawl snapshots.

    Input: one row per (url, crawl_ts) observation with the page text.
    Output: (url, crawl_ts, status, jaccard) — ``jaccard`` is the
    token-set similarity to the previous version (null except for
    ``changed_*`` rows, where it is an exact int/int double).
    """
    spine = (
        snapshots.select(ts_col)
        .distinct()
        .withColumn(
            "_k", F.row_number().over(Window.orderBy(ts_col))
        )
    )
    # crawl list is tiny: single-partition window above is fine, and it
    # broadcasts to both attach points below.
    k_max = spine.agg(F.max("_k").alias("_k_max"))

    toks = F.array_distinct(F.split(F.col(text_col), " "))
    obs = snapshots.join(F.broadcast(spine), ts_col).select(
        url_col,
        "_k",
        F.sha2(F.col(text_col), 256).alias("_sha"),
        toks.alias("_toks"),
    )

    # window columns materialize in their own projection: generators
    # (explode below) cannot host window expressions directly.
    w = Window.partitionBy(url_col).orderBy("_k")
    scored = obs.select(
        url_col,
        "_k",
        "_sha",
        "_toks",
        F.lag("_sha").over(w).alias("_prev_sha"),
        F.lag("_toks").over(w).alias("_prev_toks"),
        F.lead("_k").over(w).alias("_next_k"),
    )
    prev_sha = F.col("_prev_sha")
    next_k = F.col("_next_k")
    inter = F.size(F.array_intersect(F.col("_toks"), F.col("_prev_toks")))
    union = F.size(F.array_union(F.col("_toks"), F.col("_prev_toks")))
    jac = inter.cast("double") / union.cast("double")

    own = F.struct(
        F.col("_k").alias("_k"),
        F.when(prev_sha.isNull(), F.lit("new"))
        .when(F.col("_sha") == prev_sha, F.lit("unchanged"))
        .when(jac >= F.lit(minor_jaccard), F.lit("changed_minor"))
        .otherwise(F.lit("changed_major"))
        .alias("status"),
        F.when(
            prev_sha.isNotNull() & (F.col("_sha") != prev_sha), jac
        ).alias("jaccard"),
    )
    # gone: the first absent crawl after a presence — an index gap to
    # the next observation, or trailing absence before the global max.
    # Emitted from the SAME windowed pass as the row's own status (a
    # conditional second struct, array_compact'd away otherwise), so the
    # corpus is scanned and url-shuffled exactly once — a present+gone
    # union would rebuild the whole windowed subtree twice.
    gone = F.when(
        (next_k.isNull() & (F.col("_k") < F.col("_k_max")))
        | (next_k > F.col("_k") + 1),
        F.struct(
            (F.col("_k") + 1).alias("_k"),
            F.lit("gone").alias("status"),
            F.lit(None).cast("double").alias("jaccard"),
        ),
    )

    return (
        scored.crossJoin(F.broadcast(k_max))
        .select(
            url_col,
            F.explode(F.array_compact(F.array(own, gone))).alias("_r"),
        )
        .select(url_col, "_r._k", "_r.status", "_r.jaccard")
        .join(F.broadcast(spine), "_k")
        .select(url_col, ts_col, "status", "jaccard")
    )


def crawl_churn(
    delta: DataFrame,
    domain_col: str = "domain",
    ts_col: str = "crawl_ts",
) -> DataFrame:
    """Per-(domain, crawl) churn rollup over a :func:`crawl_delta` frame.

    One hash aggregation (map-side partials: the payload is five
    conditional counters), emitting counts per status plus
    ``churn = changed / present`` as an exact int/int double — the
    per-domain web-churn time series.
    """
    n = lambda s: F.sum(F.when(F.col("status") == s, 1).otherwise(0))  # noqa: E731
    agg = delta.groupBy(domain_col, ts_col).agg(
        n("new").alias("n_new"),
        n("unchanged").alias("n_unchanged"),
        n("changed_minor").alias("n_minor"),
        n("changed_major").alias("n_major"),
        n("gone").alias("n_gone"),
    )
    present = (
        F.col("n_new") + F.col("n_unchanged") + F.col("n_minor") + F.col("n_major")
    )
    return agg.withColumn(
        "churn",
        F.when(
            present > 0,
            (F.col("n_minor") + F.col("n_major")).cast("double")
            / present.cast("double"),
        ),
    )


def trending_terms(
    snapshots: DataFrame,
    ts_col: str = "crawl_ts",
    text_col: str = "text",
    min_count: int = 10,
) -> DataFrame:
    """Terms whose corpus frequency moved between the FIRST and LAST
    crawl — the crawl-to-crawl vocabulary-drift signal (new entities,
    emerging spam campaigns, template changes) that complements the
    per-url ``crawl_delta`` view with a per-TERM one.

    Score = Laplace-smoothed log-ratio of the term's probability in the
    last vs first crawl, quantized to integer micro-units in the
    SUM-OF-LOGS form (ln(c_new+1) + ln(N_old+V) - ln(c_old+1)
    - ln(N_new+V)) — no product overflow at web scale, identical
    expression on any engine. Positive = rising, negative = falling.

    Plan shape: one explode+count shuffle PER COMPARED CRAWL (each reads
    only its crawl's partition of the snapshot table); the full-outer
    term join and the totals run on the two vocab-sized count tables,
    checkpoint-materialized so the totals pass does not re-explode the
    corpus (the pmi_collocations rule).

    Returns (term, c_old, c_new, trend_q6) for terms with
    c_old + c_new >= min_count.
    """
    lo, hi = snapshots.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]

    def counts(ts, alias):
        return (
            snapshots.where(F.col(ts_col) == F.lit(ts))
            .select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
            .where(F.length("term") > 0)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    j = (
        counts(lo, "c_old")
        .join(counts(hi, "c_new"), "term", "full_outer")
        .fillna(0, ["c_old", "c_new"])
        .localCheckpoint(eager=True)
    )
    tot = j.agg(
        F.sum("c_old").alias("n_old"),
        F.sum("c_new").alias("n_new"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    n_old, n_new, v = int(tot["n_old"]), int(tot["n_new"]), int(tot["v"])
    trend = F.expr(
        f"CAST(floor((ln(CAST(c_new + 1 AS DOUBLE)) + ln(CAST({n_old + v} AS DOUBLE))"
        f" - ln(CAST(c_old + 1 AS DOUBLE)) - ln(CAST({n_new + v} AS DOUBLE)))"
        " * 1e6 + 0.5) AS BIGINT)"
    )
    return (
        j.where(F.col("c_old") + F.col("c_new") >= min_count)
        .select("term", "c_old", "c_new", trend.alias("trend_q6"))
    )


def revisit_schedule(
    visits: DataFrame,
    url_col: str = "url",
    ts_col: str = "crawl_ts",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Change-rate-driven revisit scheduling (the Cho & Garcia-Molina
    crawl-freshness policy family): estimate each URL's change rate
    from its visit history, bucket it into a revisit interval.

        n_visits, n_changes : exact counts (change = fingerprint differs
                              from the previous visit's, in ts order)
        change_permille     : 1000 * n_changes DIV (n_visits - 1)
        revisit_hours       : >=500 -> 1, >=200 -> 4, >=50 -> 24,
                              >0 -> 168, ==0 -> 720

    All integer arithmetic; the CASE thresholds are the contract (a
    float Poisson-rate estimate adds a cross-engine log for no
    scheduling benefit — the bucketed interval is what a frontier
    actually consumes).

    Scale shape: one lag window + one agg, both keyed on url — the
    frontier's own key; no Python, no join.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col)
    changed = (
        F.when(F.lag(F.col(fp_col)).over(w).isNull(), F.lit(0))
        .when(F.col(fp_col) != F.lag(F.col(fp_col)).over(w), F.lit(1))
        .otherwise(F.lit(0))
    )
    agg = (
        visits.select(F.col(url_col).alias("url"), changed.alias("_chg"))
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_visits"),
            F.sum("_chg").cast("long").alias("n_changes"),
        )
    )
    permille = F.when(F.col("n_visits") <= 1, F.lit(0)).otherwise(
        F.expr("(n_changes * 1000) DIV (n_visits - 1)")
    )
    staged = agg.withColumn("change_permille", permille.cast("long"))
    hours = (
        F.when(F.col("change_permille") >= 500, F.lit(1))
        .when(F.col("change_permille") >= 200, F.lit(4))
        .when(F.col("change_permille") >= 50, F.lit(24))
        .when(F.col("change_permille") > 0, F.lit(168))
        .otherwise(F.lit(720))
    )
    return staged.select(
        "url",
        "n_visits",
        "n_changes",
        "change_permille",
        hours.cast("long").alias("revisit_hours"),
    )


def survival_risk_table(
    presence: DataFrame,
    id_col: str,
    crawl_col: str,
    max_crawl: int,
) -> DataFrame:
    """Kaplan-Meier RISK TABLE for page lifetimes across crawl
    snapshots: how long does a URL live before it disappears?

    ``presence`` holds one row per (url, crawl_index) observation (holes
    are fine — lifetime is first-seen..last-seen). A url whose last
    observation is the final crawl (``max_crawl``) is CENSORED (still
    alive when observation ended); any other url DIED at duration
    ``last - first + 1`` crawls. The output is the standard survival
    risk table, one row per observed duration::

        (duration, n_at_risk, n_events, n_censored)

    n_at_risk(d) = urls with lifetime >= d, n_events(d) = deaths at
    exactly d, n_censored(d) = censorings at exactly d. Every column is
    an exact integer — the KM survival curve S(d) = prod_{d' <= d}
    (1 - events/at_risk) derives client-side, keeping the gate free of
    cross-engine ln/exp rounding (the unigram_logprob lesson).

    Scale shape: one hash aggregation collapses the presence stream to
    per-url (first, last) — map-side partials do the heavy lifting — a
    second keys on (duration, died) — at most 2x|crawls| rows — and the
    reverse-cumulative n_at_risk window runs over those few rows on a
    single partition BY CONSTRUCTION (|durations| <= |crawls|, hundreds
    at most; documented, not accidental).

    Reference analog: none; SURVEY §2.4 crawl-lifecycle suite — the
    longevity companion to crawl_delta's churn classification.
    """
    lives = (
        presence.groupBy(F.col(id_col).alias("_id"))
        .agg(
            F.min(F.col(crawl_col)).alias("_first"),
            F.max(F.col(crawl_col)).alias("_last"),
        )
        .select(
            (F.col("_last") - F.col("_first") + 1).alias("duration"),
            (F.col("_last") < F.lit(int(max_crawl)))
            .cast("long")
            .alias("_died"),
        )
    )
    per_d = lives.groupBy("duration").agg(
        F.sum("_died").alias("n_events"),
        (F.count(F.lit(1)) - F.sum("_died")).alias("n_censored"),
    )
    w = (
        Window.orderBy(F.col("duration").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_d.select(
        "duration",
        F.sum(F.col("n_events") + F.col("n_censored"))
        .over(w)
        .alias("n_at_risk"),
        "n_events",
        "n_censored",
    )
