"""Multi-touch linear attribution (exact micro-credit apportionment),
Kaplan-Meier survival risk table, concentration indices."""

from __future__ import annotations

from pyspark.sql import functions as F

from dads_spark.ops import concentration_metrics, survival_risk_table
from dads_spark.rollup import linear_attribution


def _events(spark, rows):
    # rows: (user, eid, etype, sec)
    return spark.createDataFrame(
        [(u, e, t, s) for u, e, t, s in rows],
        schema="user_id long, event_id long, event_type string, sec long",
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))


def _attr(spark, rows, lookback=100):
    return linear_attribution(
        _events(spark, rows), "user_id", "ts", "event_type", "event_id",
        ["click"], ["buy"], lookback_s=lookback,
    ).collect()


def test_linear_attribution_credits_sum_to_million(spark):
    rows = [(1, i, "click", 10 + i) for i in range(3)] + [(1, 99, "buy", 50)]
    out = _attr(spark, rows)
    assert len(out) == 3
    assert sum(r.credit_micro for r in out) == 1_000_000
    # 1e6 = 3*333333 + 1: the extra unit goes to the MOST RECENT touch
    by_rank = {r.touch_rank: r for r in out}
    assert by_rank[1].credit_micro == 333_334
    assert by_rank[2].credit_micro == 333_333
    assert by_rank[1].src_id == 2  # latest click is rank 1


def test_linear_attribution_window_and_tie_semantics(spark):
    rows = [
        (1, 1, "click", 0),      # outside 100s lookback of buy at 150
        (1, 2, "click", 60),     # inside
        (1, 3, "click", 150),    # same ts as buy, id 3 < 99 -> counts
        (1, 99, "buy", 150),
        (1, 100, "click", 151),  # after -> excluded
    ]
    out = _attr(spark, rows)
    assert sorted(r.src_id for r in out) == [2, 3]
    assert all(r.n_touches == 2 for r in out)
    assert sum(r.credit_micro for r in out) == 1_000_000


def test_linear_attribution_no_touch_no_row(spark):
    out = _attr(spark, [(1, 99, "buy", 50)])
    assert out == []


def _presence(spark, rows):
    return spark.createDataFrame(rows, schema="url long, crawl long")


def test_survival_risk_table_basic(spark):
    # url 1: crawls 0..2, died (max=4): duration 3
    # url 2: crawls 2..4, censored: duration 3
    # url 3: crawl 4 only, censored: duration 1
    # url 4: crawls 0,3 (hole), died at duration 4
    rows = [(1, c) for c in (0, 1, 2)] + [(2, c) for c in (2, 3, 4)] + [
        (3, 4), (4, 0), (4, 3)]
    out = {
        r.duration: r
        for r in survival_risk_table(
            _presence(spark, rows), "url", "crawl", max_crawl=4
        ).collect()
    }
    assert out[1].n_at_risk == 4 and out[1].n_censored == 1
    assert out[3].n_at_risk == 3 and out[3].n_events == 1
    assert out[3].n_censored == 1
    assert out[4].n_at_risk == 1 and out[4].n_events == 1
    # at-risk is monotone non-increasing in duration
    ds = sorted(out)
    assert all(
        out[a].n_at_risk >= out[b].n_at_risk for a, b in zip(ds, ds[1:])
    )
    # every url accounted for exactly once
    assert sum(out[d].n_events + out[d].n_censored for d in out) == 4


def test_concentration_uniform_and_monopoly(spark):
    rows = (
        [("u", i) for i in range(4)]          # uniform: 4 items x 1
        + [("m", 7)] * 10                      # monopoly: 1 item x 10
        + [("s", 1)] * 3 + [("s", 2)]          # skewed: 3 + 1
    )
    df = spark.createDataFrame(rows, schema="g string, item long")
    out = {r.g: r for r in concentration_metrics(df, ["g"], "item").collect()}
    u, m, s = out["u"], out["m"], out["s"]
    assert u.hhi_q6 == 250_000 and u.gini_q6 == 0
    assert u.top_share_q6 == 250_000
    assert m.hhi_q6 == 1_000_000 and m.top_share_q6 == 1_000_000
    assert m.gini_q6 == 0  # single item: no inequality among items
    # skewed: counts (1,3), n=4, k=2: hhi = (1+9)/16, gini = (1*1+3*3-2*4)/(2*4)
    assert s.hhi_q6 == 625_000
    assert s.gini_q6 == 250_000
    assert s.sum_sq == 10 and s.n_total == 4 and s.k_items == 2


def test_concentration_gini_tie_invariant(spark):
    # two items with EQUAL counts: gini must be 0 regardless of rank order
    rows = [("g", 1)] * 5 + [("g", 2)] * 5
    df = spark.createDataFrame(rows, schema="g string, item long")
    r = concentration_metrics(df, ["g"], "item").collect()[0]
    assert r.gini_q6 == 0 and r.hhi_q6 == 500_000
