"""Crawl-to-crawl content drift: hand-built transition matrix oracle."""

from __future__ import annotations

from datetime import datetime

from dads_spark.ops import crawl_churn, crawl_delta

T1, T2, T3, T4 = (datetime(2024, 3, d) for d in (1, 8, 15, 22))

SNAP = [
    # u1: new -> unchanged -> minor edit -> gone
    ("u1", T1, "a b c d"),
    ("u1", T2, "a b c d"),
    ("u1", T3, "a b c x"),
    # u2: new -> gone -> reappears IDENTICAL (content-level => unchanged)
    #     -> total rewrite (major)
    ("u2", T1, "one two"),
    ("u2", T3, "one two"),
    ("u2", T4, "completely different tokens"),
    # u3: first appears mid-history -> partial rewrite (major at 0.25)
    ("u3", T3, "p q r"),
    ("u3", T4, "p z"),
]


def _delta(spark, snap):
    df = spark.createDataFrame(
        snap, "url string, crawl_ts timestamp, text string"
    )
    rows = crawl_delta(df, minor_jaccard=0.5).collect()
    return {(r["url"], r["crawl_ts"].day): (r["status"], r["jaccard"]) for r in rows}


def test_crawl_delta_transitions(spark):
    got = _delta(spark, SNAP)
    assert got[("u1", 1)] == ("new", None)
    assert got[("u1", 8)] == ("unchanged", None)
    # {a,b,c} / {a,b,c,d,x} = 3/5
    assert got[("u1", 15)] == ("changed_minor", 0.6)
    assert got[("u1", 22)] == ("gone", None)
    assert got[("u2", 1)] == ("new", None)
    assert got[("u2", 8)] == ("gone", None)  # transition only, once
    assert got[("u2", 15)] == ("unchanged", None)  # reappear-identical
    assert got[("u2", 22)] == ("changed_major", 0.0)
    assert got[("u3", 15)] == ("new", None)
    assert got[("u3", 22)] == ("changed_major", 0.25)  # {p}/{p,q,r,z}
    assert len(got) == 10  # no rows for absences before first appearance


def test_crawl_delta_partitioning_invariance(spark):
    df = spark.createDataFrame(
        SNAP, "url string, crawl_ts timestamp, text string"
    )
    a = sorted(map(tuple, crawl_delta(df).collect()))
    b = sorted(map(tuple, crawl_delta(df.repartition(7)).collect()))
    assert a == b


def test_crawl_churn_rollup(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        SNAP, "url string, crawl_ts timestamp, text string"
    )
    d = crawl_delta(df).withColumn("domain", F.lit("example.com"))
    churn = {
        r["crawl_ts"].day: r.asDict()
        for r in crawl_churn(d, "domain", "crawl_ts").collect()
    }
    # crawl 3: u1 minor, u2 unchanged, u3 new -> churn 1/3
    c3 = churn[15]
    assert (c3["n_new"], c3["n_unchanged"], c3["n_minor"], c3["n_major"]) == (
        1, 1, 1, 0,
    )
    assert c3["churn"] == 1.0 / 3.0
    # crawl 4: u2 major, u3 major, u1 gone -> churn 2/2, gone counted apart
    c4 = churn[22]
    assert (c4["n_major"], c4["n_gone"]) == (2, 1)
    assert c4["churn"] == 1.0
    # crawl 2: u1 unchanged, u2 gone -> churn 0
    assert churn[8]["churn"] == 0.0


def test_trending_terms_rising_and_falling(spark):
    import math

    from pyspark.sql import functions as F

    from dads_spark.ops import trending_terms

    rows = []
    # crawl 1: 'olden' dominates; crawl 2: 'newish' dominates
    for i in range(10):
        rows.append((f"u{i}", "2024-01-01", "base olden olden filler"))
        rows.append((f"u{i}", "2024-02-01", "base newish newish filler"))
    snap = spark.createDataFrame(
        rows, "url string, crawl_ts string, text string"
    ).withColumn("crawl_ts", F.col("crawl_ts").cast("timestamp"))
    out = {r["term"]: r for r in trending_terms(snap, min_count=5).collect()}
    assert out["newish"]["trend_q6"] > 0 > out["olden"]["trend_q6"]
    assert out["newish"]["c_old"] == 0 and out["newish"]["c_new"] == 20
    # stable terms score ~0 (exact: ln ratio of equal smoothed probs)
    n_old = n_new = 40
    assert abs(out["base"]["trend_q6"]) < 50_000  # < 0.05 nats drift
    # exact mirror for the planted riser
    v = 4  # base, olden, newish, filler
    want = math.floor(
        (math.log(21) + math.log(n_old + v) - math.log(1) - math.log(n_new + v))
        * 1e6
        + 0.5
    )
    assert out["newish"]["trend_q6"] == want


def test_trending_terms_min_count_prunes(spark):
    from pyspark.sql import functions as F

    from dads_spark.ops import trending_terms

    rows = [("u", "2024-01-01", "rare common common common common"),
            ("u", "2024-02-01", "common common common common common")]
    snap = spark.createDataFrame(
        rows, "url string, crawl_ts string, text string"
    ).withColumn("crawl_ts", F.col("crawl_ts").cast("timestamp"))
    terms = {r["term"] for r in trending_terms(snap, min_count=5).collect()}
    assert terms == {"common"}
