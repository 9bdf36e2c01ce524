"""Domain-suffix blocklist (ops/urltools.py) and integer mixture
balancing (ops/sampling.py balance_sample)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import (
    balance_sample,
    blocklist_annotate,
    blocklist_filter,
    host_suffixes,
)


def test_host_suffixes(spark):
    out = spark.range(1).select(
        host_suffixes(F.lit("A.b.Example.COM")).alias("s")
    ).first()["s"]
    assert out == ["com", "example.com", "b.example.com", "a.b.example.com"]
    capped = spark.range(1).select(
        host_suffixes(F.lit("a.b.c.d"), max_labels=2).alias("s")
    ).first()["s"]
    assert capped == ["d", "c.d"]


def _hosts(spark):
    rows = [
        (1, "spam.example.com"),        # exact match
        (2, "deep.sub.spam.example.com"),  # subdomain of rule
        (3, "notspam.example.com"),     # suffix of string but NOT of labels
        (4, "cdn.ads.co.uk"),           # multi-label rule, subdomain
        (5, "ads.co.uk"),               # multi-label rule, exact
        (6, "clean.org"),               # no match
        (7, "spam.example.com.evil.io"),  # rule appears mid-host: no match
    ]
    return spark.createDataFrame(rows, "doc_id long, host string")


def _rules(spark):
    return spark.createDataFrame(
        [("spam.example.com",), ("ads.co.uk",)], "rule string"
    )


def test_blocklist_annotate_semantics(spark):
    got = {
        r["doc_id"]: (r["blocked"], r["matched_rule"])
        for r in blocklist_annotate(_hosts(spark), _rules(spark)).collect()
    }
    assert got[1] == (True, "spam.example.com")
    assert got[2] == (True, "spam.example.com")
    assert got[3] == (False, None)  # label-boundary, not substring, match
    assert got[4] == (True, "ads.co.uk")
    assert got[5] == (True, "ads.co.uk")
    assert got[6] == (False, None)
    assert got[7] == (False, None)


def test_blocklist_longest_rule_wins(spark):
    rules = spark.createDataFrame(
        [("example.com",), ("spam.example.com",)], "rule string"
    )
    df = spark.createDataFrame(
        [(1, "x.spam.example.com"), (2, "other.example.com")],
        "doc_id long, host string",
    )
    got = {
        r["doc_id"]: r["matched_rule"]
        for r in blocklist_annotate(df, rules).collect()
    }
    assert got[1] == "spam.example.com"  # more specific rule preferred
    assert got[2] == "example.com"


def test_blocklist_filter_drops_annotations(spark):
    out = blocklist_filter(_hosts(spark), _rules(spark))
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 6, 7]
    assert set(out.columns) == {"doc_id", "host"}


def test_blocklist_corpus_side_is_broadcast_join(spark):
    plan = (
        blocklist_annotate(_hosts(spark), _rules(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_balance_sample_exact_quotas(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 6, "en")
        .when(F.col("id") % 10 < 9, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    # counts: en 180, de 90, fr 30; weights 3:2:1 -> m = min(60,45,30) = 30
    out = balance_sample(df, "lang", {"en": 3, "de": 2, "fr": 1}, "doc_id")
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert got == {"en": 90, "de": 60, "fr": 30}


def test_balance_sample_repartition_invariant(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"),
    )
    w = {"l0": 2, "l1": 1, "l2": 1}
    a = balance_sample(df.coalesce(1), "lang", w, "doc_id")
    b = balance_sample(df.repartition(7, "doc_id"), "lang", w, "doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_balance_sample_unweighted_groups_dropped_and_starved_min(spark):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 40, "en").otherwise("xx").alias("lang"),
    )
    out = balance_sample(df, "lang", {"en": 1}, "doc_id")
    assert out.filter(F.col("lang") == "xx").count() == 0
    assert out.count() == 40
    # a weighted group with < w rows floors the water level to 0 rows total
    empty = balance_sample(df, "lang", {"en": 1, "missing": 1}, "doc_id")
    assert empty.count() == 0


def test_balance_sample_validates_weights(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    with pytest.raises(ValueError):
        balance_sample(df, "lang", {}, "doc_id")
    with pytest.raises(ValueError):
        balance_sample(df, "lang", {"en": 0}, "doc_id")


def test_cap_per_group_keeps_best_quality(spark):
    from dads_spark.ops import cap_per_group

    df = spark.createDataFrame(
        [(i, "s" + str(i % 2), i * 10) for i in range(20)],
        "doc_id long, source string, q long",
    )
    out = cap_per_group(df, ["source"], "doc_id", 3, "q").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["q"])
    # per source: exactly the 3 highest quality values survive
    assert sorted(by_src["s0"]) == [140, 160, 180]
    assert sorted(by_src["s1"]) == [150, 170, 190]
    with pytest.raises(ValueError):
        cap_per_group(df, ["source"], "doc_id", 0, "q")


def test_seasonal_naive_error_exact(spark):
    from dads_spark.rollup import seasonal_naive_error

    # perfectly 4-periodic series: seasonal SAE (season=4) is exactly 0,
    # naive SAE is the within-cycle step mass
    cycle = [10, 3, 8, 5]
    y = cycle * 12
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(y)], "k string, t long, y long"
    )
    r = seasonal_naive_error(df, ["k"], "t", "y", season=4).first()
    assert r["sae_seasonal"] == 0 and r["n_seasonal"] == len(y) - 4
    want_naive = sum(abs(y[i] - y[i - 1]) for i in range(1, len(y)))
    assert r["sae_naive"] == want_naive and r["n_naive"] == len(y) - 1
