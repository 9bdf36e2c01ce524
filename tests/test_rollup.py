"""Rollup tiers, gap-fill, pages-series derivation vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from dads_spark.fixtures.pages import pages_pandas, pages_table
from dads_spark.rollup import (
    cascade,
    domain_hourly_series,
    gap_fill_linear,
    rollup_from_raw,
    salted_rollup,
    text_identity_fingerprint,
)


@pytest.fixture(scope="module")
def pages(spark):
    return pages_table(spark, 5000).cache()


def test_hour_tier_matches_pandas_oracle(spark, pages):
    got = (
        domain_hourly_series(pages)
        .orderBy("domain", "bucket_ts")
        .toPandas()
    )
    pdf = pages_pandas(5000)
    pdf["domain"] = pdf["url"].str.extract(r"https://([^/]+)/")[0]
    pdf["bucket_ts"] = pdf["warc_ts"].dt.floor("h")
    want = (
        pdf.groupby(["domain", "bucket_ts"])
        .agg(
            doc_count=("url", "size"),
            text_bytes=("text", lambda s: sum(len(t.encode()) for t in s)),
            lang_share=("lang", lambda s: (s == "en").mean()),
        )
        .reset_index()
        .sort_values(["domain", "bucket_ts"])
    )
    assert len(got) == len(want)
    assert (got["doc_count"].to_numpy() == want["doc_count"].to_numpy()).all()
    assert (got["text_bytes"].to_numpy() == want["text_bytes"].to_numpy()).all()
    np.testing.assert_allclose(
        got["lang_share"].to_numpy(), want["lang_share"].to_numpy(), atol=1e-12
    )


def test_cascade_day_week_consistency(spark, pages):
    hour = rollup_from_raw(
        pages.withColumn("tb", F.octet_length("text")), ["lang"], "warc_ts", "tb", "hour"
    ).cache()
    day = cascade(hour, ["lang"], "day")
    week = cascade(day, ["lang"], "week")
    direct_day = rollup_from_raw(
        pages.withColumn("tb", F.octet_length("text")), ["lang"], "warc_ts", "tb", "day"
    )
    a = day.orderBy("lang", "bucket_ts").toPandas()
    b = direct_day.orderBy("lang", "bucket_ts").toPandas()
    assert (a["doc_count"].to_numpy() == b["doc_count"].to_numpy()).all()
    np.testing.assert_allclose(a["value_sum"].to_numpy(), b["value_sum"].to_numpy(), rtol=1e-12)
    assert (a["value_min"].to_numpy() == b["value_min"].to_numpy()).all()
    assert (a["value_max"].to_numpy() == b["value_max"].to_numpy()).all()
    # totals conserved up the cascade
    assert (
        week.agg(F.sum("doc_count")).collect()[0][0]
        == hour.agg(F.sum("doc_count")).collect()[0][0]
    )


def test_salted_rollup_equals_plain(spark, pages):
    plain = rollup_from_raw(pages, ["lang"], "warc_ts", None, "hour")
    salted = salted_rollup(pages, ["lang"], "warc_ts", None, "hour", salt_buckets=8)
    a = plain.orderBy("lang", "bucket_ts").toPandas()
    b = salted.orderBy("lang", "bucket_ts").toPandas()
    assert (a["doc_count"].to_numpy() == b["doc_count"].to_numpy()).all()
    assert len(a) == len(b)


def test_gap_fill_linear_matches_np_interp(spark):
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 04:00", "2024-01-01 05:00"]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 4, "bucket_ts": ts, "v": [1.0, 2.0, 8.0, 10.0]})
    )
    out = (
        gap_fill_linear(df, ["k"], "bucket_ts", ["v"], 3600)
        .orderBy("bucket_ts")
        .toPandas()
    )
    assert len(out) == 6  # dense hourly 00..05
    np.testing.assert_allclose(out["v"].to_numpy(), [1, 2, 4, 6, 8, 10])
    assert out["gap_filled"].tolist() == [False, False, True, True, False, False]


def test_gap_fill_planted_silent_days(spark, pages):
    hourly = domain_hourly_series(pages)
    one = hourly.filter(F.col("domain") == "d00.example.org")
    filled = gap_fill_linear(one, ["domain"], "bucket_ts", ["doc_count"], 3600).toPandas()
    n_filled = int(filled["gap_filled"].sum())
    assert n_filled > 0  # fixture plants silent days
    dense = filled.sort_values("bucket_ts")["bucket_ts"].astype("int64").to_numpy() // 10**9
    assert (np.diff(dense) == 3600).all()


def test_text_byte_identity_invariant(spark, pages):
    before = text_identity_fingerprint(pages).withColumnRenamed("text_sha256", "sha_before")
    # run text through the rollup pipeline surface (no text mutation path
    # exists by construction); re-derive and compare
    after = text_identity_fingerprint(
        pages.select("url", "warc_ts", "html", "text", "lang")
    ).withColumnRenamed("text_sha256", "sha_after")
    diff = before.join(after, "url").filter(F.col("sha_before") != F.col("sha_after"))
    assert before.count() == 5000
    assert diff.count() == 0


def test_with_domain_url_shapes(spark):
    """Host extraction must agree with parse_url HOST semantics on every
    url shape — including no-path urls carrying a query/fragment (ADVICE
    r1: 'https://ex.com?q=1' must not leak '?q=1' into the domain key)."""
    from dads_spark.rollup import with_domain

    urls = [
        ("https://ex.com/path/page", "ex.com"),
        ("https://ex.com", "ex.com"),
        ("https://ex.com?q=1", "ex.com"),
        ("https://ex.com#frag", "ex.com"),
        ("https://ex.com:8080/x", "ex.com"),
        ("https://user@ex.com/x", "ex.com"),
        ("https://user@ex.com:8080?q=1#f", "ex.com"),
        ("http://sub.ex.co.uk/a?b#c", "sub.ex.co.uk"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = {r["url"]: r["domain"] for r in with_domain(df).collect()}
    for u, want in urls:
        assert got[u] == want, f"{u} -> {got[u]}, want {want}"
