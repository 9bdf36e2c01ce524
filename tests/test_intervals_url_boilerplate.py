"""Hopping windows, interval merge, URL canonicalization, boilerplate
removal — each vs a small exact oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from dads_spark.ops import (
    boilerplate_lines,
    canonicalize_urls,
    parse_urls,
    remove_boilerplate,
)
from dads_spark.rollup import hopping_rollup, merge_intervals


def test_hopping_rollup_vs_manual(spark):
    # events every 10 min for 3 hours; 1h windows sliding 15min
    ts = pd.date_range("2024-01-01 00:00", periods=18, freq="10min")
    pdf = pd.DataFrame(
        {"k": ["a"] * 18, "ts": ts, "v": np.arange(18, dtype=float)}
    )
    df = spark.createDataFrame(pdf)
    got = (
        hopping_rollup(df, ["k"], "ts", "v", "1 hour", "15 minutes")
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # manual: every 15-min-aligned window [s, s+1h) that intersects data
    rows = []
    start = pd.Timestamp("2024-01-01 00:00") - pd.Timedelta("45min")
    for i in range(18 + 4):
        s = start + i * pd.Timedelta("15min")
        sel = pdf[(pdf.ts >= s) & (pdf.ts < s + pd.Timedelta("1h"))]
        if len(sel):
            rows.append(
                ("a", s, len(sel), sel.v.sum(), sel.v.min(), sel.v.max())
            )
    want = pd.DataFrame(
        rows,
        columns=["k", "window_start", "n", "value_sum", "value_min", "value_max"],
    ).drop_duplicates("window_start").reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["n", "value_sum", "value_min", "value_max"]:
        assert list(got[c]) == list(want[c]), c
    assert list(got["window_start"]) == list(want["window_start"])


def test_merge_intervals(spark):
    rows = [
        # key u1: [0,10] [5,12] [12,20] merge into one island (touching);
        # [25,30] separate
        ("u1", 0, 10),
        ("u1", 5, 12),
        ("u1", 12, 20),
        ("u1", 25, 30),
        # u2: nested interval swallowed by a long one
        ("u2", 0, 100),
        ("u2", 10, 20),
        ("u2", 150, 160),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = (
        merge_intervals(df, ["k"], "s", "e")
        .toPandas()
        .sort_values(["k", "island_start"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            ("u1", 0, 20, 3),
            ("u1", 25, 30, 1),
            ("u2", 0, 100, 2),
            ("u2", 150, 160, 1),
        ],
        columns=["k", "island_start", "island_end", "n_intervals"],
    )
    assert got.equals(want)


def test_parse_and_canonicalize_urls(spark):
    urls = [
        (0, "https://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1"),
        (1, "http://sub.shop.co.uk/path/"),
        (2, "https://example.com/a/b?a=1&b=2"),
        (3, "https://example.com"),
        (4, "not a url"),
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = canonicalize_urls(df).toPandas().set_index("id")
    assert got.loc[0, "canonical_url"] == "https://example.com/a/b?a=1&b=2"
    # tracking stripped + params sorted => 0 and 2 canonicalize equal
    assert got.loc[0, "canonical_url"] == got.loc[2, "canonical_url"]
    assert got.loc[1, "site"] == "shop.co.uk"  # two-level suffix kept
    assert got.loc[1, "canonical_url"] == "http://sub.shop.co.uk/path"
    assert got.loc[0, "site"] == "example.com"
    assert got.loc[3, "canonical_url"] == "https://example.com/"
    assert len(got) == 5  # malformed row kept

    parsed = parse_urls(df).toPandas().set_index("id")
    assert parsed.loc[0, "host"] == "www.example.com:443"
    assert parsed.loc[0, "query"] == "utm_source=x&b=2&a=1"
    # non-default port survives canonicalization
    df2 = spark.createDataFrame(
        [(0, "https://example.com:8443/x")], "id long, url string"
    )
    got2 = canonicalize_urls(df2).toPandas()
    assert got2.loc[0, "canonical_url"] == "https://example.com:8443/x"


def test_boilerplate_removal(spark):
    footer = "copyright example corp"
    nav = "home | about | contact"
    docs = [
        (0, "s1", f"{nav}\nunique zero\n{footer}"),
        (1, "s1", f"{nav}\nunique one\n{footer}"),
        (2, "s1", f"{nav}\nunique two\n{footer}"),
        (3, "s1", "totally organic text"),
        # other site shares the footer string but only once there
        (4, "s2", f"other site text\n{footer}"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, site string, text string")

    bp = boilerplate_lines(df, "doc_id", "text", "site", min_docs=3).toPandas()
    assert set(zip(bp["site"], bp["line"])) == {("s1", nav), ("s1", footer)}
    assert set(bp["n_docs"]) == {3}

    clean = (
        remove_boilerplate(df, "doc_id", "text", "site", min_docs=3)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert clean.loc[0, "text"] == "unique zero"
    assert clean.loc[3, "text"] == "totally organic text"
    assert clean.loc[4, "text"] == f"other site text\n{footer}"  # kept on s2
    assert list(clean.index) == [0, 1, 2, 3, 4]  # no rows lost


def test_remove_boilerplate_all_lines_removed(spark):
    docs = [(i, "s", "same line") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, site string, text string")
    clean = remove_boilerplate(df, "doc_id", "text", "site", min_docs=2)
    out = clean.toPandas()
    assert len(out) == 4 and (out["text"] == "").all()
