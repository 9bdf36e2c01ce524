"""Trigram posting-index substring search: exactness vs brute scan,
pruning behavior, edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_trigram_search_equals_brute_scan(spark):
    from dads_spark.ops import trigram_postings, trigram_search

    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "QUICK brownies and quick brown sugar"),
        (4, "nothing to see here"),
        (5, "qu ick brown"),  # has the grams split across - no match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    postings = trigram_postings(df)
    got = {
        (r["doc_id"], r["pos"])
        for r in trigram_search(df, postings, "Quick Brown").collect()
    }
    brute = {
        (r["doc_id"], r["pos"])
        for r in df.select(
            "doc_id", F.instr(F.lower("text"), "quick brown").alias("pos")
        )
        .filter(F.col("pos") > 0)
        .collect()
    }
    assert got == brute
    assert {d for d, _ in got} == {1, 3}
    # 1-based positions
    assert dict(got)[1] == 5


def test_trigram_index_prunes_before_verify(spark):
    from dads_spark.ops import trigram_postings, trigram_search

    rows = [(i, f"filler text number {i}") for i in range(50)]
    rows.append((99, "the needle xyzzy lives here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    postings = trigram_postings(df)
    grams = sorted({"xyzzy"[i:i + 3] for i in range(3)})
    cand = (
        postings.filter(F.col("gram").isin(grams))
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") == len(grams))
    )
    assert cand.count() == 1  # the index narrowed 51 docs to 1
    got = trigram_search(df, postings, "xyzzy").collect()
    assert [(r["doc_id"], r["pos"]) for r in got] == [(99, 12)]


def test_trigram_search_short_query_rejected(spark):
    from dads_spark.ops import trigram_postings, trigram_search

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        trigram_search(df, trigram_postings(df), "ab")
    # short docs emit no postings and can't match
    short = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    assert trigram_postings(short).count() == 0
