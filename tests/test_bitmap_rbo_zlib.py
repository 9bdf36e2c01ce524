"""Bitmap set algebra, rank-biased overlap, zlib compression-ratio
quality signal."""

from __future__ import annotations

import zlib

from pyspark.sql import Window as W, functions as F

from dads_spark.ops import (
    bitmap_combine,
    bitmap_decode,
    build_bitmap,
    rank_biased_overlap,
    zlib_ratio,
)


def _bm(spark, ids):
    df = spark.createDataFrame([("k", i) for i in ids], "k string, id long")
    return build_bitmap(df, ["k"], "id")


def test_bitmap_and_or_roundtrip(spark):
    a = {0, 1, 63, 64, 130, 1000}
    b = {1, 63, 65, 130, 999}
    ba, bb = _bm(spark, a), _bm(spark, b)
    got_and = {r.id for r in bitmap_decode(bitmap_combine(ba, bb, "and")).collect()}
    got_or = {r.id for r in bitmap_decode(bitmap_combine(ba, bb, "or")).collect()}
    assert got_and == a & b  # bit 63 (sign bit) must survive
    assert got_or == a | b


def test_bitmap_cardinalities(spark):
    ba = _bm(spark, range(64))  # one full block
    row = ba.collect()[0]
    assert row.block == 0 and row.n_set == 64 and row.bits == -1  # all bits


def test_bitmap_dedups_input(spark):
    df = spark.createDataFrame(
        [("k", 5)] * 3 + [("k", 6)], "k string, id long"
    )
    row = build_bitmap(df, ["k"], "id").collect()[0]
    assert row.n_set == 2


def _ranked(spark, order):
    # order: list of doc ids, rank = position+1, single query
    rows = [("q", d, i + 1) for i, d in enumerate(order)]
    return spark.createDataFrame(rows, "qid string, id long, rank long")


def test_rbo_identical_lists_is_one(spark):
    a = _ranked(spark, [1, 2, 3, 4, 5])
    r = rank_biased_overlap(a, a, "qid", "id", "rank", p=0.9, k=5).collect()[0]
    # truncated RBO@k of identical lists = (1-p) * sum p^(d-1) -> not 1;
    # it equals (1-p)*sum_{d=1..k} p^(d-1) * 1 = 1 - p^k
    assert r.n_common == 5
    assert r.rbo_q6 == round(1e6 * (1 - 0.9**5) + 1e-9)


def test_rbo_disjoint_lists_is_zero(spark):
    a = _ranked(spark, [1, 2, 3])
    b = _ranked(spark, [4, 5, 6])
    assert rank_biased_overlap(a, b, "qid", "id", "rank").collect() == []


def test_rbo_top_weighted(spark):
    # sharing the TOP item scores higher than sharing a bottom item
    base = _ranked(spark, [1, 2, 3, 4, 5])
    top = _ranked(spark, [1, 9, 8, 7, 6])
    bot = _ranked(spark, [9, 8, 7, 6, 5])
    r_top = rank_biased_overlap(base, top, "qid", "id", "rank", k=5).collect()[0]
    r_bot = rank_biased_overlap(base, bot, "qid", "id", "rank", k=5).collect()[0]
    assert r_top.rbo_q6 > r_bot.rbo_q6


def test_zlib_ratio_repetitive_vs_prose(spark):
    rep = "spam " * 200
    prose = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in zlib_ratio(df).collect()}
    assert out[1].ratio_q6 < out[2].ratio_q6  # repetition compresses harder
    assert out[1].n_raw_bytes == 1000
    assert out[1].n_zlib_bytes == len(zlib.compress(rep.encode(), 6))
    assert out[3].ratio_q6 is None  # empty doc


def test_e2e_curation_funnel_monotone(spark):
    import __spark_entry__ as em

    rows = em.queries()["e2e_curation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        # survivors can only shrink stage to stage
        assert r.n_input >= r.n_quality >= r.n_unique >= 0
        # packing accounting: bins cover the tokens
        assert r.n_bins * 512 >= r.total_tokens - 511
        assert r.n_spanning <= r.n_unique
