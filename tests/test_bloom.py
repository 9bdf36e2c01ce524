"""Bloom-filter incremental dedup (ops/bloom.py)."""

from pyspark.sql import functions as F

from dads_spark.ops import bloom_dedup


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), (F.col("id") % 120).cast("string")).alias(
            "text"
        ),
    )


def test_no_false_negatives_and_statuses(spark):
    docs = _docs(spark)
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    out = bloom_dedup(docs, seen, "text", "doc_id", m_bits=256, k=3).collect()
    assert len(out) == 300
    for r in out:
        if r["exact_seen"]:
            # a Bloom filter can never miss a present key
            assert r["bloom_hit"], f"false negative at doc {r['doc_id']}"
            assert r["status"] == "seen"
        elif r["bloom_hit"]:
            assert r["status"] == "false_positive"
        else:
            assert r["status"] == "new"
    # duplicate-content rows (id % 120 repeats, id>=120 odd ones too) make
    # exact_seen content-level, not id-level: every text whose even twin
    # exists is seen
    seen_texts = {r["text"] for r in seen.collect()}
    expect = {r["doc_id"]: (r["text"] in seen_texts) for r in docs.collect()}
    got = {r["doc_id"]: r["exact_seen"] for r in out}
    assert got == expect


def test_tiny_filter_saturates_to_all_hits(spark):
    """m=8 with 150 keys: every bit set, so every probe hits — statuses
    degrade to seen/false_positive but never a false negative."""
    docs = _docs(spark)
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    out = bloom_dedup(docs, seen, "text", "doc_id", m_bits=8, k=3).collect()
    assert all(r["bloom_hit"] for r in out)
    assert {r["status"] for r in out} == {"seen", "false_positive"}


def test_bloom_semijoin_equivalence_and_reduction(spark):
    """The Bloom pre-filter must keep a SUPERSET of the true matches
    (no false negatives) and the follow-up exact join must equal the
    plain join row-for-row."""
    from dads_spark.ops import bloom_semijoin

    big = spark.createDataFrame(
        [(f"k{i % 97}", i) for i in range(2000)], "uk string, v long"
    )
    small = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 97, 13)], "uk string"
    )
    reduced = bloom_semijoin(big, small, "uk")
    plain = {tuple(r) for r in big.join(small, "uk").collect()}
    via_bloom = {tuple(r) for r in reduced.join(small, "uk").collect()}
    assert via_bloom == plain
    # superset of true matches, subset of the input
    n_red = reduced.count()
    assert len(plain) <= n_red <= big.count()
    # with 8 selected keys of 97 the filter must actually reduce
    assert n_red < big.count()


def test_bloom_semijoin_empty_small_side(spark):
    from dads_spark.ops import bloom_semijoin

    big = spark.createDataFrame([("a", 1), ("b", 2)], "uk string, v long")
    small = spark.createDataFrame([], "uk string")
    assert bloom_semijoin(big, small, "uk").count() == 0
