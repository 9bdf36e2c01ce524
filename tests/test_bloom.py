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
