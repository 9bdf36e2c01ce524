"""Deterministic sampling / split / top-terms semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from dads_spark.ops import (
    deterministic_sample,
    hash_split,
    stratified_sample,
    top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"k{i % 3}", f"text {i}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_sample_stable_under_repartition(spark, docs):
    a = deterministic_sample(docs, ["lang"], "doc_id", 7).toPandas()
    b = deterministic_sample(docs.repartition(13), ["lang"], "doc_id", 7).toPandas()
    key = lambda p: sorted(map(tuple, p[["lang", "doc_id"]].to_numpy()))
    assert key(a) == key(b)
    assert a.groupby("lang").size().tolist() == [7, 7, 7]


def test_hash_split_fraction_and_stability(spark, docs):
    out = hash_split(docs, "doc_id", test_nibbles=4).toPandas()
    frac = (out["split"] == "test").mean()
    assert 0.15 <= frac <= 0.35  # 25% expected, 400 ids
    again = hash_split(docs.repartition(5), "doc_id", test_nibbles=4).toPandas()
    assert (
        out.sort_values("doc_id")["split"].tolist()
        == again.sort_values("doc_id")["split"].tolist()
    )


def test_hash_split_rejects_out_of_domain_nibbles(spark, docs):
    # 16 would make the hex threshold two digits ('10' + 31 zeros) and the
    # lexicographic compare would classify almost everything as test/train
    # wrongly — the domain is enforced instead
    for bad in (0, 16, -1):
        with pytest.raises(ValueError, match="test_nibbles"):
            hash_split(docs, "doc_id", test_nibbles=bad)


def test_stratified_sample_exact_sizes_and_stability(spark, docs):
    # strata are 134/133/133 docs; ceil(n*0.25) -> 34/34/34 exactly
    out = stratified_sample(docs, ["lang"], "doc_id", 0.25).toPandas()
    import math

    sizes = out.groupby("lang").size().to_dict()
    truth = {"k0": 134, "k1": 133, "k2": 133}
    assert sizes == {k: math.ceil(v * 0.25) for k, v in truth.items()}
    again = stratified_sample(
        docs.repartition(11), ["lang"], "doc_id", 0.25
    ).toPandas()
    key = lambda p: sorted(map(tuple, p[["lang", "doc_id"]].to_numpy()))
    assert key(out) == key(again)


def test_stratified_sample_fraction_one_is_identity(spark, docs):
    out = stratified_sample(docs, ["lang"], "doc_id", 1.0)
    assert out.count() == 400
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, ["lang"], "doc_id", 0.0)


def test_top_terms_prefers_rare_term_at_equal_tf(spark):
    # every doc contains 'common common'; doc 0 also has 'rare rare':
    # for doc 0 both terms have tf 2 but 'rare' has doc_freq 1 -> rank 1
    rows = [
        (0, "common common rare rare"),
        (1, "common common other"),
        (2, "common common other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = top_terms(df, "doc_id", "text", 2).toPandas()
    d0 = out[out.doc_id == 0].sort_values("rank")
    assert d0.term.tolist() == ["rare", "common"]
    assert d0.tf.tolist() == [2, 2]
    assert d0.doc_freq.tolist() == [1, 3]


def test_dsir_importance_directionality(spark):
    """Docs made of target-heavy tokens must outweigh raw-typical docs;
    weights are exact integers, invariant under repartition."""
    from pyspark.sql import functions as F

    from dads_spark.ops import dsir_importance

    rows = (
        # target slice speaks "alpha beta", raw background speaks "noise"
        [(i, "alpha beta alpha beta", 1) for i in range(20)]
        + [(100 + i, "noise junk noise junk", 0) for i in range(20)]
        # probes: one target-shaped, one background-shaped, one mixed
        + [(500, "alpha beta", 0), (501, "noise junk", 0), (502, "alpha noise", 0)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    out = {
        r["doc_id"]: r
        for r in dsir_importance(
            docs, F.col("tgt") == 1, n_buckets=64, top_n=21
        ).collect()
    }
    assert out[500]["lw_q6"] > 0 > out[501]["lw_q6"]
    assert out[501]["lw_q6"] < out[502]["lw_q6"] < out[500]["lw_q6"]
    # target-shaped probe is selected alongside the 20 target docs
    assert out[500]["selected"] and not out[501]["selected"]
    out2 = {
        r["doc_id"]: r
        for r in dsir_importance(
            docs.repartition(9), F.col("tgt") == 1, n_buckets=64, top_n=21
        ).collect()
    }
    assert all(out[k]["lw_q6"] == out2[k]["lw_q6"] for k in out)
