"""CDC apply (rollup/ingest.py:cdc_apply), Merkle tier fingerprints
(rollup/integrity.py), and token-budget curation (ops/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import token_budget_select
from dads_spark.rollup import cdc_apply, merkle_tiers


def _ops(spark, rows):
    return spark.createDataFrame(
        rows, "entity string, seq long, op string, val long"
    )


def test_cdc_last_op_wins_and_delete_erases(spark):
    ops = _ops(spark, [
        ("a", 1, "I", 10), ("a", 2, "U", 20),          # a lives at 20
        ("b", 1, "I", 1), ("b", 9, "D", 0),            # b erased
        ("c", 5, "D", 0), ("c", 7, "I", 70),           # c resurrected
    ])
    out = {r["entity"]: r for r in cdc_apply(ops, ["entity"], "seq", "op").collect()}
    assert set(out) == {"a", "c"}
    assert out["a"]["val"] == 20 and out["a"]["n_ops"] == 2
    assert out["c"]["val"] == 70 and out["c"]["n_ops"] == 2


def test_cdc_out_of_order_delivery_irrelevant(spark):
    rows = [("x", 3, "U", 30), ("x", 1, "I", 10), ("x", 2, "U", 20)]
    a = cdc_apply(_ops(spark, rows), ["entity"], "seq", "op").collect()
    b = cdc_apply(
        _ops(spark, rows).repartition(8, "val"), ["entity"], "seq", "op"
    ).collect()
    assert a == b and a[0]["val"] == 30


def _series(spark, bump_event=None):
    df = spark.range(500).select(
        F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("key"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 700).alias("ts"),
        F.col("id").alias("event_id"),
        (F.col("id") % 50).alias("user_id"),
    )
    if bump_event is not None:
        df = df.withColumn(
            "user_id",
            F.when(F.col("event_id") == bump_event, F.lit(999)).otherwise(
                F.col("user_id")
            ),
        )
    return df


def test_merkle_equal_tables_equal_roots(spark):
    a = merkle_tiers(_series(spark), "key", "ts", ["event_id", "user_id"])
    b = merkle_tiers(
        _series(spark).repartition(16, "user_id"), "key", "ts",
        ["event_id", "user_id"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_merkle_single_change_localizes(spark):
    a = {(r["level"], r["key"], r["bucket_ts"]): r["h"]
         for r in merkle_tiers(_series(spark), "key", "ts",
                               ["event_id", "user_id"]).collect()}
    b = {(r["level"], r["key"], r["bucket_ts"]): r["h"]
         for r in merkle_tiers(_series(spark, bump_event=123), "key", "ts",
                               ["event_id", "user_id"]).collect()}
    assert a.keys() == b.keys()
    diff = [k for k in a if a[k] != b[k]]
    # exactly one hour, its day, and its key root differ
    assert sorted(lv for lv, _, _ in diff) == ["day", "hour", "root"]
    assert all(k == "t1" for _, k, _ in diff)  # event 123 -> key t1


def test_merkle_duplicate_rows_fingerprinted(spark):
    base = _series(spark)
    dup = base.unionByName(base.filter(F.col("event_id") == 7))
    ra = {r["key"]: r["h"] for r in merkle_tiers(
        base, "key", "ts", ["event_id", "user_id"]
    ).filter("level = 'root'").collect()}
    rb = {r["key"]: r["h"] for r in merkle_tiers(
        dup, "key", "ts", ["event_id", "user_id"]
    ).filter("level = 'root'").collect()}
    assert ra["t1"] != rb["t1"] and ra["t0"] == rb["t0"]


def _docs(spark):
    rows = [
        # (id, lang, tokens, quality)
        (1, "en", 100, 9), (2, "en", 150, 8), (3, "en", 200, 7),
        (4, "en", 500, 6),
        (5, "de", 300, 5), (6, "de", 300, 5),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, tok long, q long"
    )


def test_token_budget_strict_cumsum(spark):
    # en budget 400: quality order 1(100),2(150),3(200 -> cum 450 > 400)
    out = token_budget_select(_docs(spark), "lang", "doc_id", "tok", "q", 400)
    got = sorted(r["doc_id"] for r in out.filter("lang = 'en'").collect())
    assert got == [1, 2]


def test_token_budget_tie_break_deterministic(spark):
    # de: equal quality/tokens; budget admits exactly one — md5 order
    out1 = token_budget_select(_docs(spark), "lang", "doc_id", "tok", "q", 300)
    out2 = token_budget_select(
        _docs(spark).repartition(8), "lang", "doc_id", "tok", "q", 300
    )
    a = sorted(r["doc_id"] for r in out1.filter("lang = 'de'").collect())
    b = sorted(r["doc_id"] for r in out2.filter("lang = 'de'").collect())
    assert a == b and len(a) == 1


def test_token_budget_zero_and_negative(spark):
    assert token_budget_select(
        _docs(spark), "lang", "doc_id", "tok", "q", 0
    ).count() == 0
    with pytest.raises(ValueError):
        token_budget_select(_docs(spark), "lang", "doc_id", "tok", "q", -1)


def test_merkle_changed_classification(spark):
    old = spark.createDataFrame(
        [("a", "t1", "h1"), ("a", "t2", "h2"), ("a", "t3", "h3")],
        "key string, bucket_ts string, h string",
    )
    new = spark.createDataFrame(
        [("a", "t1", "h1"), ("a", "t2", "hX"), ("a", "t4", "h4")],
        "key string, bucket_ts string, h string",
    )
    from dads_spark.rollup import merkle_changed

    out = {(r["bucket_ts"]): r["change"] for r in merkle_changed(
        old, new, ["key", "bucket_ts"]
    ).collect()}
    assert out == {"t2": "changed", "t3": "removed", "t4": "added"}
