"""k-anonymity audit, Unicode-script mix, counter repair."""

from __future__ import annotations

from pyspark.sql import functions as F

from dads_spark.ops import k_anonymity_audit, script_mix
from dads_spark.rollup import counter_repair


def test_k_anonymity_histogram(spark):
    rows = [("a", 1)] * 7 + [("a", 2)] * 2 + [("b", 1)] * 2 + [("c", 9)]
    df = spark.createDataFrame(rows, "g string, q long")
    out = {r.class_size: r for r in k_anonymity_audit(df, ["g", "q"], k=5).collect()}
    assert out[7].n_classes == 1 and not out[7].violates
    assert out[2].n_classes == 2 and out[2].violates and out[2].n_rows == 4
    assert out[1].violates
    total = sum(r.n_rows for r in out.values())
    assert total == 12  # every row accounted for


def test_script_mix_detects_scripts(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world 123"),
            (2, "数据处理"),
            (3, "hello мир"),
            (4, "٢٠٢٤"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in script_mix(df).collect()}
    assert out[1].dominant == "latin" and out[1].n_digit == 3
    assert not out[1].mixed
    assert out[2].dominant == "han" and out[2].n_han == 4
    assert out[3].mixed and out[3].n_cyrillic == 3
    assert out[4].n_arabic == 4  # Arabic-Indic digits are script=Arabic
    assert out[5].dominant == "none" and not out[5].mixed


def test_script_mix_tie_order(spark):
    df = spark.createDataFrame([(1, "ab 数据")], "doc_id long, text string")
    r = script_mix(df).collect()[0]
    assert r.n_latin == 2 and r.n_han == 2
    assert r.dominant == "latin"  # fixed tie priority


def test_counter_repair_rebuilds_monotone(spark):
    rows = [("s", 1, 10), ("s", 2, 25), ("s", 3, 5), ("s", 4, 9)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = {r.t: r for r in counter_repair(df, ["k"], "t", "v").collect()}
    # deltas: seed 10, +15, reset (+5 post-reset level... max(delta,0)=0
    # then raw 5 contributes 0? no: reset contributes max(5-25,0)=0,
    # then +4) -> corrected: 10, 25, 25, 29
    assert [out[t].corrected for t in (1, 2, 3, 4)] == [10, 25, 25, 29]
    vals = [out[t].corrected for t in sorted(out)]
    assert vals == sorted(vals)  # monotone


def test_counter_repair_flat_counter_unchanged(spark):
    rows = [("s", i, 100 + 3 * i) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = counter_repair(df, ["k"], "t", "v").collect()
    assert all(r.corrected == r.raw for r in out)  # no resets: identity
