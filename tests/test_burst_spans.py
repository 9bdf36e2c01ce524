"""Burst-interval detection, duplicate-substring spans, tier consistency."""

from __future__ import annotations

import numpy as np
import pytest

from dads_spark.ops import duplicate_spans
from dads_spark.rollup import burst_intervals


def _series_df(spark, values, key="s", t0=0):
    rows = [(key, int(t0 + i * 3600), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t long, v double")


def test_burst_detects_planted_run(spark):
    # flat 10s, then a 3-bucket burst of 100 at indices 30..32
    v = [10.0] * 60
    v[30] = v[31] = v[32] = 100.0
    out = burst_intervals(
        _series_df(spark, v), ["k"], "t", "v", factor=1.5, baseline_buckets=24
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["start_sec"] == 30 * 3600 and r["end_sec"] == 32 * 3600
    assert r["n_buckets"] == 3 and r["peak_v"] == 100.0
    assert r["sum_v"] == 300.0


def test_burst_requires_full_baseline(spark):
    # spike at index 5: trailing window not full -> no alarm
    v = [10.0] * 40
    v[5] = 1000.0
    out = burst_intervals(
        _series_df(spark, v), ["k"], "t", "v", factor=1.5, baseline_buckets=24
    ).collect()
    # the spike itself can't alarm; buckets after it see an inflated
    # baseline, also no alarm
    assert out == []


def test_burst_separate_islands(spark):
    v = [10.0] * 80
    v[30] = 50.0
    v[40] = 60.0  # two separated single-bucket bursts
    out = sorted(
        burst_intervals(
            _series_df(spark, v), ["k"], "t", "v", factor=1.5,
            baseline_buckets=24,
        ).collect(),
        key=lambda r: r["start_sec"],
    )
    assert [(r["start_sec"] // 3600, r["n_buckets"]) for r in out] == [
        (30, 1),
        (40, 1),
    ]


def test_burst_partition_invariance(spark):
    rng = np.random.default_rng(11)
    v = list(rng.integers(5, 15, 200).astype(float))
    for i in (60, 61, 120):
        v[i] = 200.0
    df = _series_df(spark, v)
    a = sorted(map(tuple, burst_intervals(df, ["k"], "t", "v").collect()))
    b = sorted(
        map(
            tuple,
            burst_intervals(df.repartition(13), ["k"], "t", "v").collect(),
        )
    )
    assert a == b and len(a) >= 2


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_duplicate_spans_finds_shared_paragraph(spark):
    shared = " ".join(f"boiler{i}" for i in range(20))  # 20-token paragraph
    docs = _docs_df(
        spark,
        [
            "alpha beta " + shared + " gamma delta epsilon zeta eta theta",
            "one two three four five six seven " + shared + " tail",
            " ".join(f"unique{i}" for i in range(40)),
        ],
    )
    out = duplicate_spans(docs, "text", "doc_id", n=8, min_span_tokens=12)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {0, 1}
    # doc 0: shared starts at token 2, spans 20 tokens
    assert rows[0]["span_start"] == 2
    assert rows[0]["span_end"] == 22 and rows[0]["span_tokens"] == 20
    # doc 1: shared starts at token 7
    assert rows[1]["span_start"] == 7 and rows[1]["span_tokens"] == 20


def test_duplicate_spans_ignores_short_matches(spark):
    # an isolated 8-gram match (span_tokens = 8 < 12) is dropped
    phrase = "p1 p2 p3 p4 p5 p6 p7 p8"
    docs = _docs_df(
        spark,
        [
            phrase + " " + " ".join(f"a{i}" for i in range(20)),
            phrase + " " + " ".join(f"b{i}" for i in range(20)),
        ],
    )
    out = duplicate_spans(docs, "text", "doc_id", n=8, min_span_tokens=12)
    assert out.count() == 0
    # but with the floor at 8 the match is reported
    out2 = duplicate_spans(docs, "text", "doc_id", n=8, min_span_tokens=8)
    assert sorted(r["span_tokens"] for r in out2.collect()) == [8, 8]


def test_duplicate_spans_whole_doc_duplicate(spark):
    text = " ".join(f"w{i}" for i in range(30))
    docs = _docs_df(spark, [text, text])
    out = duplicate_spans(docs, "text", "doc_id", n=8).collect()
    assert len(out) == 2
    for r in out:
        assert (r["span_start"], r["span_end"], r["span_tokens"]) == (0, 30, 30)


def test_tier_consistency_all_green(spark):
    import __spark_entry__ as em

    rows = em.q_tier_consistency(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r["consistent"] for r in rows)
    assert all(r["n_cascade"] == r["n_direct"] for r in rows)
