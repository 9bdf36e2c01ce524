"""Swing-filter PLA (bounded-error lossy compression) + WET conversion
records: kernel-vs-Fraction-oracle parity, error-bound audit, offset
contiguity, and record/byte-length correctness."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from dads_spark.compress import pla_max_error, pla_segments_grouped, swing_segments
from dads_spark.oracles import pla_swing_oracle
from dads_spark.io.warc import wet_records


# ---------------------------------------------------------------- PLA kernel


def test_pla_straight_line_one_segment():
    t = np.arange(0, 100, dtype=np.int64) * 3600
    v = 5 * np.arange(0, 100, dtype=np.int64) + 7
    segs = swing_segments(t, v, eps=0)
    assert len(segs) == 1
    assert segs[0] == (0, 7, 99 * 3600, 5 * 99 + 7, 100)


def test_pla_step_function_breaks():
    t = np.arange(10, dtype=np.int64)
    v = np.array([0, 0, 0, 0, 0, 100, 100, 100, 100, 100], dtype=np.int64)
    segs = swing_segments(t, v, eps=1)
    assert len(segs) >= 2
    # segments chain: each start is the previous end
    for (a, b) in zip(segs, segs[1:]):
        assert a[2] == b[0] and a[3] == b[1]
    # coverage: n_points sums to n + (len-1) shared knots
    assert sum(s[4] for s in segs) == 10 + (len(segs) - 1)


def test_pla_eps_zero_keeps_exact_knots():
    # slope break at idx 2: the anchored cone admits (2,2)->(3,5) but the
    # NEXT point (4,6) needs slope 2 from the anchor, not 3 -> a 2-point
    # bridge segment, then the final slope-1 run
    t = np.arange(6, dtype=np.int64)
    v = np.array([0, 1, 2, 5, 6, 7], dtype=np.int64)
    segs = swing_segments(t, v, eps=0)
    assert segs == [(0, 0, 2, 2, 3), (2, 2, 3, 5, 2), (3, 5, 5, 7, 3)]


def test_pla_single_and_empty():
    assert swing_segments(np.array([5]), np.array([9]), 1) == [(5, 9, 5, 9, 1)]
    assert swing_segments(np.array([], dtype=np.int64), np.array([], dtype=np.int64), 1) == []


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=80),
    st.integers(min_value=0, max_value=20),
)
def test_pla_kernel_matches_fraction_oracle(vals, eps):
    t = np.arange(len(vals), dtype=np.int64) * 60
    v = np.asarray(vals, dtype=np.int64)
    assert swing_segments(t, v, eps) == pla_swing_oracle(t, v, eps)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=-500, max_value=500), min_size=2, max_size=60),
    st.integers(min_value=1, max_value=10),
)
def test_pla_knot_read_error_bounded(vals, eps):
    # knot-to-knot interpolation error <= 2*eps (see pla_max_error doc)
    t = np.arange(len(vals), dtype=np.int64)
    v = np.asarray(vals, dtype=np.int64)
    segs = swing_segments(t, v, eps)
    assert pla_max_error(t, v, segs) <= 2 * eps + 1e-9


def test_pla_compresses_noisy_linear():
    rng = np.random.default_rng(3)
    t = np.arange(2000, dtype=np.int64) * 3600
    v = (3 * np.arange(2000) + rng.integers(-2, 3, 2000)).astype(np.int64)
    segs = swing_segments(t, v, eps=4)
    assert len(segs) < 200  # >10x fewer knots than points


def test_pla_grouped_matches_kernel(spark):
    rng = np.random.default_rng(11)
    rows = []
    for k in ("a", "b"):
        v = rng.integers(0, 50, 300)
        rows += [(k, int(i) * 60, int(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, "k string, t long, y long")
    out = pla_segments_grouped(df.repartition(16), ["k"], "t", "y", eps=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["k"], []).append(
            (r["seg_idx"], r["t_start"], r["v_start"], r["t_end"], r["v_end"], r["n_points"])
        )
    for k in ("a", "b"):
        vals = [x for kk, t, x in rows if kk == k]
        want = swing_segments(
            np.arange(300, dtype=np.int64) * 60, np.asarray(vals, dtype=np.int64), 3
        )
        assert sorted(got[k]) == [(i, *s) for i, s in enumerate(want)]


# ---------------------------------------------------------------- WET export


def _mk_pages(spark):
    rows = [
        ("s1", "https://a.com/1", 1700000000, "hello world"),
        ("s1", "https://a.com/2", 1700003600, "café"),  # non-ASCII
        ("s2", "https://b.com/1", 1700007200, ""),
    ]
    df = spark.createDataFrame(rows, "shard string, url string, es long, text string")
    from pyspark.sql import functions as F

    return df.select(
        "shard", "url", F.timestamp_seconds("es").alias("warc_ts"), "text"
    )


def test_wet_record_shape_and_byte_lengths(spark):
    out = {r["url"]: r for r in wet_records(_mk_pages(spark), shard_col="shard").collect()}
    r = out["https://a.com/2"]
    rec = r["record"]
    assert rec.startswith("WARC/1.0\r\nWARC-Type: conversion\r\n")
    assert "WARC-Target-URI: https://a.com/2\r\n" in rec
    assert "WARC-Date: 2023-11-14T23:13:20Z\r\n" in rec
    # Content-Length counts BYTES: café = 5 bytes, 4 chars
    assert "Content-Length: 5\r\n" in rec
    assert r["record_len"] == len(rec.encode("utf-8"))
    assert rec.endswith("café\r\n\r\n")


def test_wet_offsets_contiguous_per_shard(spark):
    rows = sorted(
        wet_records(_mk_pages(spark), shard_col="shard").collect(),
        key=lambda r: (r["shard"], r["url"]),
    )
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        off = 0
        for r in rs:
            assert r["offset"] == off
            off += r["record_len"]


def test_wet_empty_text_still_valid_record(spark):
    out = {r["url"]: r for r in wet_records(_mk_pages(spark), shard_col="shard").collect()}
    rec = out["https://b.com/1"]["record"]
    assert "Content-Length: 0\r\n" in rec
    assert rec.endswith("\r\n\r\n\r\n\r\n")  # empty body between header CRLF and trailer
