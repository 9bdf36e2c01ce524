"""OHLC candlestick downsample (rollup/downsample.py ohlc_bars) and
positional phrase search (ops/textstats.py phrase_search)."""

from __future__ import annotations

import datetime as dt

from dads_spark.ops import phrase_search
from dads_spark.rollup import ohlc_bars


def _ts(h, m, s=0):
    return dt.datetime(2026, 1, 1, h, m, s)


def test_ohlc_basic_and_tie_break(spark):
    rows = [
        # hour 10: open=1.0 (earliest), close=4.0 (latest); high 9, low -2
        (1, _ts(10, 0), "a", 1.0),
        (2, _ts(10, 5), "a", 9.0),
        (3, _ts(10, 7), "a", -2.0),
        (4, _ts(10, 59), "a", 4.0),
        # hour 11, duplicate timestamps: event_id breaks the tie — open is
        # id 5 (value 7.0), close is id 7 (value 3.0)
        (5, _ts(11, 0), "a", 7.0),
        (6, _ts(11, 0), "a", 5.0),
        (7, _ts(11, 0), "a", 3.0),
        # other key
        (8, _ts(10, 30), "b", 2.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (r["event_type"], r["bucket_sec"]): r
        for r in ohlc_bars(ev, ["event_type"], "ts", "value", "event_id").collect()
    }
    h10 = int(_ts(10, 0).replace(tzinfo=dt.timezone.utc).timestamp())
    h11 = h10 + 3600
    a10 = out[("a", h10)]
    assert (a10["open"], a10["high"], a10["low"], a10["close"], a10["n"]) == (
        1.0, 9.0, -2.0, 4.0, 4,
    )
    a11 = out[("a", h11)]
    assert (a11["open"], a11["close"], a11["n"]) == (7.0, 3.0, 3)
    assert out[("b", h10)]["n"] == 1


def test_ohlc_partition_invariant(spark):
    rows = [
        (i, _ts(10 + (i % 3), i % 60), "k", float((i * 7) % 11))
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    a = sorted(
        tuple(r)
        for r in ohlc_bars(ev.repartition(1), ["event_type"], "ts", "value", "event_id").collect()
    )
    b = sorted(
        tuple(r)
        for r in ohlc_bars(ev.repartition(7), ["event_type"], "ts", "value", "event_id").collect()
    )
    assert a == b


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_phrase_search_counts_and_positions(spark):
    texts = [
        "x a b c y a b c",      # two occurrences, first at pos 1
        "a b c",                # one at pos 0
        "a b x c",              # broken phrase: no match
        "c b a",                # reversed: no match
    ]
    out = {r["doc_id"]: r for r in phrase_search(_docs(spark, texts), ["a", "b", "c"]).collect()}
    assert set(out) == {0, 1}
    assert (out[0]["n_matches"], out[0]["first_pos"]) == (2, 1)
    assert (out[1]["n_matches"], out[1]["first_pos"]) == (1, 0)


def test_phrase_search_prefilter_false_positive_rejected(spark):
    # contains("a b") holds (substring inside the token "xa"), but token
    # adjacency must reject it: tokens are ["xa","b"], first token != "a"
    out = phrase_search(_docs(spark, ["xa b c"]), ["a", "b"]).collect()
    assert out == []


def test_phrase_search_overlapping_occurrences(spark):
    # "a a a": phrase (a,a) occurs at pos 0 and 1 — positional postings
    # count BOTH (unlike non-overlapping replace semantics)
    out = phrase_search(_docs(spark, ["a a a"]), ["a", "a"]).collect()
    assert len(out) == 1
    assert out[0]["n_matches"] == 2 and out[0]["first_pos"] == 0
