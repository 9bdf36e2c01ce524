"""CLF access-log parsing (ops/weblog.py) and schema evolution on read
(rollup/evolution.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dads_spark.ops import parse_clf
from dads_spark.rollup import align_to_schema, read_evolved

_LINE = (
    '203.0.113.9 - alice [05/Nov/2024:13:55:36 -0530] '
    '"GET /p/7?q=1 HTTP/1.1" 200 2326 "https://ref.example/3" '
    '"Mozilla/5.0 (X11; Linux x86_64) Gecko"'
)


def _parse(spark, line):
    df = spark.createDataFrame([(line,)], "line string")
    return parse_clf(df, "line").collect()[0]


def test_clf_full_line(spark):
    r = _parse(spark, _LINE)
    assert r["parsed"] == 1
    assert r["ip"] == "203.0.113.9"
    assert r["iso_ts"] == "2024-11-05 13:55:36"
    assert r["tz"] == "-0530"
    assert (r["method"], r["path"]) == ("GET", "/p/7?q=1")
    assert (r["status"], r["status_class"], r["n_bytes"]) == (200, "2xx", 2326)
    assert r["referer"] == "https://ref.example/3"
    assert r["is_bot"] == 0


def test_clf_dash_bytes_and_bot_ua(spark):
    line = (
        '10.0.0.1 - - [01/Jan/2024:00:00:00 +0000] "HEAD / HTTP/1.0" '
        '204 - "-" "Googlebot/2.1 (+http://www.google.com/bot.html)"'
    )
    r = _parse(spark, line)
    assert (r["n_bytes"], r["status_class"], r["is_bot"]) == (0, "2xx", 1)
    assert r["referer"] == "-"


@pytest.mark.parametrize(
    "ua,flag",
    [("curl/8.4.0", 1), ("Wget/1.21", 1), ("SpiderX crawler", 1),
     ("Opera/9.80", 0)],
)
def test_clf_bot_markers(spark, ua, flag):
    line = (
        f'10.0.0.1 - - [01/Jan/2024:00:00:00 +0000] "GET / HTTP/1.1" '
        f'200 1 "-" "{ua}"'
    )
    assert _parse(spark, line)["is_bot"] == flag


def test_clf_malformed_survives_with_nulls(spark):
    r = _parse(spark, "not a log line at all")
    assert r["parsed"] == 0
    assert r["ip"] is None and r["status"] is None and r["is_bot"] is None


def test_align_to_schema_rename_widen_fill(spark):
    old = spark.createDataFrame(
        [(1, 7, "a")], "doc_id long, cnt int, src string"
    )
    target = [
        ("doc_id", "long"), ("doc_count", "long"),
        ("lang", "string"), ("src", "string"),
    ]
    r = align_to_schema(old, target, renames={"cnt": "doc_count"}).collect()[0]
    assert (r["doc_id"], r["doc_count"], r["lang"], r["src"]) == (1, 7, None, "a")
    assert dict(align_to_schema(old, target, renames={"cnt": "doc_count"},
                                defaults={"lang": "und"}).collect()[0]
                .asDict())["lang"] == "und"


def test_read_evolved_unions_generations(spark):
    v1 = spark.createDataFrame([(1, 7, "a")], "doc_id long, cnt int, src string")
    v2 = spark.createDataFrame([(2, 9, "en")], "doc_id long, doc_count long, lang string")
    target = [
        ("doc_id", "long"), ("doc_count", "long"),
        ("lang", "string"), ("src", "string"),
    ]
    out = {r["doc_id"]: r for r in read_evolved(
        [(v1, {"cnt": "doc_count"}), (v2, None)], target
    ).collect()}
    assert out[1]["doc_count"] == 7 and out[1]["lang"] is None
    assert out[2]["doc_count"] == 9 and out[2]["src"] is None
    assert [f.name for f in read_evolved(
        [(v1, {"cnt": "doc_count"})], target).schema.fields
    ] == ["doc_id", "doc_count", "lang", "src"]


def test_read_evolved_requires_input(spark):
    with pytest.raises(ValueError):
        read_evolved([], [("a", "long")])
