"""Label inverted index: postings construction + selector semantics."""
import pyspark.sql.functions as F


def _catalog(spark):
    rows = [
        ("s1", "api", "eu", "200"),
        ("s2", "api", "us", "200"),
        ("s3", "web", "eu", "500"),
        ("s4", "api", "eu", "500"),
        ("s5", "api", "eu", None),  # NULL label -> no posting for status
    ]
    return spark.createDataFrame(
        rows, "sid string, job string, region string, status string"
    )


def test_label_index_postings(spark):
    from dads_spark.rollup import build_label_index

    idx = build_label_index(_catalog(spark), "sid", ["job", "region", "status"])
    rows = {tuple(r) for r in idx.collect()}
    assert ("job", "api", "s1") in rows
    assert ("status", "500", "s3") in rows
    # NULL labels drop out; 5 series x 3 labels - 1 null = 14 postings
    assert len(rows) == 14


def test_series_by_labels_eq_and_neq(spark):
    from dads_spark.rollup import build_label_index, series_by_labels

    idx = build_label_index(_catalog(spark), "sid", ["job", "region", "status"])
    got = lambda eq, neq=None: {  # noqa: E731
        r["series_id"] for r in series_by_labels(idx, eq, neq).collect()
    }
    assert got({"job": "api", "region": "eu"}) == {"s1", "s4", "s5"}
    assert got({"job": "api"}, {"status": "500"}) == {"s1", "s2", "s5"}
    # value matching is per-name: region='200' matches nothing even though
    # '200' exists under another label name
    assert got({"region": "200"}) == set()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        series_by_labels(idx, {})


def test_series_by_labels_int_typed_labels(spark):
    from dads_spark.rollup import build_label_index, series_by_labels

    df = spark.createDataFrame(
        [("a", 3), ("b", 30), ("c", 3)], "sid string, shard int"
    )
    idx = build_label_index(df, "sid", ["shard"])
    got = {r["series_id"] for r in series_by_labels(idx, {"shard": "3"}).collect()}
    assert got == {"a", "c"}  # stringified exactly, no prefix matching
