"""Replicates the driver's correctness gate locally at sf0.001: every
queries() entry runs; every oracle_sql() twin must hash-match."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.compare import compare_query, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_oracle_keys_subset_of_queries():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, con, name):
    res = compare_query(spark, con, _QUERIES[name], _ORACLES[name], SF_DIR)
    assert res["ok"], f"{name}: {res}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_gate_rejects_array_columns(spark, con):
    """The driver's canonicalizer cannot hash list cells (the r2
    ``array_agg_ordered`` red row); the local gate must fail an
    array-emitting query loudly BEFORE the driver does."""

    def listy(spark, sf_dir):
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .groupBy("o_custkey")
            .agg(F.collect_list("o_orderkey").alias("ks"))
        )

    with pytest.raises(TypeError, match="stringify"):
        compare_query(
            spark, con, listy,
            "SELECT o_custkey, list(o_orderkey) AS ks FROM orders GROUP BY 1",
            SF_DIR,
        )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_approx_aggregates_error_bounds(spark):
    """HLL++ distinct counts within 5*rsd of exact; quantile sketch median
    within 1% of the exact interpolated median."""
    pdf = entry_mod.q_approx_aggregates(spark, SF_DIR).toPandas()
    assert len(pdf) >= 3
    rel = (pdf["approx_users"] - pdf["exact_users"]).abs() / pdf["exact_users"]
    assert (rel <= 0.05).all(), pdf
    p50_rel = (pdf["approx_p50"] - pdf["exact_p50"]).abs() / pdf["exact_p50"].abs()
    assert (p50_rel <= 0.01).all(), pdf
