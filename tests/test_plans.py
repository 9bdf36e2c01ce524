"""Physical-plan assertions: the plans Catalyst picks are the plans we want.

These guard the scale story: filters reach the parquet scan, small
dimensions broadcast, unused (wide) columns never leave the reader.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(em.q1_pricing_summary(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial aggregation before the exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(em.q3_shipping_priority(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_broadcasts_small_dims(spark):
    plan = _plan(em.q5_region_revenue(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2


def test_rollup_prunes_columns(spark):
    plan = _plan(em.q_rollup_hour(spark, SF_DIR))
    # props (the wide json column) must not be read
    assert "props" not in plan
    assert "ReadSchema" in plan


def test_semi_anti_use_join_strategies(spark):
    plan = _plan(em.q_semi_anti_customers(spark, SF_DIR))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_pages_series_never_reads_html(spark):
    from dads_spark.fixtures.pages import pages_table
    from dads_spark.rollup import domain_hourly_series
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "pages_pq")
    pages_table(spark, 500).write.mode("overwrite").parquet(path)
    plan = _plan(domain_hourly_series(spark.read.parquet(path)))
    assert "html" not in plan, "html blob must be pruned at the scan"
