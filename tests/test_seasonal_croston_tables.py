"""Seasonal strength, Croston intermittent-demand, HTML table
extraction — hand cases + kernel properties."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dads_spark.ops import html_tables
from dads_spark.rollup import croston_grouped, seasonal_strength
from dads_spark.rollup.forecast import croston


def test_croston_kernel_hand_case():
    # demands 2,3 at days 0,4: iv=[4]; s = .1*3+.9*2 = 2.1; v = 4
    s, v, fc = croston([2, 3], [0, 4], alpha=0.1)
    assert (s, v) == (2.1, 4.0)
    assert fc == 2.1 / 4.0


def test_croston_kernel_smooths_intervals():
    # days 0,2,6: iv=[2,4]; v = .1*4+.9*2 = 2.2
    s, v, fc = croston([1, 1, 1], [0, 2, 6], alpha=0.1)
    assert abs(v - 2.2) < 1e-12 and s == 1.0


def test_croston_single_demand_is_nan():
    s, v, fc = croston([5], [3])
    assert np.isnan(fc)


def test_croston_grouped_matches_kernel(spark):
    rows = [("a", 0, 2.0), ("a", 4, 3.0), ("b", 1, 1.0)]  # b: 1 point
    df = spark.createDataFrame(rows, "series string, day long, demand double")
    out = croston_grouped(df, ["series"], "day", "demand", 0.1).collect()
    assert len(out) == 1  # single-demand series b drops
    r = out[0]
    ks, kv, kf = croston([2, 3], [0, 4], 0.1)
    assert (r.series, r.n_demands) == ("a", 2)
    assert (r.size_level, r.interval_level, r.forecast) == (ks, kv, kf)


def test_seasonal_strength_periodic_vs_flat(spark):
    # periodic: value depends only on hour-of-day -> residual ~ 0 at the
    # interior (edges differ via partial MA windows) -> strength high;
    # noise series: hour-of-day explains nothing -> strength low
    rows = []
    for day in range(6):
        for h in range(24):
            ts = f"2024-01-{day+1:02d} {h:02d}:00:00"
            rows.append(("periodic", ts, float(10 + (5 if h < 12 else -5))))
            rows.append(("noisy", ts, float((day * 24 + h) * 7919 % 97)))
    df = spark.createDataFrame(rows, "k string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    out = {r.k: r for r in seasonal_strength(df, "k", "ts", "value").collect()}
    assert out["periodic"].strength_q6 > 900_000
    assert out["noisy"].strength_q6 < out["periodic"].strength_q6
    assert out["periodic"].n_buckets == 144


def test_seasonal_strength_constant_series_null(spark):
    rows = [("c", f"2024-01-01 {h:02d}:00:00", 5.0) for h in range(24)]
    df = spark.createDataFrame(rows, "k string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    r = seasonal_strength(df, "k", "ts", "value").collect()[0]
    assert r.strength_q6 is None  # Var(detrended) = 0


def _cells(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_tables(df).collect()


def test_html_tables_basic_grid(spark):
    html = (
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td> <b>2</b> </td></tr></table>"
    )
    out = _cells(spark, html)
    got = {(r.table_idx, r.row_idx, r.col_idx): r.cell_text for r in out}
    assert got[(0, 0, 0)] == "A" and got[(0, 0, 1)] == "B"
    assert got[(0, 1, 0)] == "1"
    assert got[(0, 1, 1)] == "2"  # inner tags stripped, ws collapsed


def test_html_tables_multiple_and_case(spark):
    html = (
        "<TABLE><TR><TD>x</TD></TR></TABLE>"
        "<table><tr><td>y</td></tr></table>"
    )
    out = _cells(spark, html)
    assert {(r.table_idx, r.cell_text) for r in out} == {(0, "x"), (1, "y")}


def test_html_tables_no_table_no_rows(spark):
    assert _cells(spark, "<p>nothing tabular</p>") == []


def test_html_tables_multiline_cell(spark):
    html = "<table><tr><td>a\nb\t c</td></tr></table>"
    out = _cells(spark, html)
    assert out[0].cell_text == "a b c"
