"""Bitemporal as-of reads (rollup/bitemporal.py)."""

from __future__ import annotations

from dads_spark.rollup import bitemporal_asof


def _versions(spark):
    # entity x: value 1 valid day1 known at t10; corrected (value 2, same
    # valid day) at t30; a NEWER valid day5 fact (value 3) arrives t20
    rows = [
        ("x", 1, 10, 1),
        ("x", 1, 30, 2),
        ("x", 5, 20, 3),
        ("y", 7, 10, 9),
    ]
    return spark.createDataFrame(
        rows, "entity string, valid_from long, tx_from long, value long"
    )


def _read(spark, valid_asof, tx_asof):
    out = bitemporal_asof(
        _versions(spark), ["entity"], "valid_from", "tx_from",
        valid_asof, tx_asof,
    )
    return {r["entity"]: r["value"] for r in out.collect()}


def test_audit_read_sees_only_past_transactions(spark):
    # as believed at tx 15: only the original day-1 fact exists for x
    assert _read(spark, valid_asof=6, tx_asof=15) == {"x": 1}


def test_correction_visible_after_its_tx_time(spark):
    # at tx 35 the day-1 fact has been corrected to value 2
    assert _read(spark, valid_asof=3, tx_asof=35) == {"x": 2}


def test_valid_time_picks_governing_version(spark):
    # valid as-of day 6 at tx 35: day-5 fact governs (newest valid_from)
    assert _read(spark, valid_asof=6, tx_asof=35) == {"x": 3}


def test_no_qualifying_version_emits_nothing(spark):
    # y's only fact is valid day 7 — invisible for valid as-of day 6
    out = _read(spark, valid_asof=6, tx_asof=100)
    assert "y" not in out
    assert _read(spark, valid_asof=7, tx_asof=100)["y"] == 9


def test_current_read_is_tx_infinity(spark):
    assert _read(spark, valid_asof=10**9, tx_asof=10**12) == {
        "x": 3, "y": 9,
    }
