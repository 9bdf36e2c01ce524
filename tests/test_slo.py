"""SLO burn-rate alerting: hand-built burst scenario + window math."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dads_spark.rollup import slo_burn_rates

T0 = datetime(2024, 5, 1)


def _events(spec):
    """spec: list of (grain_index, n_ok, n_err) -> rows of (svc, ts, kind)."""
    rows = []
    for g, n_ok, n_err in spec:
        base = T0 + timedelta(seconds=300 * g)
        for i in range(n_ok):
            rows.append(("svc", base + timedelta(seconds=i % 300), "ok"))
        for i in range(n_err):
            rows.append(("svc", base + timedelta(seconds=i % 300), "error"))
    return rows


def test_slo_burn_multiwindow_conjunction(spark):
    # 12 clean grains (1h), then a one-grain 100% burst, a quiet grain,
    # then two more burst grains: page (1h AND 5m > 14.4) must fire only
    # once the LONG window accumulates enough budget burn — not on the
    # first short spike.
    spec = [(g, 100, 0) for g in range(12)]
    spec += [(12, 0, 100), (13, 100, 0), (14, 0, 100), (15, 0, 100)]
    df = spark.createDataFrame(
        _events(spec), "service string, ts timestamp, event_type string"
    )
    out = {
        int((r["grain_epoch"] - T0.timestamp()) / 300): r.asDict()
        for r in slo_burn_rates(
            df, "service", "ts", F.col("event_type") == "error", budget=0.01
        ).collect()
    }
    # short-window burn at the burst grain: ratio 1.0 / budget 0.01
    assert out[12]["burn_300s"] == 100.0
    # 1h window at g=12 covers g=1..12: 100 errs / 1200 events
    assert abs(out[12]["burn_3600s"] - (100 / 1200) / 0.01) < 1e-12
    assert out[12]["page"] is False  # long window still cold
    assert out[13]["burn_300s"] == 0.0 and out[13]["page"] is False
    # g=15: 1h window (g=4..15) has 300 errs / 1200 events -> burn 25
    assert abs(out[15]["burn_3600s"] - 25.0) < 1e-12
    assert out[15]["page"] is True  # both windows hot
    # ticket (6h AND 30m > 6): 30m at g=15 covers g=10..15 ->
    # 300/600 -> burn 50; 6h covers everything -> 300/1600 -> 18.75
    assert out[15]["ticket"] is True
    assert out[11]["ticket"] is False  # pre-burst: all burns zero
    # gaps in the grain series don't corrupt RANGE frames: drop g=13
    spec2 = [(g, 100, 0) for g in range(12)] + [(12, 0, 100), (14, 0, 100)]
    df2 = spark.createDataFrame(
        _events(spec2), "service string, ts timestamp, event_type string"
    )
    out2 = {
        int((r["grain_epoch"] - T0.timestamp()) / 300): r.asDict()
        for r in slo_burn_rates(
            df2, "service", "ts", F.col("event_type") == "error", budget=0.01
        ).collect()
    }
    # 1h window at g=14 covers g=3..14: 10 clean grains + the two burst
    # grains; the absent g=13 contributes nothing -> 200 errs / 1100
    assert abs(out2[14]["burn_3600s"] - (200 / 1100) / 0.01) < 1e-12


def test_slo_burn_partitioning_invariance(spark):
    spec = [(g, 7, g % 3) for g in range(40)]
    df = spark.createDataFrame(
        _events(spec), "service string, ts timestamp, event_type string"
    )
    err = F.col("event_type") == "error"
    a = sorted(map(tuple, slo_burn_rates(df, "service", "ts", err).collect()))
    b = sorted(
        map(tuple, slo_burn_rates(df.repartition(13), "service", "ts", err).collect())
    )
    assert a == b


def test_alert_hysteresis_state_machine(spark):
    import pandas as pd

    from dads_spark.rollup import alert_hysteresis

    # baseline week: 24 quiet hours/day x 7 (count 1/hour);
    # then a crafted post-baseline sequence of hourly counts:
    #   idx: 0  1  2  3  4  5  6  7  8  9 10 11 12 13
    #   cnt: 9  9  9  1  9  9  1  1  9  9  9  1  1  1
    # breach = count > 1.5*baseline_mean (mean=1) -> count 9 breaches.
    # fire_n=3 -> fires at idx 2; idx 3 clear-run len 1 < clear_m=2 (stays
    # firing); idx 6-7 clear-run len 2 -> clears at idx 7; idx 8-10
    # breach-run len 3 -> re-fires at idx 10; idx 11-13 clears at idx 12.
    rows = []
    t0 = pd.Timestamp("2026-01-01")
    for h in range(7 * 24):
        rows.append(("a", t0 + pd.Timedelta(hours=h)))
    seq = [9, 9, 9, 1, 9, 9, 1, 1, 9, 9, 9, 1, 1, 1]
    base_h = 7 * 24
    for i, c in enumerate(seq):
        for _ in range(c):
            rows.append(("a", t0 + pd.Timedelta(hours=base_h + i)))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"]),
        "event_type string, ts timestamp",
    )
    out = sorted(
        (r["fired_ts"], r["cleared_ts"])
        for r in alert_hysteresis(
            ev, ["event_type"], "ts", fire_n=3, clear_m=2
        ).collect()
    )
    hr = lambda i: (t0 + pd.Timedelta(hours=base_h + i)).to_pydatetime()  # noqa: E731
    assert out == [(hr(2), hr(7)), (hr(10), hr(12))]


def test_alert_hysteresis_open_episode_and_no_fire(spark):
    import pandas as pd

    from dads_spark.rollup import alert_hysteresis

    rows = []
    t0 = pd.Timestamp("2026-01-01")
    for h in range(7 * 24):
        rows.append(("a", t0 + pd.Timedelta(hours=h)))
        rows.append(("b", t0 + pd.Timedelta(hours=h)))
    # a: ends in a breach run >= fire_n -> open episode (cleared NULL)
    for i, c in enumerate([9, 9, 9, 9]):
        for _ in range(c):
            rows.append(("a", t0 + pd.Timedelta(hours=7 * 24 + i)))
    # b: breach runs always shorter than fire_n -> no episode at all
    for i, c in enumerate([9, 9, 1, 9, 9, 1]):
        for _ in range(c):
            rows.append(("b", t0 + pd.Timedelta(hours=7 * 24 + i)))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"]),
        "event_type string, ts timestamp",
    )
    out = alert_hysteresis(ev, ["event_type"], "ts", fire_n=3, clear_m=2).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["event_type"], []).append(r)
    assert "b" not in by_key
    assert len(by_key["a"]) == 1 and by_key["a"][0]["cleared_ts"] is None
