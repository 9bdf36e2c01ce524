"""Two-season (hour-of-day x day-of-week) exact decomposition."""

from __future__ import annotations

import numpy as np

from dads_spark.rollup import multi_seasonal_profile


def _df(spark, series):
    rows = [(k, int(h), int(v)) for k, hv in series.items()
            for h, v in hv]
    return spark.createDataFrame(rows, "k string, hw long, cnt long")


def test_multiseasonal_identity_holds_exactly(spark):
    rng = np.random.default_rng(7)
    hv = [(h, int(v)) for h, v in
          enumerate(rng.poisson(40, 24 * 7 * 4))]
    rows = multi_seasonal_profile(
        _df(spark, {"s": hv}), ["k"], "hw", "cnt"
    ).collect()
    assert len(rows) == len(hv)
    # reconstruct base from any row: 1e6*x - hod - dow - resid
    bases = {1_000_000 * r["x"] - r["hod_eff_q6"] - r["dow_eff_q6"]
             - r["resid_q6"] for r in rows}
    assert len(bases) == 1   # the additive identity is exact per row


def test_multiseasonal_recovers_planted_cycles(spark):
    # x = 100 + 12 at hour 9 + 7 on dow 0, over 8 complete weeks
    hv = []
    for h in range(24 * 7 * 8):
        hod, dow = h % 24, (h // 24 + 4) % 7
        hv.append((h, 100 + (12 if hod == 9 else 0)
                   + (7 if dow == 0 else 0)))
    out = multi_seasonal_profile(
        _df(spark, {"p": hv}), ["k"], "hw", "cnt"
    ).collect()
    by_hod = {}
    by_dow = {}
    for r in out:
        by_hod[r["hod"]] = r["hod_eff_q6"]
        by_dow[r["dow"]] = r["dow_eff_q6"]
    # hour-9 effect ~ +12e6 relative to the others, dow-0 ~ +7e6
    others_h = [v for h, v in by_hod.items() if h != 9]
    assert by_hod[9] - max(others_h) > 11_000_000
    others_d = [v for d, v in by_dow.items() if d != 0]
    assert by_dow[0] - max(others_d) > 6_000_000
    # complete balanced grid: residuals vanish up to rounding
    assert max(abs(r["resid_q6"]) for r in out) <= 2


def test_multiseasonal_matches_scalar_replica(spark):
    rng = np.random.default_rng(55)
    hv = [(int(h), int(v)) for h, v in
          zip(sorted(rng.choice(5000, 600, replace=False)),
              rng.integers(0, 300, 600))]
    out = {r["hw"]: r for r in multi_seasonal_profile(
        _df(spark, {"r": hv}), ["k"], "hw", "cnt"
    ).collect()}

    def hup(num, den):
        s = -1 if num < 0 else 1
        return s * ((2 * abs(num) + den) // (2 * den))

    n = len(hv)
    s = sum(v for _, v in hv)
    base = hup(1_000_000 * s, n)
    hod_groups, dow_groups = {}, {}
    for h, v in hv:
        hod_groups.setdefault(h % 24, []).append(v)
    hod_eff = {h: hup(1_000_000 * sum(vs), len(vs)) - base
               for h, vs in hod_groups.items()}
    for h, v in hv:
        r = 1_000_000 * v - base - hod_eff[h % 24]
        dow_groups.setdefault((h // 24 + 4) % 7, []).append((h, r))
    dow_eff = {d: hup(sum(r for _, r in rs), len(rs))
               for d, rs in dow_groups.items()}
    for h, v in hv:
        r = 1_000_000 * v - base - hod_eff[h % 24]
        want = r - dow_eff[(h // 24 + 4) % 7]
        assert out[h]["resid_q6"] == want, h
        assert out[h]["hod_eff_q6"] == hod_eff[h % 24], h


def test_series_health_hand_case(spark):
    from dads_spark.rollup import series_health

    rows = [("a", h) for h in [0, 1, 2, 5, 6, 9]]          # gaps 2,2
    rows += [("b", h) for h in [0, 1, 2, 3]]               # dense, stale
    df = spark.createDataFrame(rows, "k string, hw long")
    out = {r["k"]: r for r in
           series_health(df, ["k"], "hw").collect()}
    a, b = out["a"], out["b"]
    assert (a["n_obs"], a["span"], a["largest_gap"]) == (6, 10, 2)
    assert a["fill_ppm"] == 600_000
    assert a["staleness"] == 0            # a holds the corpus head (9)
    assert (b["n_obs"], b["span"], b["largest_gap"]) == (4, 4, 0)
    assert b["fill_ppm"] == 1_000_000
    assert b["staleness"] == 6            # corpus head 9 - last hw 3


def test_series_health_single_point(spark):
    from dads_spark.rollup import series_health

    df = spark.createDataFrame([("s", 7)], "k string, hw long")
    r = series_health(df, ["k"], "hw").collect()[0]
    assert (r["n_obs"], r["span"], r["fill_ppm"]) == (1, 1, 1_000_000)
    assert r["largest_gap"] == 0 and r["staleness"] == 0


def test_poisson_significance_flag_is_integer_exact(spark):
    from dads_spark.rollup import poisson_delta_significance

    rows = [
        ("big_base", 50_040, 50_000),   # +40 on 100k: z ~ 0.13, quiet
        ("small_base", 90, 50),         # +40 on 140: z ~ 3.38, pages
        ("boundary", 18, 0),            # z^2 = 18 exactly = 9*(a+b)/.. 18^2=324 > 9*18=162 -> sig
        ("zero", 0, 0),                 # undefined -> NULLs
        ("drop", 10, 100),              # negative z, significant
    ]
    df = spark.createDataFrame(rows, "k string, n_cur long, n_prev long")
    out = {r["k"]: r for r in
           poisson_delta_significance(df).collect()}
    assert out["big_base"]["significant"] is False
    assert out["small_base"]["significant"] is True
    assert out["zero"]["z_q6"] is None and out["zero"]["significant"] is None
    assert out["drop"]["z_q6"] < 0 and out["drop"]["significant"] is True
    import math
    for k, a, b in [(r[0], r[1], r[2]) for r in rows if r[1] + r[2] > 0]:
        z = (a - b) / math.sqrt(a + b)
        want = (-1 if z < 0 else 1) * math.floor(abs(z) * 1e6 + 0.5)
        assert out[k]["z_q6"] == want, k
        assert out[k]["significant"] == ((a - b) ** 2 > 9 * (a + b)), k
