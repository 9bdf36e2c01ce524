"""DRAG discord operator vs brute-force z-normalized distance oracle."""

from __future__ import annotations

import numpy as np
import pytest

from dads_spark.fixtures import benchmark_series
from dads_spark.s2g.discord import (
    discord_series_grouped,
    drag_discords,
    mass_distance_profile,
    matrix_profile_self,
    merge_ranges,
)

RNG = np.random.default_rng(1)


def _brute_profile(q, x):
    m = len(q)
    qn = (q - q.mean()) / q.std()
    out = []
    for i in range(len(x) - m + 1):
        w = x[i : i + m]
        if w.std() == 0:
            out.append(np.sqrt(2 * m))
            continue
        wn = (w - w.mean()) / w.std()
        out.append(np.linalg.norm(qn - wn))
    return np.array(out)


def test_mass_matches_bruteforce():
    x = RNG.normal(size=400)
    q = x[37:97]
    np.testing.assert_allclose(
        mass_distance_profile(q, x), _brute_profile(q, x), atol=1e-9
    )


def test_mass_constant_window_convention():
    x = np.concatenate([np.ones(50), RNG.normal(size=100)])
    q = RNG.normal(size=20)
    d = mass_distance_profile(q, x)
    assert d[0] == pytest.approx(np.sqrt(2 * 20))


def test_matrix_profile_finds_planted_splice():
    x = benchmark_series(3000)  # random-walk splice planted at 900..975
    mp = matrix_profile_self(x, 75)
    top = np.argsort(mp)[-15:]
    assert ((top >= 880) & (top <= 975)).all()


def test_drag_agrees_with_matrix_profile():
    x = benchmark_series(2000, seed=5)
    m = 50
    mp = matrix_profile_self(x, m)
    r = float(np.quantile(mp, 0.99))
    found = dict(drag_discords(x, m, r))
    want = {int(i): float(mp[i]) for i in np.nonzero(mp >= r)[0]}
    assert set(found) == set(want)
    for i in found:
        assert found[i] == pytest.approx(want[i], rel=1e-9)


def test_merge_ranges():
    assert merge_ranges([0, 10, 50], 20) == [(0, 30), (50, 70)]
    assert merge_ranges([], 20) == []
    assert merge_ranges([5], 10) == [(5, 15)]


def test_discord_series_grouped(spark):
    rows = []
    for k in range(3):
        x = benchmark_series(1500, seed=k)
        rows += [(f"d{k}", i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "domain string, t long, value double")
    out = discord_series_grouped(df, ["domain"], "t", "value", m=75).toPandas()
    assert len(out) >= 1
    # each found range should cover part of the planted splice (at 0.3*n=450)
    for _, row in out.iterrows():
        assert row.range_end > row.range_start
        assert row.peak_nn_dist > 0
    hit = out[(out.range_start <= 530) & (out.range_end >= 400)]
    assert len(hit) >= 1, f"no range near the planted splice: {out}"


def test_drag_tiers_lane_covers_both_tiers(spark):
    import __spark_entry__ as em

    rows = em.queries()["drag_discords_tiers"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    tiers = {r.tier for r in rows}
    assert tiers == {"hour", "day"}
    for r in rows:
        assert r.range_end >= r.range_start >= 0
        assert r.peak_q6 > 0
