"""Western-Electric / Nelson control-chart rule flags."""

from __future__ import annotations

import math

from dads_spark.rollup import control_chart_flags


def _series(spark, values, key="k"):
    rows = [(key, i, int(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "key string, t long, v long")


def _flags(spark, values):
    out = control_chart_flags(
        _series(spark, values), ["key"], "t", "v"
    ).collect()
    return {r["t"]: r for r in out}


def _naive_rules(values):
    """Straight scalar re-derivation (floats) of the same rule set."""
    n = len(values)
    mu = sum(values) / n
    var = sum((x - mu) ** 2 for x in values) / n
    sd = math.sqrt(var)
    flagged = {}
    for i, v in enumerate(values):
        r1 = abs(v - mu) > 3 * sd
        w9 = values[max(0, i - 8): i + 1]
        r2 = len([x for x in w9 if x > mu]) == 9 or len(
            [x for x in w9 if x < mu]
        ) == 9
        w6 = values[max(0, i - 5): i + 1]
        r3 = len(w6) == 6 and (
            all(a < b for a, b in zip(w6, w6[1:]))
            or all(a > b for a, b in zip(w6, w6[1:]))
        )
        w3 = values[max(0, i - 2): i + 1]
        above2 = len([x for x in w3 if x > mu and abs(x - mu) > 2 * sd])
        below2 = len([x for x in w3 if x < mu and abs(x - mu) > 2 * sd])
        r4 = above2 >= 2 or below2 >= 2
        if r1 or r2 or r3 or r4:
            flagged[i] = (int(r1), int(r2), int(r3), int(r4))
    return flagged


def test_spike_fires_r1(spark):
    vals = [10, 11, 10, 9, 10, 11, 10, 9, 10, 11, 10, 9, 500, 10, 11, 10]
    f = _flags(spark, vals)
    assert 12 in f and f[12]["r1"] == 1


def test_nine_run_fires_r2(spark):
    # balanced base keeps the mean between the two levels; the last
    # nine points all sit above it
    vals = [5, 15] * 10 + [12] * 9
    f = _flags(spark, vals)
    last = len(vals) - 1
    assert last in f and f[last]["r2"] == 1


def test_monotone_six_fires_r3(spark):
    vals = [10, 10, 10, 10, 1, 2, 3, 4, 5, 6, 10, 10, 10, 10, 10, 10]
    f = _flags(spark, vals)
    assert 9 in f and f[9]["r3"] == 1  # 1..6 ends at index 9


def test_constant_series_is_clean(spark):
    assert _flags(spark, [7] * 30) == {}


def test_matches_float_rederivation(spark):
    # pseudo-random-ish but deterministic integer series with planted
    # structure: spike, run, ramp
    vals = [((i * 37) % 11) + 50 for i in range(40)]
    vals[17] = 200
    vals[25:31] = [40, 42, 44, 46, 48, 49]
    f = _flags(spark, vals)
    naive = _naive_rules(vals)
    got = {t: (r["r1"], r["r2"], r["r3"], r["r4"]) for t, r in f.items()}
    assert got == naive


def test_decision_operands_are_exact(spark):
    vals = [3] * 24 + [100]
    f = _flags(spark, vals)
    n, s = len(vals), sum(vals)
    q = sum(v * v for v in vals)
    r = f[24]
    assert r["dev"] == n * 100 - s
    assert r["a"] == n * q - s * s
    assert r["dev"] ** 2 > 9 * r["a"] and r["r1"] == 1
