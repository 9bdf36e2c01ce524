"""Spearman rank correlation and the Wald-Wolfowitz runs test."""

from __future__ import annotations

from dads_spark.rollup import runs_test, spearman_corr


def _xy(spark, pairs):
    rows = [("k", i, x, y) for i, (x, y) in enumerate(pairs)]
    return spark.createDataFrame(rows, "key string, t long, x long, y long")


def test_spearman_perfect_monotone_is_one(spark):
    # nonlinear but monotone: Pearson < 1, Spearman == 1 exactly
    pairs = [(i, i * i * i) for i in range(1, 12)]
    r = spearman_corr(_xy(spark, pairs), ["key"], "x", "y").collect()[0]
    assert r["rho_q6"] == 1_000_000


def test_spearman_reversed_is_minus_one(spark):
    pairs = [(i, 100 - i) for i in range(10)]
    r = spearman_corr(_xy(spark, pairs), ["key"], "x", "y").collect()[0]
    assert r["rho_q6"] == -1_000_000


def test_spearman_ties_match_scipy_formula(spark):
    # hand-checkable tie case: doubled midranks against the classic
    # tie-corrected Pearson-on-ranks definition
    pairs = [(1, 2), (1, 1), (2, 5), (3, 5), (3, 7)]
    r = spearman_corr(_xy(spark, pairs), ["key"], "x", "y").collect()[0]
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]

    def midranks(v):
        return [
            sum(1 for o in v if o < x) + (sum(1 for o in v if o == x) + 1) / 2
            for x in v
        ]

    import math

    ra, rb = midranks(xs), midranks(ys)
    n = len(ra)
    num = n * sum(a * b for a, b in zip(ra, rb)) - sum(ra) * sum(rb)
    va = n * sum(a * a for a in ra) - sum(ra) ** 2
    vb = n * sum(b * b for b in rb) - sum(rb) ** 2
    rho = num / math.sqrt(va * vb)
    assert abs(r["rho_q6"] / 1e6 - rho) < 2e-6


def test_spearman_constant_column_is_null(spark):
    pairs = [(5, i) for i in range(8)]
    r = spearman_corr(_xy(spark, pairs), ["key"], "x", "y").collect()[0]
    assert r["rho_q6"] is None


def _series(spark, values):
    return spark.createDataFrame(
        [("k", i, int(v)) for i, v in enumerate(values)],
        "key string, t long, v long",
    )


def test_runs_alternating_has_max_runs(spark):
    vals = [1, 9] * 10
    r = runs_test(_series(spark, vals), ["key"], "t", "v").collect()[0]
    assert r["n_runs"] == 20 and r["n_above"] == 10 and r["n_below"] == 10
    assert r["z_q6"] > 3_000_000  # far more runs than random


def test_runs_clustered_has_two_runs(spark):
    vals = [1] * 10 + [9] * 10
    r = runs_test(_series(spark, vals), ["key"], "t", "v").collect()[0]
    assert r["n_runs"] == 2
    assert r["z_q6"] < -3_000_000


def test_runs_median_points_drop(spark):
    # odd n: the single median point itself drops
    vals = [1, 1, 5, 9, 9]
    r = runs_test(_series(spark, vals), ["key"], "t", "v").collect()[0]
    assert r["n_above"] == 2 and r["n_below"] == 2
    assert r["n_runs"] == 2


def test_runs_z_matches_textbook_formula(spark):
    import math

    vals = [3, 8, 2, 9, 9, 1, 7, 2, 8, 3, 9, 1]
    r = runs_test(_series(spark, vals), ["key"], "t", "v").collect()[0]
    n1, n0, R = r["n_above"], r["n_below"], r["n_runs"]
    n = n1 + n0
    mu = 1 + 2 * n1 * n0 / n
    var = 2 * n1 * n0 * (2 * n1 * n0 - n) / (n * n * (n - 1))
    z = (R - mu) / math.sqrt(var)
    assert abs(r["z_q6"] / 1e6 - z) < 2e-6


def _fx(spark, rows):
    # rows: (user, sec, type)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "user_id long, sec long, event_type string")
    return df.select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "event_type"
    )


def test_funnel_exclusion_semantics(spark):
    from dads_spark.rollup import funnel_with_exclusion

    rows = [
        # u1: clean conversion (click -> purchase, no error between)
        (1, 100, "click"), (1, 200, "purchase"),
        # u2: blocked (error strictly between)
        (2, 100, "click"), (2, 150, "error"), (2, 200, "purchase"),
        # u3: timeout (purchase too late)
        (3, 100, "click"), (3, 100 + 8000, "purchase"),
        # u4: error AFTER the purchase does not block
        (4, 100, "click"), (4, 200, "purchase"), (4, 300, "error"),
        # u5: no purchase at all
        (5, 100, "click"),
    ]
    out = {
        r["user_id"]: (r["n_a"], r["n_converted"], r["n_blocked"],
                       r["n_timeout"])
        for r in funnel_with_exclusion(
            _fx(spark, rows), "user_id", "ts", "event_type",
            "click", "purchase", "error", within_sec=3600,
        ).collect()
    }
    assert out[1] == (1, 1, 0, 0)
    assert out[2] == (1, 0, 1, 0)
    assert out[3] == (1, 0, 0, 1)
    assert out[4] == (1, 1, 0, 0)
    assert out[5] == (1, 0, 0, 1)


def test_funnel_exclusion_multiple_as_share_b(spark):
    from dads_spark.rollup import funnel_with_exclusion

    rows = [(1, 100, "click"), (1, 150, "click"), (1, 200, "purchase")]
    out = funnel_with_exclusion(
        _fx(spark, rows), "user_id", "ts", "event_type",
        "click", "purchase", "error", within_sec=3600,
    ).collect()[0]
    assert (out["n_a"], out["n_converted"]) == (2, 2)


def test_runs_degenerate_variance_is_null(spark):
    # exactly one point above and one below the median: 2*n1*n0 == n so
    # the z variance is 0 — the statistic must be NULL (r4 ADVICE item:
    # the old guard let this divide by zero and Spark/DuckDB could
    # disagree on NULL vs inf)
    vals = [1, 5]
    r = runs_test(_series(spark, vals), ["key"], "t", "v").collect()[0]
    assert r["n_above"] == 1 and r["n_below"] == 1
    assert r["z_q6"] is None
