"""Markov entropy rate and Goh-Barabasi burstiness."""

from __future__ import annotations

import math

import numpy as np

from dads_spark.rollup import burstiness, markov_entropy_rate


def _ev(spark, rows):
    """rows: (cohort, user, t, type); event_id = t."""
    data = [(c, u, t, ty, t) for c, u, t, ty in rows]
    return spark.createDataFrame(
        data,
        "cohort long, user_id long, ts long, event_type string, event_id long",
    )


def test_markov_deterministic_cycle_is_zero(spark):
    rows = [(0, 1, t, "ab"[t % 2]) for t in range(40)]
    r = markov_entropy_rate(
        _ev(spark, rows), ["cohort"], "user_id", "ts", "event_type",
        "event_id",
    ).collect()[0]
    assert r["n_transitions"] == 39
    assert r["n_pairs"] == 2          # a->b and b->a only
    assert r["rate_q3"] == 0


def test_markov_chains_do_not_cross_users(spark):
    # user 1 ends on 'a', user 2 starts on 'b' — the a->b transition
    # must NOT appear
    rows = [(0, 1, 0, "a"), (0, 1, 1, "a"),
            (0, 2, 0, "b"), (0, 2, 1, "b")]
    r = markov_entropy_rate(
        _ev(spark, rows), ["cohort"], "user_id", "ts", "event_type",
        "event_id",
    ).collect()[0]
    assert r["n_transitions"] == 2    # a->a, b->b
    assert r["n_pairs"] == 2
    assert r["rate_q3"] == 0


def _markov_naive(chains):
    from collections import Counter
    cells = Counter()
    for ch in chains:
        for x, y in zip(ch, ch[1:]):
            cells[(x, y)] += 1
    rows = Counter()
    for (x, _), c in cells.items():
        rows[x] += c
    n = sum(cells.values())
    sum_t = sum(
        math.floor(c * (math.log(rows[x]) - math.log(c)) * 1000 + 0.5)
        for (x, _), c in cells.items()
    )
    return n, len(cells), (2 * sum_t + n) // (2 * n)


def test_markov_matches_naive_on_random(spark):
    rng = np.random.default_rng(41)
    chains = [
        [str(s) for s in rng.integers(0, 4, 60)] for _ in range(5)
    ]
    rows = [
        (0, u, t, s)
        for u, ch in enumerate(chains)
        for t, s in enumerate(ch)
    ]
    r = markov_entropy_rate(
        _ev(spark, rows), ["cohort"], "user_id", "ts", "event_type",
        "event_id",
    ).collect()[0]
    n, n_pairs, rate = _markov_naive(chains)
    assert r["n_transitions"] == n
    assert r["n_pairs"] == n_pairs
    assert r["rate_q3"] == rate


def test_markov_uniform_two_states_near_ln2(spark):
    rng = np.random.default_rng(5)
    rows = [(0, 1, t, "ab"[b]) for t, b in
            enumerate(rng.integers(0, 2, 4000))]
    r = markov_entropy_rate(
        _ev(spark, rows), ["cohort"], "user_id", "ts", "event_type",
        "event_id",
    ).collect()[0]
    assert abs(r["rate_q3"] - 693) < 30   # ln 2 in q3, sampling noise


def _gaps_df(spark, series):
    rows = [
        (k, int(t), int(t)) for k, ts in series.items() for t in ts
    ]
    return spark.createDataFrame(rows, "u long, sec long, event_id long")


def test_burstiness_periodic_is_minus_one(spark):
    df = _gaps_df(spark, {1: list(range(0, 300, 10))})
    r = burstiness(df, ["u"], "sec", "event_id").collect()[0]
    assert r["n_gaps"] == 29 and r["sum_gap"] == 290
    assert r["b_q6"] == -1_000_000   # sigma = 0 -> B = -1 exactly


def test_burstiness_bursty_positive(spark):
    # tight bursts separated by huge silences -> sigma >> mu -> B -> 1
    ts = []
    for burst in range(5):
        base = burst * 100_000
        ts += [base + i for i in range(10)]
    r = burstiness(
        _gaps_df(spark, {1: ts}), ["u"], "sec", "event_id"
    ).collect()[0]
    assert r["b_q6"] > 500_000


def test_burstiness_matches_scalar_replica(spark):
    rng = np.random.default_rng(13)
    ts = sorted(int(t) for t in
                np.cumsum(rng.integers(1, 500, 120)))
    r = burstiness(
        _gaps_df(spark, {1: ts}), ["u"], "sec", "event_id"
    ).collect()[0]
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    n, sg, sg2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
    a = float(n * sg2 - sg * sg)
    ratio = (math.sqrt(a) - sg) / (math.sqrt(a) + sg)
    sgn = -1 if ratio < 0 else 1
    want = sgn * math.floor(abs(ratio) * 1e6 + 0.5)
    assert (r["n_gaps"], r["sum_gap"], r["sum_gap2"]) == (n, sg, sg2)
    assert r["b_q6"] == want


def test_series_triage_composition_matches_components(spark):
    """The composed triage profile must equal the component gauges
    computed independently on the same staged series."""
    import __spark_entry__ as em
    from dads_spark.rollup import perm_entropy, sample_entropy

    sf = "/root/testdata/sf0.001"
    triage = {r["event_type"]: r for r in
              em.queries()["series_triage"](spark, sf).collect()}
    assert len(triage) == 5
    ev = spark.read.parquet(f"{sf}/events.parquet")
    from pyspark.sql import functions as F
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000")
        .alias("hw"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    se = {r["event_type"]: r["sampen_q3"] for r in
          sample_entropy(hourly, ["event_type"], "hw", "cnt").collect()}
    pe = {r["event_type"]: r["pe_q3"] for r in
          perm_entropy(hourly, ["event_type"], "hw", "cnt").collect()}
    for k, row in triage.items():
        assert row["sampen_q3"] == se[k]
        assert row["pe_q3"] == pe[k]
