"""Round-4 operator families: SCD2 history (ops/scd.py), crawl-frontier
scheduling (ops/frontier.py), bigram-LM surprisal (ops/textstats.py),
detector-ensemble anomaly vote (rollup/analytics.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dads_spark.ops import bigram_logprob, frontier_schedule, scd2_history
from dads_spark.rollup import anomaly_ensemble


# ---------------------------------------------------------------- SCD2 --
def test_scd2_collapses_runs_and_chains_intervals(spark):
    rows = [
        # key 1: a -> a -> b -> b -> a   => 3 states
        (1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, "b"),
        (1, 40, 4, "b"), (1, 50, 5, "a"),
        # key 2: single state incl. NULL attr forming its own state
        (2, 10, 6, None), (2, 20, 7, None), (2, 30, 8, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, id long, attr string")
    got = {
        (r["k"], r["valid_from"]): (r["attr"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, ["k"], "ts", ["attr"], ["id"]).collect()
    }
    assert got == {
        (1, 10): ("a", 30, False),
        (1, 30): ("b", 50, False),
        (1, 50): ("a", None, True),
        (2, 10): (None, 30, False),
        (2, 30): ("x", None, True),
    }


def test_scd2_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, 10, 1, "a")], "k long, ts long, id long, attr string"
    )
    plan = (
        scd2_history(df, ["k"], "ts", ["attr"], ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both window passes share one hashpartitioning(k) exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_scd2_tiebreak_makes_order_total(spark):
    rows = [(1, 10, 2, "b"), (1, 10, 1, "a")]
    df = spark.createDataFrame(rows, "k long, ts long, id long, attr string")
    out = sorted(
        (r["valid_from"], r["attr"], r["is_current"])
        for r in scd2_history(df, ["k"], "ts", ["attr"], ["id"]).collect()
    )
    # id orders the tie: 'a' first (closed at ts=10), then 'b' current.
    assert out == [(10, "a", False), (10, "b", True)]


# ------------------------------------------------------------ frontier --
def test_frontier_politeness_and_worker_order(spark):
    rows = []
    for h in ("a.com", "b.com", "c.com"):
        for i in range(5):
            rows.append((h, f"https://{h}/{i}", i % 3))
    df = spark.createDataFrame(rows, "host string, url string, priority long")
    out = frontier_schedule(df, n_workers=2, delay_sec=10).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for h, rs in by_host.items():
        # one worker per host; offsets are 0,10,20,... by (prio desc, url)
        assert len({r["worker"] for r in rs}) == 1
        offs = sorted(r["fetch_offset_sec"] for r in rs)
        assert offs == [10 * i for i in range(len(rs))]
        # priority was i % 3 with i embedded as the url's last path segment
        ranked = sorted(
            rs, key=lambda r: (-(int(r["url"].rsplit("/", 1)[1]) % 3), r["url"])
        )
        assert [r["fetch_offset_sec"] for r in ranked] == offs
    # per-worker fetch_order is a dense total order 1..n
    by_worker = {}
    for r in out:
        by_worker.setdefault(r["worker"], []).append(r["fetch_order"])
    for w, orders in by_worker.items():
        assert sorted(orders) == list(range(1, len(orders) + 1))


def test_frontier_worker_col_plugs_in(spark):
    df = spark.createDataFrame(
        [("a.com", "u1", 1, 7), ("a.com", "u2", 2, 7)],
        "host string, url string, priority long, wk int",
    )
    out = frontier_schedule(df, n_workers=99, worker_col="wk").collect()
    assert {r["worker"] for r in out} == {7}


# ------------------------------------------------------------- bigrams --
def test_bigram_logprob_matches_scalar_oracle(spark):
    texts = {1: "a b c b c", 2: "a b a b a", 3: "z"}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    # scalar mirror: same Laplace smoothing, same quantization
    bigrams = {}
    ctx = {}
    vocab = set()
    docs_bg = {}
    for d, t in texts.items():
        toks = t.split(" ")
        vocab.update(toks)
        docs_bg[d] = list(zip(toks, toks[1:]))
        for b in docs_bg[d]:
            bigrams[b] = bigrams.get(b, 0) + 1
            ctx[b[0]] = ctx.get(b[0], 0) + 1
    V = len(vocab)
    nl = {
        b: math.floor(-math.log((c + 1) / float(ctx[b[0]] + V)) * 1e6 + 0.5)
        for b, c in bigrams.items()
    }
    want = {}
    for d, bgs in docs_bg.items():
        if not bgs:
            continue  # single-token doc emits no row
        s = sum(nl[b] for b in bgs)
        want[d] = (len(bgs), s, math.floor(s / float(len(bgs)) + 0.5))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_neglp_q6"], r["avg_neglp_q6"])
        for r in bigram_logprob(df).collect()
    }
    assert got == want
    assert 3 not in got


# ------------------------------------------------------------ ensemble --
def test_anomaly_ensemble_votes(spark):
    # 96 hourly points of a flat series plus one massive spike: the spike
    # trips seasonal z, MAD, and delta shock (3 votes); everything else
    # gets 0 votes. Mild per-hour wiggle keeps stddevs nonzero.
    rows = []
    for i in range(96):
        v = 100.0 + (i % 7) * 0.5
        if i == 50:
            v = 10_000.0
        rows.append(("t", i, 1_700_000_000 + i * 3600, v))
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, tsec long, value double"
    ).withColumn("ts", F.col("tsec").cast("timestamp")).drop("tsec")
    out = anomaly_ensemble(df, ["event_type"], "event_id", "ts", "value").collect()
    assert len(out) >= 1
    spike = [r for r in out if r["event_id"] == 50]
    assert spike and spike[0]["n_votes"] >= 2
    assert spike[0]["is_robust"] and spike[0]["is_shock"]
    # the point AFTER the spike is a shock (big delta down) but level-normal:
    # one vote only -> must NOT be emitted
    assert not [r for r in out if r["event_id"] == 51]


# ------------------------------------------------- weighted sampling --
def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from dads_spark.ops import weighted_sample

    rows = [("g", i, 1.0 if i else 1e9) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, id long, w double")
    got = weighted_sample(df, ["k"], "id", "w", 10)
    ids = {r["id"] for r in got.collect()}
    assert len(ids) == 10
    # the ~1e9x heavier row is effectively certain to be drawn
    assert 0 in ids
    # repartition invariance (md5 keys, no rand())
    again = {
        r["id"]
        for r in weighted_sample(df.repartition(7, "id"), ["k"], "id", "w", 10).collect()
    }
    assert again == ids


def test_dedup_normalized_collapses_reskins(spark):
    from dads_spark.ops import dedup_exact_normalized

    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "HELLO\tworld."),
            (4, "a different page"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["rep_id"], r["dup_count"])
        for r in dedup_exact_normalized(df).collect()
    )
    assert got == [(1, 3), (4, 1)]


def test_rolling_active_users_exact(spark):
    from dads_spark.rollup import rolling_active_users

    # day 1: users {a,b}; day 2: {b}; day 9: {c} (outside 7d of day 2)
    base = 1_700_000_000
    rows = [
        ("a", base), ("b", base), ("a", base + 100),
        ("b", base + 86_400),
        ("c", base + 8 * 86_400),
    ]
    df = spark.createDataFrame(rows, "user_id string, tsec long").withColumn(
        "ts", F.col("tsec").cast("timestamp")
    )
    got = {
        r["d"]: (r["dau"], r["wau"])
        for r in rolling_active_users(df, "user_id", "ts", 7).collect()
    }
    days = sorted(got)
    assert [got[d] for d in days] == [(2, 2), (1, 2), (1, 1)]


def test_triangle_counts_hand_graph(spark):
    from dads_spark.ops import triangle_counts

    # K4 on {a,b,c,d} minus edge (c,d), plus pendant e-a; duplicate and
    # reversed edges and a self-loop must not change anything
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("e", "a"), ("a", "a"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["lcc"])
        for r in triangle_counts(df).collect()
    }
    # triangles: abc, abd -> a:2 b:2 c:1 d:1 e:0
    assert got == {
        "a": (4, 2, round(2 * 2 / (4 * 3), 6)),
        "b": (3, 2, round(2 * 2 / (3 * 2), 6)),
        "c": (2, 1, 1.0),
        "d": (2, 1, 1.0),
        "e": (1, 0, 0.0),
    }


# ------------------------------------------------ property: SCD2 --------
def _scd2_reference(rows):
    """20-line scalar SCD2: rows = [(k, ts, id, attr)] -> set of
    (k, attr, valid_from, valid_to, is_current)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ts, i, a in rows:
        by_key[k].append((ts, i, a))
    out = set()
    for k, evs in by_key.items():
        evs.sort()
        states = []  # (attr, valid_from)
        cur = object()
        for ts, _, a in evs:
            if a != cur:
                states.append((a, ts))
                cur = a
        for j, (a, vf) in enumerate(states):
            vt = states[j + 1][1] if j + 1 < len(states) else None
            out.add((k, a, vf, vt, vt is None))
    return out


def test_scd2_property_vs_scalar_reference(spark):
    """Randomized SCD2 parity: many keys, colliding timestamps (broken by
    id), repeated/alternating attr runs, NULL attrs."""
    from hypothesis import given, settings, strategies as st

    row = st.tuples(
        st.integers(0, 4),                       # key
        st.integers(0, 20),                      # ts (collisions likely)
        st.integers(0, 10_000),                  # id (tiebreak)
        st.sampled_from(["a", "b", "c", None]),  # attr incl. NULL states
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(row, min_size=1, max_size=40, unique_by=lambda r: r[2]))
    def run(rows):
        df = spark.createDataFrame(rows, "k long, ts long, id long, attr string")
        got = {
            (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_history(df, ["k"], "ts", ["attr"], ["id"]).collect()
        }
        assert got == _scd2_reference(rows)

    run()


def test_weighted_sample_weight_monotone(spark):
    """Raising a row's weight can only improve its rank (-ln(u)/w is
    decreasing in w with u fixed): a row sampled at weight w stays
    sampled at any larger weight, all else equal."""
    from dads_spark.ops import weighted_sample

    base = [("g", i, 1.0) for i in range(60)]
    df1 = spark.createDataFrame(base, "k string, id long, w double")
    first = {r["id"] for r in weighted_sample(df1, ["k"], "id", "w", 12).collect()}
    victim = sorted(first)[0]
    boosted = [("g", i, 50.0 if i == victim else 1.0) for i in range(60)]
    df2 = spark.createDataFrame(boosted, "k string, id long, w double")
    second = {r["id"] for r in weighted_sample(df2, ["k"], "id", "w", 12).collect()}
    assert victim in second


def test_asof_dimension_join_point_in_time(spark):
    from dads_spark.ops import asof_dimension_join, scd2_history

    # dimension updates: user 1 is 'bronze' from t=10, 'gold' from t=50
    dim_updates = spark.createDataFrame(
        [(1, 10, 1, "bronze"), (1, 50, 2, "gold"), (2, 30, 3, "silver")],
        "user_id long, tus long, event_id long, plan string",
    )
    dim = scd2_history(
        dim_updates, ["user_id"], "tus", ["plan"], tiebreak_cols=["event_id"]
    )
    facts = spark.createDataFrame(
        [
            (100, 1, 5),    # before any state -> NULL (left join)
            (101, 1, 10),   # boundary: valid_from inclusive -> bronze
            (102, 1, 49),   # last tick of bronze
            (103, 1, 50),   # boundary: valid_to exclusive -> gold
            (104, 1, 99),   # open interval -> gold
            (105, 2, 40),   # other user -> silver
            (106, 3, 40),   # unknown user -> NULL
        ],
        "event_id long, user_id long, tus long",
    )
    out = {
        r["event_id"]: r["plan"]
        for r in asof_dimension_join(facts, dim, ["user_id"], "tus").collect()
    }
    assert out == {
        100: None,
        101: "bronze",
        102: "bronze",
        103: "gold",
        104: "gold",
        105: "silver",
        106: None,
    }


def test_asof_dimension_join_matches_at_most_once(spark):
    import random

    from dads_spark.ops import asof_dimension_join, scd2_history

    rng = random.Random(3)
    ups, facts = [], []
    eid = 0
    for u in range(20):
        t = 0
        for _ in range(rng.randint(1, 6)):
            t += rng.randint(1, 20)
            ups.append((u, t, eid, rng.choice("abc")))
            eid += 1
        for _ in range(5):
            facts.append((eid, u, rng.randint(0, 150)))
            eid += 1
    dim = scd2_history(
        spark.createDataFrame(ups, "user_id long, tus long, event_id long, s string"),
        ["user_id"], "tus", ["s"], tiebreak_cols=["event_id"],
    )
    f = spark.createDataFrame(facts, "event_id long, user_id long, tus long")
    out = asof_dimension_join(f, dim, ["user_id"], "tus")
    # SCD2 intervals are disjoint: LEFT join emits exactly one row per fact
    assert out.count() == len(facts)
    assert out.select("event_id").distinct().count() == len(facts)
