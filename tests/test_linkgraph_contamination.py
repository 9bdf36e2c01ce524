"""Unit tests for the link-graph (extract/edges/pagerank) and
train/test contamination operators, plus the new text/TS analytics
(token_entropy, vocab_oov, autocorrelation) against closed forms."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from dads_spark.ops import (
    contamination_report,
    domain_edges,
    extract_links,
    pagerank,
    token_entropy,
    vocab_oov,
)
from dads_spark.rollup import autocorrelation


# ---------------------------------------------------------------- linkgraph

def test_extract_links_regex(spark):
    df = spark.createDataFrame(
        [
            (1, '<a href="https://a.com/x">l</a> <a href=\'http://b.org/y\'>m</a>'),
            (2, '<a href="/relative/path">rel</a>'),  # relative: ignored
            (3, "no links at all"),
            (4, '<a href="https://c.net/p?q=1">z</a> trailing'),
        ],
        "doc_id long, html string",
    )
    got = sorted(
        (r.doc_id, r.link_url)
        for r in extract_links(df, "html", "doc_id").collect()
    )
    assert got == [
        (1, "http://b.org/y"),
        (1, "https://a.com/x"),
        (4, "https://c.net/p?q=1"),
    ]


def test_domain_edges_drops_self_loops_and_dedups(spark):
    links = spark.createDataFrame(
        [
            ("a.com", "https://B.org/x"),   # host lowercased
            ("a.com", "https://b.org/y"),   # same edge -> dedup
            ("a.com", "https://a.com/self"),  # self loop -> dropped
            ("b.org", "https://a.com/z"),
        ],
        "src_domain string, link_url string",
    )
    got = sorted(
        (r.src, r.dst) for r in domain_edges(links).collect()
    )
    assert got == [("a.com", "b.org"), ("b.org", "a.com")]


def _numpy_pagerank(edges, iters, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = pr[out == 0].sum()
        nxt += d * dangling / n
        for u, v in edges:
            nxt[idx[v]] += d * pr[idx[u]] / out[idx[u]]
        pr = nxt
    return dict(zip(nodes, pr))


def test_pagerank_matches_numpy_with_dangling(spark):
    # c and d are dangling (no out-edges) — the redistribution term matters
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("e", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.pr for r in pagerank(df, iterations=4).collect()}
    want = _numpy_pagerank(edges, 4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    # rank mass is conserved under dangling redistribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_sink_gains_rank(spark):
    # everything points at 'hub' -> hub must out-rank every spoke
    df = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        "src string, dst string",
    )
    got = {r.node: r.pr for r in pagerank(df, iterations=5).collect()}
    assert got["hub"] > max(v for k, v in got.items() if k != "hub")


# ------------------------------------------------------------ contamination

def test_contamination_planted_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "test"),
            (2, "a quick brown fox runs away", "train"),   # shares 2 grams
            (3, "totally different words here now", "train"),  # clean
            (4, "xx yy", "train"),                          # < n tokens
        ],
        "doc_id long, text string, split string",
    )
    got = {
        r.doc_id: r.n_hit_grams
        for r in contamination_report(docs, "split", n=3).collect()
    }
    # doc 2's grams include 'quick brown fox' (hit) and 'brown fox runs'
    # (no hit — test doc has 'brown fox jumps'): exactly one overlap
    assert got == {2: 1}


def test_contamination_counts_distinct_grams_once(spark):
    docs = spark.createDataFrame(
        [
            (1, "p q r", "test"),
            (2, "p q r p q r p q r", "train"),  # gram repeats in-doc
        ],
        "doc_id long, text string, split string",
    )
    got = {
        r.doc_id: r.n_hit_grams
        for r in contamination_report(docs, "split", n=3).collect()
    }
    assert got == {2: 1}  # 'p q r' counted once despite 3 occurrences


# ------------------------------------------------------- entropy / oov / acf

def test_token_entropy_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "u v w x")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in token_entropy(docs).collect()}
    # doc1: p = (2/3, 1/3) -> H = ln3 - (2 ln2)/3
    assert got[1].n_tokens == 3 and got[1].distinct_tokens == 2
    assert got[1].entropy == pytest.approx(
        math.log(3) - 2 * math.log(2) / 3, abs=1e-12
    )
    # doc2: uniform over 4 -> H = ln 4
    assert got[2].entropy == pytest.approx(math.log(4), abs=1e-12)


def test_vocab_oov_ranking_and_ties(spark):
    # counts: b=3, a=2, c=2, z=1; V=2 -> vocab {b, a} (tie a-vs-c broken
    # lexically: a < c)
    docs = spark.createDataFrame(
        [(1, "b b a c"), (2, "b a c z")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in vocab_oov(docs, 2).collect()}
    assert got[1].oov_frac == pytest.approx(0.25)  # c of 4
    assert got[2].oov_frac == pytest.approx(0.5)   # c, z of 4


def test_autocorrelation_linear_ramp(spark):
    import pandas as pd

    # one event per hour, value = t -> hourly sums form a linear ramp, and
    # corr(linear, lagged linear) == 1 exactly at every lag
    pdf = pd.DataFrame(
        {
            "event_type": ["a"] * 48,
            "ts": pd.date_range("2024-01-01", periods=48, freq="h"),
            "value": np.arange(48, dtype=float),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r.lag: r
        for r in autocorrelation(df, "event_type", "ts", "value", 3).collect()
    }
    assert set(got) == {1, 2, 3}
    for k in got:
        assert got[k].acf == pytest.approx(1.0, abs=1e-9)
        assert got[k].n_buckets == 48


def test_autocorrelation_alternating_series(spark):
    import pandas as pd

    # +1/-1 alternation: ACF(1) = -1, ACF(2) = +1
    pdf = pd.DataFrame(
        {
            "event_type": ["a"] * 40,
            "ts": pd.date_range("2024-01-01", periods=40, freq="h"),
            "value": [1.0, -1.0] * 20,
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r.lag: r.acf
        for r in autocorrelation(df, "event_type", "ts", "value", 2).collect()
    }
    assert got[1] == pytest.approx(-1.0, abs=1e-9)
    assert got[2] == pytest.approx(1.0, abs=1e-9)


def test_seasonal_decompose_constant_series(spark):
    import pandas as pd

    from dads_spark.rollup import seasonal_decompose

    pdf = pd.DataFrame(
        {
            "event_type": ["a"] * 60,
            "ts": pd.date_range("2024-01-01", periods=60, freq="h"),
            "value": [5.0] * 60,
        }
    )
    out = seasonal_decompose(
        spark.createDataFrame(pdf), "event_type", "ts", "value"
    ).toPandas()
    # constant series: trend == v, seasonal == 0, residual == 0 exactly
    assert (out["trend"] == 5.0).all()
    assert (out["seasonal"] == 0.0).all()
    assert (out["residual"] == 0.0).all()


def test_seasonal_decompose_additivity(spark):
    import pandas as pd

    from dads_spark.rollup import seasonal_decompose

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "event_type": ["a"] * 96,
            "ts": pd.date_range("2024-01-01", periods=96, freq="h"),
            "value": rng.normal(10, 3, 96),
        }
    )
    out = seasonal_decompose(
        spark.createDataFrame(pdf), "event_type", "ts", "value"
    ).toPandas()
    recon = out["trend"] + out["seasonal"] + out["residual"]
    assert np.allclose(recon, out["v"], atol=3e-6)  # 6-dp rounding only


def test_inverted_index_postings(spark):
    from dads_spark.ops import inverted_index

    docs = spark.createDataFrame(
        [(3, "x y x"), (1, "x z"), (2, "y w")],
        "doc_id long, text string",
    )
    got = {
        r.term: r for r in inverted_index(docs, min_df=2).collect()
    }
    assert set(got) == {"x", "y"}  # z, w are hapax -> pruned
    assert got["x"].doc_freq == 2 and got["x"].total_tf == 3
    assert got["x"].postings == "1,3"  # sorted doc ids
    assert got["y"].postings == "2,3"


def test_anchor_terms_hand_computed(spark):
    from dads_spark.ops import anchor_terms

    rows = [
        ('<a href="https://x.com/a">big cats</a>'
         '<a href="http://y.org/b">small cats</a>',),
        ("<a href='https://X.com/c'>big dogs</a>no link here",),
        ("<p>nothing</p>",),
    ]
    df = spark.createDataFrame(rows, "html string")
    got = {
        (r["dst_domain"], r["term"]): (r["n"], r["rank"])
        for r in anchor_terms(df, "html", top_k=2).collect()
    }
    # x.com: big x2 (rank 1), cats/dogs x1 (rank 2 = cats on term tiebreak)
    assert got[("x.com", "big")] == (2, 1)
    assert got[("x.com", "cats")] == (1, 2)
    assert ("x.com", "dogs") not in got  # rank 3 cut by top_k=2
    assert got[("y.org", "cats")] == (1, 1)
    assert got[("y.org", "small")] == (1, 2)


def test_hits_hand_computed(spark):
    """a->b, a->c, b->c: 3 unnormalized rounds give Fibonacci-flavored
    exact integers (worked by hand: auth = {b:8, c:13}, hub = {a:21, b:13})."""
    from dads_spark.ops import hits

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {r["node"]: (r["auth"], r["hub"]) for r in hits(edges, 3).collect()}
    assert got == {"a": (0, 21), "b": (8, 13), "c": (13, 0)}


def test_covisitation_weights_and_heavy_user_cut(spark):
    from dads_spark.ops import covisitation

    rows = [
        # users 1..3 each touch items (1,2): pair weight 3
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 2), (3, 3),
        # user 4 touches items 2,3: pair (2,3) weight 2 (with user 3)
        (4, 2), (4, 3),
        # heavy user 9 touches 5 items (> cap 4): contributes nothing
        (9, 1), (9, 2), (9, 3), (9, 4), (9, 5),
        # duplicates collapse before pairing
        (1, 1), (1, 2),
    ]
    df = spark.createDataFrame(rows, "user_id long, item long")
    out = {
        (r["item_a"], r["item_b"]): r["weight"]
        for r in covisitation(
            df, "user_id", "item", max_items_per_user=4, min_weight=2
        ).collect()
    }
    assert out == {(1, 2): 3, (2, 3): 2}  # (1,3) weight 1 pruned; user 9 cut


def test_covisitation_partition_invariant(spark):
    from dads_spark.ops import covisitation

    rows = [(u, (u * 7 + i) % 10) for u in range(30) for i in range(4)]
    df = spark.createDataFrame(rows, "user_id long, item long")
    a = sorted(tuple(r) for r in covisitation(df.repartition(1), "user_id", "item", min_weight=1).collect())
    b = sorted(tuple(r) for r in covisitation(df.repartition(7), "user_id", "item", min_weight=1).collect())
    assert a == b and len(a) > 0


# --------------------------------------------------------------- trustrank
def _numpy_trustrank(edges, seeds, iters, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    s = np.zeros(n)
    for u in seeds:
        s[idx[u]] = 1.0 / len(seeds)
    tr = s.copy()
    for _ in range(iters):
        dangling = tr[out == 0].sum()
        nxt = (1 - d) * s + d * dangling * s
        for u, v in edges:
            nxt[idx[v]] += d * tr[idx[u]] / out[idx[u]]
        tr = nxt
    return dict(zip(nodes, tr))


def test_trustrank_matches_numpy(spark):
    from dads_spark.ops import trustrank

    # c dangling; seed set {a, c} so dangling mass returns to the seeds
    edges = [("a", "b"), ("b", "c"), ("e", "a"), ("e", "c"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("c",)], "node string")
    got = {r.node: r.tr for r in trustrank(df, seeds, iterations=4).collect()}
    want = _numpy_trustrank(edges, ["a", "c"], 4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    # trust mass is conserved (teleport + dangling both land on seeds)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_trustrank_starves_unreachable_spam(spark):
    from dads_spark.ops import trustrank

    # spam ring never linked from the trusted component
    edges = [("good", "shop"), ("shop", "good"),
             ("spam1", "spam2"), ("spam2", "spam1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("good",)], "node string")
    got = {r.node: r.tr for r in trustrank(df, seeds, iterations=3).collect()}
    assert got["spam1"] == 0.0 and got["spam2"] == 0.0
    assert got["good"] > 0 and got["shop"] > 0
    with pytest.raises(ValueError):
        trustrank(df, seeds.limit(0), iterations=1).collect()


# ------------------------------------------------------------ core_numbers
def test_core_numbers_known_shapes(spark):
    from dads_spark.ops import core_numbers

    # a 4-clique (core 3) with a pendant chain (core 1)
    cl = ["c1", "c2", "c3", "c4"]
    edges = [(u, v) for i, u in enumerate(cl) for v in cl[i + 1:]]
    edges += [("c1", "p1"), ("p1", "p2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.core for r in core_numbers(df).collect()}
    assert {got[n] for n in cl} == {3}
    assert got["p1"] == 1 and got["p2"] == 1


def test_core_numbers_matches_peel_on_random_graph(spark):
    from dads_spark.oracles import core_numbers_oracle
    from dads_spark.ops import core_numbers

    rng = np.random.default_rng(21)
    nodes = ["n%02d" % i for i in range(40)]
    edges = sorted(
        {
            (nodes[min(a, b)], nodes[max(a, b)])
            for a, b in rng.integers(0, 40, (260, 2))
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.core for r in core_numbers(df).collect()}
    assert got == core_numbers_oracle(edges)
