"""IR ranking metrics (nDCG/MRR/P@k/R@k), vocabulary-coverage
estimators, term dispersion — hand-computed small cases."""

from __future__ import annotations

import math

from dads_spark.ops import ranking_metrics, term_dispersion, vocab_coverage


def _ranked(spark, rows):
    # rows: (query, rank, rel)
    return spark.createDataFrame(
        rows, schema="q string, rank long, rel long"
    )


def test_ranking_metrics_perfect_ranking(spark):
    rows = [("a", 1, 2), ("a", 2, 1), ("a", 3, 0)]
    r = ranking_metrics(_ranked(spark, rows), "q", "rank", "rel", k=10).collect()[0]
    assert r.ndcg_at_k_q6 == 1_000_000  # ranker order == ideal order
    assert r.mrr_q6 == 1_000_000
    assert r.n_rel == 2 and r.r_at_k_q6 == 1_000_000
    assert r.p_at_k_q6 == 200_000  # 2 hits / k=10


def test_ranking_metrics_inverted_ranking(spark):
    # relevant item ranked last of 3: MRR = 1/3
    rows = [("a", 1, 0), ("a", 2, 0), ("a", 3, 1)]
    r = ranking_metrics(_ranked(spark, rows), "q", "rank", "rel", k=10).collect()[0]
    assert r.mrr_q6 == 333_333
    # DCG = 1/log2(4), IDCG = 1/log2(2) = 1 -> ndcg = 0.5
    assert r.ndcg_at_k_q6 == 500_000


def test_ranking_metrics_no_relevant(spark):
    rows = [("a", 1, 0), ("a", 2, 0)]
    r = ranking_metrics(_ranked(spark, rows), "q", "rank", "rel", k=10).collect()[0]
    assert r.mrr_q6 is None and r.ndcg_at_k_q6 is None
    assert r.r_at_k_q6 is None and r.p_at_k_q6 == 0


def test_ranking_metrics_cutoff_excludes_deep_hits(spark):
    rows = [("a", i, 0) for i in range(1, 11)] + [("a", 11, 2)]
    r = ranking_metrics(_ranked(spark, rows), "q", "rank", "rel", k=10).collect()[0]
    assert r.p_at_k_q6 == 0 and r.r_at_k_q6 == 0
    assert r.mrr_q6 == round(1e6 / 11)
    assert r.ndcg_at_k_q6 == 0  # the only gain sits past the cutoff


def test_ranking_metrics_graded_dcg_value(spark):
    # ranker: rel (1, 2) at ranks (1, 2); ideal: (2, 1)
    rows = [("a", 1, 1), ("a", 2, 2)]
    r = ranking_metrics(_ranked(spark, rows), "q", "rank", "rel", k=10).collect()[0]
    dcg = 1.0 / math.log2(2) + 3.0 / math.log2(3)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3)
    assert r.ndcg_at_k_q6 == math.floor(abs(1e6 * dcg / idcg) + 0.5)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        schema="doc_id long, text string, lang string",
    )


def test_vocab_coverage_spectrum(spark):
    # tokens: a a a b b c d -> vocab 4, N 7, N1 = {c, d} = 2, N2 = {b} = 1
    df = _docs(spark, ["a a a b", "b c d"])
    r = vocab_coverage(df, ["lang"], "text").collect()[0]
    assert (r.vocab, r.n_tokens, r.n1_hapax, r.n2_dis) == (4, 7, 2, 1)
    assert r.gt_unseen_q6 == round(1e6 * 2 / 7)
    # chao1 = 4 + 2*1/(2*2) = 4.5
    assert r.chao1_q6 == 4_500_000


def test_vocab_coverage_all_hapax(spark):
    df = _docs(spark, ["a b c"])
    r = vocab_coverage(df, ["lang"], "text").collect()[0]
    assert r.n1_hapax == 3 and r.n2_dis == 0
    assert r.gt_unseen_q6 == 1_000_000  # every token seen once
    # chao1 = 3 + 3*2/2 = 6
    assert r.chao1_q6 == 6_000_000


def test_term_dispersion_bursty_vs_flat(spark):
    # 'the' appears once in each of 4 docs (flat); 'zebra' 4x in one doc
    df = _docs(spark, ["the zebra zebra zebra zebra", "the", "the", "the"])
    out = {r.term: r for r in term_dispersion(df, "text", "doc_id", 10).collect()}
    the, z = out["the"], out["zebra"]
    assert the.doc_freq == 4 and the.total_count == 4 and the.sum_sq == 4
    assert z.doc_freq == 1 and z.total_count == 4 and z.sum_sq == 16
    assert the.burst_q6 == 1_000_000 and z.burst_q6 == 4_000_000
    # flat: var = (4 - 16/4)/3 = 0 -> fano 0; bursty: var = (16-4)/3 = 4,
    # mean = 1 -> fano 4
    assert the.fano_q6 == 0 and z.fano_q6 == 4_000_000


def test_term_dispersion_top_n_bound(spark):
    df = _docs(spark, ["a b c d e f g h"])
    out = term_dispersion(df, "text", "doc_id", top_n=3).collect()
    assert len(out) == 3
    assert sorted(r.term for r in out) == ["a", "b", "c"]  # tie -> term asc
    assert all(r.fano_q6 is None for r in out)  # n_docs = 1: var undefined
