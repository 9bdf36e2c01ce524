"""RAKE keyword extraction tests: hand-computed scores, delimiter and
stopword-run semantics, determinism."""

from __future__ import annotations


def test_rake_hand_computed_scores(spark):
    from dads_spark.ops import rake_keywords

    # candidates: "deep learning", "deep networks", "fast deep learning"
    # freq: deep 3, learning 2, networks 1, fast 1
    # deg:  deep 2+2+3=7, learning 2+3=5, networks 2, fast 3
    doc = "deep learning of deep networks and fast deep learning"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    got = {
        r["phrase"]: r
        for r in rake_keywords(df, top_k=10).collect()
    }
    s_deep = 7 * 1_000_000 // 3
    s_learning = 5 * 1_000_000 // 2
    assert got["fast deep learning"]["score_u"] == 3_000_000 + s_deep + s_learning
    assert got["deep learning"]["score_u"] == s_deep + s_learning
    assert got["deep networks"]["score_u"] == s_deep + 2_000_000
    assert got["fast deep learning"]["rank"] == 1
    assert got["fast deep learning"]["n_words"] == 3
    assert got["deep learning"]["occurrences"] == 1  # embedded run not counted


def test_rake_punctuation_is_a_delimiter(spark):
    from dads_spark.ops import rake_keywords

    df = spark.createDataFrame(
        [(1, "alpha beta. gamma")], "doc_id long, text string"
    )
    phrases = {r["phrase"] for r in rake_keywords(df, top_k=10).collect()}
    assert phrases == {"alpha beta", "gamma"}


def test_rake_adjacent_stopword_runs(spark):
    from dads_spark.ops import rake_keywords

    # 'of the and' is a 3-run; one replace pass cannot consume it all
    df = spark.createDataFrame(
        [(1, "red fox of the and blue crow")], "doc_id long, text string"
    )
    phrases = {r["phrase"] for r in rake_keywords(df, top_k=10).collect()}
    assert phrases == {"red fox", "blue crow"}


def test_rake_repeated_phrase_counts_occurrences(spark):
    from dads_spark.ops import rake_keywords

    df = spark.createDataFrame(
        [(1, "hot soup. hot soup. cold tea")], "doc_id long, text string"
    )
    got = {r["phrase"]: r for r in rake_keywords(df, top_k=10).collect()}
    assert got["hot soup"]["occurrences"] == 2
    assert got["cold tea"]["occurrences"] == 1
    # hot/soup freq 2, deg 4 each -> word score 2e6; phrase 4e6
    assert got["hot soup"]["score_u"] == 4_000_000
