"""Published LLM-corpus quality-filter suites (ops/quality.py): Gopher
document rules, C4 line cleaning, CCNet perplexity terciles, SemDeDup
embedding-space dedup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dads_spark.ops import c4_clean, gopher_rules, perplexity_buckets, semdedup


# ---------------------------------------------------------------------------
# gopher_rules
# ---------------------------------------------------------------------------

GOOD = " ".join(
    ["the", "be", "to", "of"] + ["word"] * 56
)  # 60 words, mean len ~4, 4 stopwords


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_good_doc_keeps(spark):
    out = gopher_rules(_docs(spark, [(1, GOOD)])).first()
    assert out["n_words"] == 60
    for f in (
        "flag_word_count",
        "flag_mean_word_len",
        "flag_symbol_ratio",
        "flag_bullet_lines",
        "flag_ellipsis_lines",
        "flag_alpha_words",
        "flag_stopwords",
        "keep",
    ):
        assert out[f] is True, f


@pytest.mark.parametrize(
    "text,failing_flag",
    [
        # 10 words < min_words=50
        ("the be " + " ".join(["w"] * 8), "flag_word_count"),
        # mean word length 1 < 3 (60 one-char words)
        ("a " * 59 + "a", "flag_mean_word_len"),
        # 60 words, 12 '#' symbols -> 10*12 > 60
        (GOOD + " " + "# # # # # # # # # # # #", "flag_symbol_ratio"),
        # every line is a bullet -> 10*n >= 9*n
        ("\n".join(["- " + GOOD] * 3), "flag_bullet_lines"),
        # every line ends with ... -> 10*n > 3*n
        ("\n".join([GOOD + "..."] * 2), "flag_ellipsis_lines"),
        # 80 words, 20 numeric tokens -> alpha 60/80 < 4/5
        (GOOD + " " + " ".join(["123"] * 20), "flag_alpha_words"),
        # only one distinct required stopword
        ("the " + " ".join(["word"] * 59), "flag_stopwords"),
    ],
)
def test_gopher_each_rule_fires(spark, text, failing_flag):
    out = gopher_rules(_docs(spark, [(1, text)])).first()
    assert out[failing_flag] is False
    assert out["keep"] is False


def test_gopher_mean_word_len_integer_sandwich(spark):
    # mean exactly 3.0 (inclusive lower bound): 2 words of length 3
    out = gopher_rules(
        _docs(spark, [(1, "abc def")]), min_words=1
    ).first()
    assert out["flag_mean_word_len"] is True
    # mean just under 3: "ab def" -> 5 chars / 2 words
    out = gopher_rules(_docs(spark, [(1, "ab def")]), min_words=1).first()
    assert out["flag_mean_word_len"] is False


# ---------------------------------------------------------------------------
# c4_clean
# ---------------------------------------------------------------------------

L_OK = "this line has at least five words."
L_SHORT = "too short line."
L_NOPUNCT = "this line has no terminal punctuation at all"
L_JS = "please enable javascript to view this page."


def test_c4_line_rules_and_byte_exact_text(spark):
    text = "\n".join([L_OK, L_SHORT, L_NOPUNCT, L_JS, L_OK, L_OK])
    out = c4_clean(_docs(spark, [(1, text)])).first()
    assert out["n_lines"] == 6
    assert out["n_kept_lines"] == 3
    assert out["keep_doc"] is True
    assert out["clean_text"] == "\n".join([L_OK, L_OK, L_OK])  # byte-exact


def test_c4_doc_level_drops(spark):
    base = "\n".join([L_OK] * 3)
    rows = [
        (1, base),                           # keeps
        (2, base + "\nwe love Lorem Ipsum filler."),  # lorem ipsum
        (3, base + "\nif (x) { return; }"),  # '{'
        (4, "\n".join([L_OK] * 2)),          # only 2 kept lines
    ]
    out = {r["doc_id"]: r for r in c4_clean(_docs(spark, rows)).collect()}
    assert out[1]["keep_doc"] is True
    assert out[2]["keep_doc"] is False
    assert out[3]["keep_doc"] is False
    assert out[4]["keep_doc"] is False
    # line filtering still reported for dropped docs
    assert out[2]["n_kept_lines"] == 4


# ---------------------------------------------------------------------------
# perplexity_buckets
# ---------------------------------------------------------------------------


def _lang_corpus(spark):
    rows = []
    did = 0
    # 'common common ...' docs are low-surprisal; docs with rare tokens high
    for lang, n in (("en", 9), ("de", 7)):
        for i in range(n):
            toks = ["common"] * 8 + [f"rare_{lang}_{i}"] * (i % 4)
            rows.append((did, " ".join(toks), lang))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_perplexity_buckets_split_and_order(spark):
    docs = _lang_corpus(spark)
    out = perplexity_buckets(docs).toPandas()
    for lang, n in (("en", 9), ("de", 7)):
        sub = out[out["lang"] == lang]
        sizes = sub["bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1  # ntile balance
        assert set(sub["bucket_name"]) == {"head", "middle", "tail"}
        # head bucket has the lowest surprisal scores in the language
        assert (
            sub[sub["bucket_name"] == "head"]["avg_neglp_q6"].max()
            <= sub[sub["bucket_name"] == "tail"]["avg_neglp_q6"].min()
        )


def test_perplexity_buckets_partition_invariant(spark):
    docs = _lang_corpus(spark)
    a = perplexity_buckets(docs.repartition(1)).toPandas()
    b = perplexity_buckets(docs.repartition(7)).toPandas()
    key = ["doc_id", "lang", "avg_neglp_q6", "bucket", "bucket_name"]
    pd.testing.assert_frame_equal(
        a[key].sort_values("doc_id").reset_index(drop=True),
        b[key].sort_values("doc_id").reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------


def _emb_df(spark, ids, vecs):
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": [v.astype(np.float32) for v in vecs]}
    )
    return spark.createDataFrame(pdf, "vec_id long, embedding array<float>")


def _synth_vectors(n=96, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, dim)
    # plant near-dup pairs: vec[i+1] = vec[i] + tiny noise for i in 0,10,20
    for i in (0, 10, 20):
        base[i + 1] = base[i] + rng.randn(dim) * 1e-3
    return np.arange(n, dtype=np.int64), base


def test_semdedup_parity_with_oracle(spark):
    from dads_spark.oracles import semdedup_oracle

    ids, vecs = _synth_vectors()
    got = (
        semdedup(_emb_df(spark, ids, vecs), tau_q6=990_000, n_clusters=4)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        semdedup_oracle(ids, vecs, tau_q6=990_000, n_clusters=4),
        columns=["vec_id", "cluster", "dropped", "witness_id"],
    ).sort_values("vec_id").reset_index(drop=True)
    assert list(got["cluster"]) == list(want["cluster"])
    assert list(got["dropped"]) == list(want["dropped"])
    gw = got["witness_id"].fillna(-1).astype(int)
    ww = want["witness_id"].fillna(-1).astype(int)
    assert list(gw) == list(ww)


def test_semdedup_drops_planted_pairs_keep_first(spark):
    ids, vecs = _synth_vectors()
    out = (
        semdedup(_emb_df(spark, ids, vecs), tau_q6=990_000, n_clusters=4)
        .toPandas()
        .set_index("vec_id")
    )
    for i in (0, 10, 20):
        assert not out.loc[i, "dropped"]  # lower id kept
        assert out.loc[i + 1, "dropped"]  # near-dup dropped
        assert int(out.loc[i + 1, "witness_id"]) == i
    assert int(out["dropped"].sum()) == 3  # nothing else is that close


def test_semdedup_partition_invariant(spark):
    ids, vecs = _synth_vectors()
    df = _emb_df(spark, ids, vecs)
    a = (
        semdedup(df.repartition(1), tau_q6=990_000, n_clusters=4)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        semdedup(df.repartition(5), tau_q6=990_000, n_clusters=4)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# readability_scores
# ---------------------------------------------------------------------------


def test_readability_hand_computed(spark):
    import math

    from dads_spark.ops import readability_scores

    text = "the cat sat. the dog ran! was it fast?"
    # words=9, sentences=3, vowel groups: e,a,a,e,o,a,a,i,a = 9
    out = readability_scores(_docs(spark, [(1, text)])).first()
    assert out["n_words"] == 9
    assert out["n_sentences"] == 3
    assert out["n_syllables"] == 9
    score = 206.835 - 1.015 * (9 / 3) - 84.6 * (9 / 9)
    want = int(math.copysign(math.floor(abs(score) * 1e3 + 0.5), score))
    assert out["flesch_q3"] == want


def test_readability_no_punctuation_min_one_sentence(spark):
    from dads_spark.ops import readability_scores

    out = readability_scores(_docs(spark, [(1, "aa bb cc")])).first()
    assert out["n_sentences"] == 1
    # polysyllabic gibberish scores LOWER (harder) than simple prose
    hard = readability_scores(
        _docs(spark, [(1, "extraordinary unbelievable onomatopoeia.")])
    ).first()
    easy = readability_scores(_docs(spark, [(1, "the cat sat on a mat.")])).first()
    assert hard["flesch_q3"] < easy["flesch_q3"]


def test_hashed_linear_score_exact_logit(spark):
    from dads_spark.ops import hashed_linear_score

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc")], "doc_id long, text string"
    )
    # explicit 1-bucket weight table: every token maps somewhere in
    # [0, 256) — use a full table with weight 7 to make the logit
    # trivially checkable: logit = 7 * n_tokens
    wt = spark.createDataFrame(
        [(b, 7) for b in range(256)], "b long, w long"
    )
    rows = {
        r["doc_id"]: r
        for r in hashed_linear_score(docs, weights=wt, threshold=20).collect()
    }
    assert rows[1]["n_tokens"] == 3 and rows[1]["logit"] == 21
    assert rows[2]["n_tokens"] == 1 and rows[2]["logit"] == 7
    assert rows[1]["keep"] is True and rows[2]["keep"] is False


def test_hashed_linear_default_fixture_is_deterministic(spark):
    from dads_spark.ops import hashed_linear_score

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "jumps over the lazy dog")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["logit"]
         for r in hashed_linear_score(docs).collect()}
    b = {r["doc_id"]: r["logit"]
         for r in hashed_linear_score(docs).collect()}
    assert a == b and set(a) == {1, 2}
