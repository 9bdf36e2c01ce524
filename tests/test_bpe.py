"""Distributed BPE training/encoding (ops/bpe.py) and PMI collocation
mining (ops/textstats.py pmi_collocations)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dads_spark.ops import bpe_encode, bpe_train, pmi_collocations, word_frequencies
from dads_spark.oracles import bpe_encode_oracle, bpe_train_oracle

CORPUS = [
    "the cat sat on the mat",
    "the cats sat",
    "a cat and a mat and a hat",
    "batter batter butter",
    "aaa aaaa aa a",
    "low lower lowest newest newer new",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_train_parity_with_oracle(spark):
    got = [tuple(r) for r in bpe_train(_docs(spark), n_merges=16).orderBy("rank").collect()]
    want = bpe_train_oracle(CORPUS, n_merges=16)
    assert got == want
    # ranks are contiguous from 1 and merges are well-formed
    assert [g[0] for g in got] == list(range(1, len(got) + 1))
    for _, l, r, m, n in got:
        assert m == l + r and n >= 2


def test_bpe_train_partition_invariant(spark):
    docs = _docs(spark)
    a = [tuple(r) for r in bpe_train(docs.repartition(1), n_merges=10).orderBy("rank").collect()]
    b = [tuple(r) for r in bpe_train(docs.repartition(7), n_merges=10).orderBy("rank").collect()]
    assert a == b


def test_bpe_train_min_pair_count_stops_early(spark):
    # corpus where only one pair repeats: training stops after exhausting it
    docs = _docs(spark, ["ab ab", "cd ef"])
    got = [tuple(r) for r in bpe_train(docs, n_merges=10).collect()]
    want = bpe_train_oracle(["ab ab", "cd ef"], n_merges=10)
    assert got == want
    assert len(got) < 10  # stopped before the budget


def test_bpe_encode_greedy_leftmost_nonoverlap(spark):
    # merge (a,a): "aaa" -> [aa, a] (2 tokens), "aaaa" -> [aa, aa] (2)
    docs = _docs(spark, ["aaa aaaa aa a"])
    out = bpe_encode(docs, [("a", "a")]).first()
    # per word: aaa->2, aaaa->2, aa->1, a->1 => 6 tokens, 10 chars
    assert out["n_bpe_tokens"] == 6
    assert out["n_chars"] == 10
    assert out["n_words"] == 4
    assert out["compression_q6"] == math.floor(1e6 * 10 / 6 + 0.5)


def test_bpe_encode_parity_with_oracle(spark):
    merges = [(l, r) for _, l, r, _, _ in bpe_train_oracle(CORPUS, n_merges=16)]
    got = sorted(tuple(r) for r in bpe_encode(_docs(spark), merges).collect())
    want = sorted(bpe_encode_oracle(range(len(CORPUS)), CORPUS, merges))
    assert got == want


def test_bpe_encode_token_count_never_increases(spark):
    merges = [(l, r) for _, l, r, _, _ in bpe_train_oracle(CORPUS, n_merges=16)]
    base = {r["doc_id"]: r for r in bpe_encode(_docs(spark), []).collect()}
    enc = {r["doc_id"]: r for r in bpe_encode(_docs(spark), merges).collect()}
    for did in base:
        assert enc[did]["n_bpe_tokens"] <= base[did]["n_bpe_tokens"]
        assert enc[did]["n_chars"] == base[did]["n_chars"]  # merges lose nothing


def test_word_frequencies_drops_empty_tokens(spark):
    docs = _docs(spark, ["a  b", "a"])  # double space -> empty token
    wf = {r["word"]: r["cnt"] for r in word_frequencies(docs).collect()}
    assert wf == {"a": 2, "b": 1}


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_hand_computed(spark):
    # bigrams: (a,b) x3, (b,a) x2, (c,d) x3  => T=8
    texts = ["a b a b a b", "c d", "c d", "c d"]
    # doc1 bigrams: ab, ba, ab, ba, ab
    out = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(_docs(spark, texts), min_count=2).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a"), ("c", "d")}
    t = 8
    # margins from the bigram table: n_x = count as left, n_y = as right
    def pmi_q6(n_xy, n_x, n_y):
        return math.floor(
            (math.log(n_xy) + math.log(t) - math.log(n_x) - math.log(n_y))
            * 1e6
            + 0.5
        )

    assert out[("a", "b")]["n_xy"] == 3
    assert out[("a", "b")]["pmi_q6"] == pmi_q6(3, 3, 3)
    assert out[("b", "a")]["pmi_q6"] == pmi_q6(2, 2, 2)
    assert out[("c", "d")]["pmi_q6"] == pmi_q6(3, 3, 3)


def test_pmi_min_count_prunes(spark):
    texts = ["a b a b a b", "c d", "x y"]
    out = pmi_collocations(_docs(spark, texts), min_count=3).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("a", "b")}


def test_pmi_partition_invariant(spark):
    docs = _docs(spark)
    a = sorted(tuple(r) for r in pmi_collocations(docs.repartition(1), min_count=1).collect())
    b = sorted(tuple(r) for r in pmi_collocations(docs.repartition(5), min_count=1).collect())
    assert a == b


# ---------------------------------------------------------------------------
# index_delta_merge
# ---------------------------------------------------------------------------


def test_index_delta_merge_equals_from_scratch(spark):
    from dads_spark.ops import index_delta_merge, inverted_index

    old = _docs(
        spark,
        [
            "the cat sat",          # 0: unchanged
            "old text gone soon",   # 1: will change
            "removed doc entirely", # 2: gone in new
            "the dog ran",          # 3: unchanged
        ],
    )
    new = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "fresh replacement text"),
            (3, "the dog ran"),
            (9, "brand new document the"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r) for r in index_delta_merge(old, new, min_df=1).collect()
    )
    want = sorted(tuple(r) for r in inverted_index(new, min_df=1).collect())
    assert got == want and len(got) > 0


def test_index_delta_merge_identical_snapshots_noop(spark):
    from dads_spark.ops import index_delta_merge, inverted_index

    docs = _docs(spark, CORPUS)
    got = sorted(tuple(r) for r in index_delta_merge(docs, docs, min_df=2).collect())
    want = sorted(tuple(r) for r in inverted_index(docs, min_df=2).collect())
    assert got == want


def test_langid_confusion_cells(spark):
    from dads_spark.ops import langid_confusion

    rows = [
        (1, "the cat and the dog is here for it", "en"),   # en detected en
        (2, "der hund und die katze ist nicht da", "de"),  # de detected de
        (3, "the quick brown fox and the dog", "de"),      # declared de, detects en
        (4, "zzz qqq www", "en"),                          # no stopwords -> other
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r["lang"], r["pred_lang"]): r for r in langid_confusion(docs).collect()}
    assert out[("en", "en")]["n"] == 1
    assert out[("de", "de")]["n"] == 1
    assert out[("de", "en")]["n"] == 1
    assert out[("en", "other")]["n"] == 1
    # share: de split 500/500 permille
    assert out[("de", "de")]["share_permille"] == 500
    assert out[("en", "en")]["share_permille"] == 500
