"""Distributed BPE tokenizer training and encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"), the
standard subword vocabulary builder every LLM data pipeline runs before
token counting / sequence packing.

Scale shape — the part that matters at 100 TB:

- ``bpe_train`` pays ONE corpus-sized shuffle (word-frequency count);
  every merge iteration after that runs on the DISTINCT-WORD table only
  (vocab-sized: millions of rows at web scale, never the corpus). Pair
  counting is an explode + map-side-partial sum over that skinny table;
  the per-iteration driver sync collects exactly one row (the argmax
  pair), matching the reference's own master merge points. The merge
  application is a pure Catalyst ``aggregate`` higher-order fold — no
  Python anywhere in the loop — and lineage is cut with localCheckpoint
  every few rounds (the components.py/linkgraph.py iterative-plan rule).
- ``bpe_encode`` replays the learned merges in rank order as chained
  codegen projections over the corpus: map-only, zero shuffles, the
  classic greedy-leftmost non-overlapping merge fold per word.

Determinism: the argmax tie-break is (count DESC, left ASC, right ASC)
on exact integer counts, so the learned merge table is a pure function
of the input corpus under any partitioning — the scalar oracle
(dads_spark.oracles.bpe_train_oracle) reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bpe_train", "bpe_encode", "word_frequencies"]


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized shuffle.
    Empty tokens (consecutive spaces) are dropped, mirroring the oracle."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_fold(col, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of adjacent (left,right)
    symbol pairs, as a single Catalyst aggregate fold. The merged symbol
    is strictly longer than ``left``, so a symbol produced by THIS fold
    can never re-match as ``left`` — one pass is exact."""
    return F.aggregate(
        col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns a DataFrame (rank, left, right, merged, pair_count) with one
    row per learned merge, rank starting at 1 in learning order. Stops
    early when the best remaining pair occurs fewer than
    ``min_pair_count`` times.
    """
    spark = docs.sparkSession
    # vocab as symbol arrays: split("", per-char) — the '' regex yields one
    # element per character in Spark 3+/4
    vocab = (
        word_frequencies(docs, text_col)
        .select(F.split("word", "").alias("syms"), "cnt")
        .localCheckpoint(eager=True)
    )

    learned: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.expr("slice(syms, 1, size(syms) - 1)"),
                        F.expr("slice(syms, 2, size(syms) - 1)"),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if not best or best[0]["n"] < min_pair_count:
            break
        lv, rv, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        learned.append((rank, lv, rv, lv + rv, n))
        vocab = vocab.withColumn("syms", _merge_fold("syms", lv, rv))
        if rank % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)

    return spark.createDataFrame(
        learned or [],
        "rank int, left string, right string, merged string, pair_count long",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize each document with a learned merge list (rank order).

    Returns (id, n_words, n_chars, n_bpe_tokens, compression_q6) where
    compression_q6 = floor(1e6 * n_chars / n_bpe_tokens + 0.5) — the
    chars-per-token ratio in integer micro-units (the fertility metric
    tokenizer evaluations report). Map-only and shuffle-free: every merge
    is one aggregate fold layer over the per-word symbol arrays, so the
    whole encode is a single projection pipeline over the scan; the
    expression tree grows linearly in the merge count (each layer wraps
    the previous once)."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda w: F.length(w) > 0
    )
    out = docs.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.transform(words, lambda w: F.split(w, "")).alias("wsyms"),
    )
    def _layer(lv: str, rv: str):
        # single-arg closure: F.transform reads the lambda's arity, so
        # captured values must not appear as (defaulted) parameters
        return lambda s: _merge_fold(s, lv, rv)

    for lv, rv in merges:
        out = out.withColumn("wsyms", F.transform("wsyms", _layer(lv, rv)))
    n_chars = F.aggregate(
        "wsyms",
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.aggregate(
            s, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ),
    )
    n_tok = F.aggregate(
        "wsyms", F.lit(0).cast("long"), lambda acc, s: acc + F.size(s)
    )
    return out.select(
        id_col,
        "n_words",
        n_chars.alias("n_chars"),
        n_tok.alias("n_bpe_tokens"),
        F.when(
            n_tok > 0,
            F.floor(F.lit(1e6) * n_chars / n_tok + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("compression_q6"),
    )
