"""Train/test contamination detection by token n-gram overlap.

The standard eval-hygiene check for LLM training corpora (cf. GPT-3's
13-gram and PaLM's 8-gram decontamination): a training document is
contaminated if it shares any length-n token sequence with a held-out
document. Exactness matters here — this is a *verification* operator run
before training, not a fuzzy-dedup heuristic, so it uses literal n-gram
strings rather than hashed sketches (hash the gram first at larger n if
the shuffle width ever dominates; equality semantics are unchanged).

Shape at scale: n-grams are built JVM-side (``transform`` over a
``sequence`` — the same codegen pattern as textstats.repetition_stats),
then de-duplicated per doc BEFORE the join so a gram repeated inside one
doc costs one row, not many. The join keys on the gram string: the
held-out side is tiny relative to the corpus (evals are small), so AQE
broadcast-joins it and the train corpus never reshuffles; if the held-out
side ever outgrows broadcast, it is still the smaller shuffle side. The
output is one row per contaminated train doc (hit counts), not per hit —
bounded by |train docs|.

Reference analog: none (DADS has no text surface); training-data-pipeline
suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _doc_grams(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct (id, gram) pairs; docs shorter than n tokens emit nothing."""
    toks = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("gram"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    split_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    test_value: str = "test",
) -> DataFrame:
    """One row per train doc sharing ≥1 token n-gram with any test doc.

    Columns: ``id_col``, ``n_hit_grams`` (distinct overlapping n-grams).
    Deterministic and engine-portable: literal string grams, exact
    distinct counts, no hashing, no sampling.
    """
    is_test = F.col(split_col) == test_value
    # two filtered scans beat one scan + id-join split: each side is a pure
    # map stage off the (column-pruned, filter-pushed) source read
    test_grams = (
        _doc_grams(docs.where(is_test), text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    train_grams = _doc_grams(docs.where(~is_test), text_col, id_col, n)
    return (
        train_grams.join(test_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
