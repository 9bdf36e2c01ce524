"""Deterministic sampling and dataset-split operators.

Training-data pipelines need samples and splits that are (a) reproducible
across runs/engines/cluster layouts and (b) computable in one scan with no
global sort. Both operators here key on md5 of the row id — a fixed,
engine-portable hash (Spark ``md5`` and DuckDB ``md5`` agree bytewise on
the same UTF-8 input), so every result is oracle-checkable and stable
under repartitioning. No rand()/monotonically_increasing_id anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    n_per_key: int,
) -> DataFrame:
    """Per-key fixed-size sample: the ``n_per_key`` rows with the smallest
    md5(id) per key.

    Equivalent to a seeded uniform sample (md5 scrambles ids uniformly)
    but exactly reproducible anywhere. One shuffle (the per-key window);
    at scale Spark's WindowGroupLimit pushes the top-n below the exchange,
    so the shuffle carries ~n_per_key rows per key, not the full table.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(*key_cols).orderBy(h, id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_key)
        .drop("_rn")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    test_nibbles: int = 1,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/test assignment by md5 prefix.

    A row is ``test`` iff the first hex nibble of md5(id) is below
    ``test_nibbles`` — i.e. a test fraction of ``test_nibbles``/16 (1 ->
    6.25%, 4 -> 25%). Valid domain is 1..15: at 16 the hex threshold
    would grow to two digits ('10' + 31 zeros) and the lexicographic
    compare against a 32-char digest silently inverts the split, so the
    bound is enforced. Hex-prefix comparison keeps the predicate a plain
    string compare (identical lexicographic semantics in every engine) —
    no float thresholds, no parsing. Membership is a pure function of the
    id: stable across runs, joins, and resharding, which is what keeps
    eval sets leak-free as the corpus grows.
    """
    if not 1 <= test_nibbles <= 15:
        raise ValueError(
            f"test_nibbles must be in 1..15 (got {test_nibbles}): the "
            "threshold is a single hex digit prefix over a 32-char md5"
        )
    h = F.md5(F.col(id_col).cast("string"))
    threshold = format(test_nibbles, "x") + "0" * 31
    return df.withColumn(
        split_col, F.when(h < threshold, "test").otherwise("train")
    )
