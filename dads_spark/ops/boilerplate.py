"""Boilerplate-line removal: drop lines repeated across many documents of
the same group (site/domain) — the C4 / RefinedWeb cleanup that strips nav
bars, cookie banners and footers before training.

Shape, chosen for 100 TB:
1. explode lines with position (``posexplode`` — JVM-side, no Python);
2. count DISTINCT docs per (group, line) via one shuffle with map-side
   partial aggregation (two-level: (group, line, doc) dedup then count —
   both hash aggregates on the same key prefix, one exchange);
3. the boilerplate SET (count >= min_docs) is tiny by construction —
   lines shared by many documents are few — so it BROADCASTS, and the
   line stream is filtered with a broadcast left-anti join: the full
   corpus is never shuffled;
4. reassemble with ``array_join(array_agg-sorted-by-pos)`` — one shuffle
   on doc_id (or zero if the caller's stream is already doc-partitioned).

Worst case (every line unique) degrades the COUNT side to corpus
cardinality but stays a single partial-agg shuffle; the broadcast bound
only needs step 3's output small, which ``min_docs >= 2`` guarantees
relative to corpus size.

Reference analog: none (DADS is a pure time-series engine); training-data
pipeline suite (web-corpus text cleaning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_docs: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """Lines appearing in >= ``min_docs`` distinct documents of the same
    group: (group, line, n_docs). Blank lines are ignored."""
    lines = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), sep)).alias("line"),
    ).filter(F.col("line") != "")
    return (
        lines.groupBy("grp", "line")
        .agg(F.count_distinct("doc").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .withColumnRenamed("grp", group_col)
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_docs: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """Rewrite ``text_col`` with boilerplate lines removed (original line
    order preserved; docs whose every line is boilerplate keep an empty
    text). All other columns pass through."""
    bp = boilerplate_lines(df, id_col, text_col, group_col, min_docs, sep)
    exploded = df.select(
        F.col(id_col).alias("_doc"),
        F.col(group_col).alias("_grp"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_line"),
    ).filter(F.col("_line") != "")
    kept = exploded.join(
        F.broadcast(bp),
        (exploded["_grp"] == bp[group_col]) & (exploded["_line"] == bp["line"]),
        "left_anti",
    )
    rebuilt = kept.groupBy("_doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("_clean")
    )
    out = df.join(rebuilt, df[id_col] == rebuilt["_doc"], "left")
    return out.withColumn(
        text_col, F.coalesce(F.col("_clean"), F.lit(""))
    ).drop("_doc", "_clean")
