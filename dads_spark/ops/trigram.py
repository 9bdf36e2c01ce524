"""Trigram posting index + exact substring search.

The pg_trgm / Google-Code-Search pattern (Cox, "Regular Expression
Matching with a Trigram Index"): substring queries over a corpus become
(1) an index lookup — candidate documents are those containing EVERY
trigram of the query — then (2) exact verification of only the
candidates. The index is a plain relational posting table
(gram, doc_id), so at 100 TB it shards/buckets like any fact table, the
lookup touches |query grams| posting lists instead of the corpus, and
verification scans only candidates (trigram filtering is sound: a true
match contains every query trigram, so recall is exact — the gate pins
the index path hash-equal to a direct full-scan oracle).

Shapes: postings build is one explode of per-document DISTINCT trigrams
(codegen: sequence + transform + array_distinct, no Python) and one
write/shuffle keyed by gram; search is a tiny IN-list filter on the
posting table (query grams broadcast as literals), one groupBy(doc)
counting gram hits (= k means all present), a semi-join back to the
docs, and the exact `instr` check. At real scale the standard
refinement — probe only the RAREST few grams — drops lookup cost
further; with all grams probed the candidate set is smallest, which is
what we pin here.

Reference analog: none in DADS (pure web-corpus op); SURVEY §2.4 suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def trigram_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(gram, id) posting table: one row per DISTINCT trigram of each
    document's lowercased text. Documents shorter than 3 chars emit no
    postings (they can never match a >=3-char substring query)."""
    # sequence(1, 0) DESCENDS in Spark instead of being empty, so the
    # short-document case needs an explicit guard
    grams = F.expr(
        f"CASE WHEN length({text_col}) >= 3 THEN "
        f"array_distinct(transform("
        f"sequence(1, length({text_col}) - 2),"
        f" i -> substring(lower({text_col}), i, 3)))"
        f" ELSE array() END"
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("gram")
    ).select("gram", F.col("id").alias(id_col))


def trigram_search(
    docs: DataFrame,
    postings: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring search through the posting index: documents whose
    lowercased text contains ``query`` (case-insensitive), with the
    1-based position of the first occurrence. Bit-identical to a direct
    full scan — the index only prunes.
    """
    q = query.lower()
    if len(q) < 3:
        raise ValueError("trigram search needs a query of >= 3 chars")
    grams = sorted({q[i : i + 3] for i in range(len(q) - 2)})
    cand = (
        postings.filter(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == len(grams))
        .select(id_col)
    )
    pos = F.instr(F.lower(F.col(text_col)), F.lit(q))
    return (
        docs.join(cand, id_col, "left_semi")
        .withColumn("pos", pos.cast("long"))
        .filter(F.col("pos") > 0)
        .select(id_col, "pos")
    )
