"""RAKE keyword extraction (Rose, Engel, Cramer, Cowley 2010).

Rapid Automatic Keyword Extraction: candidate keyphrases are the maximal
runs of content words between stopwords/punctuation; each word scores
degree/frequency over the document's candidates (degree = summed length
of the phrases it appears in — favors words that co-occur in longer
phrases), and a phrase scores the sum of its words' scores. The classic
un-supervised per-document keyword signal for corpus indexing and topic
labeling — no model, no corpus statistics, embarrassingly parallel.

Exactness: word scores are quantized to integer micro-units
(deg * 1_000_000 div freq) BEFORE the per-phrase sum, so phrase scores
are exact longs — order-independent summation, bit-identical on any
engine (textbook RAKE sums rationals in floating point, whose value
depends on summation order).

Distribution shape: everything keys on doc_id — normalization and
phrase splitting are codegen map stages (two-pass stopword replace: a
global ``' stop '`` -> ``' | '`` replace cannot consume two ADJACENT
stopwords in one scan because the match eats the shared space, but
after one pass no two survivors are adjacent, so a second identical
pass terminates the rewrite; RE2 and Java regex agree because the
pattern uses no lookarounds), and the two aggregations (word stats,
phrase scores) shuffle on (doc_id, word) / (doc_id, phrase) — bounded
by document vocabulary, with map-side partials. Top-k ranks inside the
per-document window (WindowGroupLimit pushes the filter down).

Reference analog: none in DADS (pure web-corpus op); SURVEY §2.4 suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

#: the small demo stopword list — callers pass their language's list
DEFAULT_STOPWORDS = (
    "the", "a", "an", "of", "and", "or", "in", "to", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "be", "it", "that", "this",
    "from",
)


def rake_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    top_k: int = 5,
) -> DataFrame:
    """Top-``top_k`` RAKE keyphrases per document.

    Returns (id, phrase, n_words, occurrences, score_u, rank) where
    score_u is the exact integer micro-unit phrase score and rank is
    1..top_k ordered by (score_u desc, phrase) — deterministic ties.
    """
    stop_re = " (?:" + "|".join(stopwords) + ") "
    # punctuation is a PHRASE DELIMITER (textbook RAKE), not whitespace:
    # "alpha beta. gamma" yields candidates "alpha beta" and "gamma",
    # never "alpha beta gamma"
    punct = F.regexp_replace(F.lower(F.col(text_col)), "[.!?;,:]+", " | ")
    norm = F.regexp_replace(punct, "[^a-z|]+", " ")
    marked = F.concat(F.lit(" "), norm, F.lit(" "))
    for _ in range(2):  # two passes terminate (see module docstring)
        marked = F.regexp_replace(marked, stop_re, " | ")
    phr = (
        docs.select(F.col(id_col).alias("id"), marked.alias("_m"))
        .select("id", F.posexplode(F.split("_m", "\\|")).alias("pidx", "_raw"))
        .select(
            "id",
            "pidx",
            F.trim(F.regexp_replace("_raw", " +", " ")).alias("phrase"),
        )
        .filter(F.col("phrase") != "")
    )
    words = phr.select(
        "id",
        "pidx",
        "phrase",
        F.size(F.split("phrase", " ")).cast("long").alias("plen"),
        F.explode(F.split("phrase", " ")).alias("word"),
    )
    wstats = words.groupBy("id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    per_occurrence = (
        words.join(wstats, ["id", "word"])
        .groupBy("id", "pidx", "phrase")
        .agg(
            F.sum(F.expr("(deg * 1000000) div freq")).alias("score_u"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )
    collapsed = per_occurrence.groupBy("id", "phrase").agg(
        F.max("score_u").alias("score_u"),  # identical across occurrences
        F.max("n_words").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("occurrences"),
    )
    w = W.partitionBy("id").orderBy(F.col("score_u").desc(), "phrase")
    return (
        collapsed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("id").alias(id_col),
            "phrase",
            "n_words",
            "occurrences",
            "score_u",
            "rank",
        )
    )
