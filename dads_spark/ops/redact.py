"""PII redaction for web-corpus text: emails, IPv4 addresses, long digit
runs masked with typed placeholder tokens.

Pure codegen map stage — a chain of JVM ``regexp_replace`` expressions, no
Python, no shuffle; at 100 TB this fuses into the same whole-stage-codegen
span as the scan and costs one pass. Patterns are written in the common
subset of Java regex and RE2 (no backrefs, no lookaround) so the DuckDB
oracle twin applies the byte-identical transformation.

Replacement ORDER is part of the contract: emails first (they contain
digits and dots that the later patterns would mangle), then IPv4, then
bare long digit runs.

Reference analog: none — training-data-pipeline mandate (web corpora are
scrubbed before training).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
LONGNUM_RE = r"\b\d{7,}\b"

_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (LONGNUM_RE, "<NUM>"),
]


def _redacted(col: Column) -> Column:
    for pat, token in _RULES:
        col = F.regexp_replace(col, pat, token)
    return col


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace ``text_col`` (or write ``out_col``) with the PII-masked text."""
    return docs.withColumn(out_col or text_col, _redacted(F.col(text_col)))


def pii_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc counts of each PII class (audit / filter-threshold signal).

    Counted on the SAME cascade the redaction applies — an email's digits
    must not double-count as a long number — by counting each rule's
    matches on the text with the previous rules already applied.
    """
    col = F.col(text_col)
    out = [F.col(id_col)]
    for pat, token in _RULES:
        out.append(
            F.regexp_count(col, F.lit(pat))
            .cast("long")  # match the BIGINT the SQL twin's len() yields
            .alias(f"n_{token.strip('<>').lower()}")
        )
        col = F.regexp_replace(col, pat, token)
    return docs.select(*out)


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: how many
    rows sit in equivalence classes smaller than ``k`` — the standard
    re-identification risk readout run BEFORE publishing a derived
    dataset (Sweeney 2002; public method).

    One hash aggregation to class sizes (map-side partials absorb the
    table), then a class-size histogram: (class_size, n_classes,
    n_rows, violates) with violates = class_size < k. The publish gate
    is ``sum(n_rows WHERE violates) == 0``; the histogram shows how far
    generalization must coarsen if not.

    Reference analog: none; SURVEY §2.4 privacy suite — the
    measurement companion to redact_pii (which removes direct
    identifiers; THIS catches the quasi-identifier joins).
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        classes.groupBy(F.col("_n").alias("class_size"))
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).alias("n_rows"),
            (F.col("class_size") < k).alias("violates"),
        )
    )
