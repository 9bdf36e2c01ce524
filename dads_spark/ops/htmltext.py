"""HTML -> text extraction (regex tier), JVM-only.

See html_to_text. Reference analog: none; spec source BASELINE.json:16
(pages arrive with html + extracted text; the byte-identical-text
invariant binds the extractor output, so the extractor must be
deterministic and engine-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["html_metadata", "html_to_text"]



def html_to_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text_extracted"
) -> DataFrame:
    """Naive HTML -> text extraction as pure JVM regex stages (the
    trafilatura-class model extractors are out-of-sandbox; this is the
    deterministic regex tier every pipeline runs FIRST, and the north
    rule's byte-identical-text invariant applies to whatever extractor is
    plugged here):

    1. drop <script>/<style> elements with their content;
    2. turn block-level tags (open AND close: p/div/li/tr/headings/
       blockquote, plus <br>) into newlines so words from different
       blocks don't fuse;
    3. strip all remaining tags;
    4. decode the five XML entities (&amp; last — double-encoded input
       must not double-decode);
    5. collapse runs of spaces/tabs per line and blank-line runs.

    All patterns are RE2-compatible (no backreferences/lookarounds), so
    the SAME expressions run in the DuckDB oracle — the extraction is
    hash-pinned cross-engine, not just "looks right".
    """
    s = F.col(html_col).cast("string")
    # two patterns, no backreference (RE2 has none)
    s = F.regexp_replace(s, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    s = F.regexp_replace(
        s, r"(?i)</?(p|div|li|tr|h[1-6]|blockquote)\b[^>]*>|<br\s*/?>", "\n"
    )
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        s = F.regexp_replace(s, ent, ch)
    s = F.regexp_replace(s, r"[ \t]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    # trim() strips spaces only; boundary newlines must go too
    s = F.regexp_replace(s, r"^\s+|\s+$", "")
    return df.withColumn(out_col, s)


def html_metadata(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Page-metadata extraction as pure JVM regex stages — the head-of-
    document signals every crawler indexes before (or instead of)
    reading the body: <title>, meta description, rel=canonical (the
    dedup-by-publisher-intent signal), a robots-noindex flag, and the
    count of JSON-LD structured-data blocks.

    Attribute ORDER is not fixed in HTML (``name=.. content=..`` vs
    ``content=.. name=..``), so each attribute pair is probed in both
    orders and coalesced — still lookaround-free RE2-compatible
    patterns, so the same expressions run verbatim in the DuckDB oracle.
    Adds columns: title, meta_description, canonical_url, noindex,
    n_jsonld. Missing elements yield NULL (title/description/canonical)
    / false / 0. Title whitespace is collapsed+trimmed; other values are
    returned raw.
    """
    s = F.col(html_col).cast("string")

    def _first(pat: str) -> F.Column:
        got = F.regexp_extract(s, pat, 1)
        return F.when(got != "", got)

    title = _first(r"(?is)<title[^>]*>(.*?)</title")
    title = F.when(
        title.isNotNull(),
        F.regexp_replace(F.regexp_replace(title, r"\s+", " "), r"^ | $", ""),
    )
    desc = F.coalesce(
        _first(r'(?is)<meta[^>]*name=["' "'" r']description["' "'"
               r'][^>]*content=["' "'" r']([^"' "'" r']*)'),
        _first(r'(?is)<meta[^>]*content=["' "'" r']([^"' "'"
               r']*)["' "'" r'][^>]*name=["' "'" r']description["' "'" r"]"),
    )
    canon = F.coalesce(
        _first(r'(?is)<link[^>]*rel=["' "'" r']canonical["' "'"
               r'][^>]*href=["' "'" r']([^"' "'" r']*)'),
        _first(r'(?is)<link[^>]*href=["' "'" r']([^"' "'"
               r']*)["' "'" r'][^>]*rel=["' "'" r']canonical["' "'" r"]"),
    )
    noindex = s.rlike(
        r'(?is)<meta[^>]*name=["' "'" r']robots["' "'"
        r'][^>]*content=["' "'" r'][^"' "'" r']*noindex'
    ) | s.rlike(
        r'(?is)<meta[^>]*content=["' "'" r'][^"' "'"
        r']*noindex[^"' "'" r']*["' "'" r'][^>]*name=["' "'"
        r']robots["' "'" r"]"
    )
    n_jsonld = F.size(
        F.regexp_extract_all(
            s,
            F.lit(r'(?is)<script[^>]*type=["' "'"
                  r']application/ld\+json["' "'" r"]"),
            F.lit(0),
        )
    ).cast("long")
    return df.select(
        "*",
        title.alias("title"),
        desc.alias("meta_description"),
        canon.alias("canonical_url"),
        noindex.alias("noindex"),
        n_jsonld.alias("n_jsonld"),
    )


def html_tables(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Structured table extraction from HTML: one row per CELL —
    (doc, table_idx, row_idx, col_idx, cell_text) — the regex-tier
    counterpart of html_to_text for the tabular content that text
    extraction destroys (specs, rankings, stats pages are where much of
    the web's structured data lives).

    Same engineering contract as the rest of this module: anchored
    non-greedy regexes inside whole-stage codegen (regexp_extract_all
    at three nesting levels via posexplode — table, tr, td/th), inner
    tags stripped from the cell, whitespace collapsed and trimmed.
    Documents without tables contribute nothing (the explode drops
    them). Map-only: zero shuffles, linear in corpus bytes, and the
    per-level extraction is bounded by the document's own tag counts.

    Reference analog: none; SURVEY §2.4 web-ingest suite.
    """
    tables = F.expr(
        f"regexp_extract_all({html_col}, '(?is)<table[^>]*>(.*?)</table>', 1)"
    )
    rows = F.expr(
        "regexp_extract_all(_tbl, '(?is)<tr[^>]*>(.*?)</tr>', 1)"
    )
    cells = F.expr(
        "regexp_extract_all(_row, '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1)"
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_cell"), "<[^>]*>", ""),
            "\\s+",
            " ",
        )
    )
    return (
        docs.select(F.col(id_col), F.posexplode(tables).alias("table_idx", "_tbl"))
        .select(id_col, "table_idx", F.posexplode(rows).alias("row_idx", "_row"))
        .select(
            id_col, "table_idx", "row_idx",
            F.posexplode(cells).alias("col_idx", "_cell"),
        )
        .select(
            id_col, "table_idx", "row_idx", "col_idx",
            clean.alias("cell_text"),
        )
    )
