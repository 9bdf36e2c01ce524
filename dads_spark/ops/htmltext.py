"""HTML -> text extraction (regex tier), JVM-only.

See html_to_text. Reference analog: none; spec source BASELINE.json:16
(pages arrive with html + extracted text; the byte-identical-text
invariant binds the extractor output, so the extractor must be
deterministic and engine-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["html_to_text"]



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
