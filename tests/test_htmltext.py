"""Regex-tier HTML -> text extraction (ops/htmltext.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dads_spark.ops import html_to_text


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return html_to_text(df, "html").first()["text_extracted"]


def test_script_and_style_removed_with_content(spark):
    out = _extract(
        spark,
        "<body><script>if (a<b) { alert('<p>x</p>') }</script>"
        "<style>p { color: red }</style>Hello</body>",
    )
    assert out == "Hello"


def test_block_boundaries_become_newlines(spark):
    out = _extract(
        spark, "<div>one</div><p>two</p><br>three<li>four</li>"
    )
    assert out == "one\ntwo\nthree\nfour"


def test_inline_tags_do_not_fuse_words(spark):
    out = _extract(spark, "a<b>bold</b>c <em>d</em>")
    assert out == "a bold c d"


def test_entities_decode_once(spark):
    # &amp;lt; is a double-encoded '<' literal: must become '&lt;', NOT '<'
    out = _extract(spark, "<p>fish &amp; chips &lt;tag&gt; &amp;lt;</p>")
    assert out == "fish & chips <tag> &lt;"


def test_whitespace_collapsed(spark):
    out = _extract(
        spark, "<p>a   b\t\tc</p>\n\n\n<p>  d  </p>"
    )
    assert out == "a b c\nd"
