"""Sitemap ingestion + crawl-coverage reconciliation.

Sitemaps (sitemaps.org protocol, public spec) are the site-declared URL
inventory: `<urlset><url><loc>…</loc><lastmod>…</lastmod></url>…` plus
`<sitemapindex>` files that point at child sitemaps. A crawl pipeline
uses them for two jobs this module implements:

- ``parse_sitemap``: raw XML body -> one row per `<url>` entry with
  (loc, lastmod). Extraction is pure JVM regex (``regexp_extract_all``
  on the `<url>…</url>` blocks, then per-block field pulls via
  higher-order ``transform``) — sitemap XML is machine-generated and
  flat, so a regex tier is the standard fast path (the same tradeoff as
  htmltext.py's regex HTML tier). Entries inside ``<sitemapindex>``
  are sitemap POINTERS, not page URLs, and are excluded by anchoring on
  `<url>` blocks only. CDATA-wrapped and entity-escaped locs are
  normalized (``&amp;`` etc — the five XML predefined entities).
- ``crawl_coverage``: reconcile the declared inventory against the
  crawled pages table: per URL, is it declared-only (a crawl GAP),
  crawled-only (ORPHAN — reachable but not declared), or both; when
  both and the sitemap carries a lastmod NEWER than the crawl
  timestamp, flag it STALE (the recrawl queue).

Scale shape: sitemaps are per-SITE artifacts — the sitemap table is
orders of magnitude smaller than the page table. The parse is map-only
on the small side; the reconciliation is ONE full-outer hash join on
canonical URL, and the page side ships only (url, max(warc_ts)) — an
aggregate sized by distinct crawled URLs, never raw fetch events.

Reference analog: none; §2.4 web-ingest spine (beside robots.txt and
the crawl frontier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["parse_sitemap", "crawl_coverage"]

# One <url>…</url> element block; fields are pulled per block so a
# lastmod can never be attributed to a neighboring loc.
_URL_BLOCK = r"(?s)<url\b[^>]*>(.*?)</url>"
_LOC = r"(?s)<loc\s*>\s*(?:<!\[CDATA\[(.*?)\]\]>|(.*?))\s*</loc>"
_LASTMOD = r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod>"


def _xml_unescape(c: Column) -> Column:
    """The five predefined XML entities, longest-first so &amp;lt;
    decodes as '&lt;' exactly once (single-pass left-to-right regex
    replacement, same result on any engine)."""
    out = c
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def parse_sitemap(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, sitemap_xml) -> (host, loc, lastmod) one row per `<url>`
    entry. lastmod is the raw W3C-datetime string (NULL when absent);
    callers cast as needed. Blocks with no parseable <loc> are dropped.
    Map-only: regexp block split + per-block field extraction, one
    bounded explode sized by declared URLs (the output itself)."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
    entry = F.explode(blocks).alias("_blk")
    cdata = F.regexp_extract(F.col("_blk"), _LOC, 1)
    plain = F.regexp_extract(F.col("_blk"), _LOC, 2)
    loc = _xml_unescape(F.when(cdata != "", cdata).otherwise(plain))
    lastmod = F.regexp_extract(F.col("_blk"), _LASTMOD, 1)
    return (
        sitemaps.select(F.col(host_col).alias("host"), entry)
        .select(
            "host",
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .filter(F.col("loc") != "")
    )


def crawl_coverage(
    declared: DataFrame,
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Reconcile sitemap-declared URLs against crawled pages.

    ``declared``: (host, loc, lastmod) from :func:`parse_sitemap`.
    ``pages``: the crawl table; only (url, max ts) survives the first
    aggregation. Returns one row per URL seen on either side:
    (url, status, lastmod, last_crawl_ts) with status in
    {'gap', 'orphan', 'ok', 'stale'} — stale = declared lastmod is
    strictly newer than the newest crawl of that URL (lexicographic
    compare on the W3C-datetime prefix is chronological, so the string
    comparison is exact and engine-neutral for ISO timestamps).
    """
    # declared-side presence can't be read off lastmod alone (it is
    # optional) — carry an explicit marker through the outer join.
    d = (
        declared.groupBy(F.col("loc").alias(url_col))
        .agg(F.max("lastmod").alias("lastmod"))
        .withColumn("_decl", F.lit(True))
    )
    p = pages.groupBy(url_col).agg(F.max(ts_col).alias("last_crawl_ts"))
    j = d.join(p, url_col, "full_outer")
    crawled = F.col("last_crawl_ts").isNotNull()
    status = (
        F.when(~crawled, F.lit("gap"))
        .when(F.col("_decl").isNull(), F.lit("orphan"))
        .when(
            F.col("lastmod").isNotNull()
            & (
                F.col("lastmod")
                > F.date_format(
                    F.col("last_crawl_ts"), "yyyy-MM-dd'T'HH:mm:ss"
                )
            ),
            F.lit("stale"),
        )
        .otherwise(F.lit("ok"))
    )
    return j.select(
        url_col,
        status.alias("status"),
        "lastmod",
        "last_crawl_ts",
    )
