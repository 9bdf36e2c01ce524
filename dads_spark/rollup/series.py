"""Per-domain series derivation from the Common-Crawl-style pages table.

north rule / input_hint (BASELINE.json:6,15): the input is an Iceberg table
``pages(url string, warc_ts timestamp, html binary, text string, lang
string)``; derived per-domain univariate series are doc counts, text-byte
volume (octet_length), and language mix, bucketed on ``warc_ts``.

Everything here is plain Catalyst-optimizable DataFrame API: the domain
extraction and octet_length run inside whole-stage codegen, filters on
``warc_ts`` reach the scan (partition pruning on days(warc_ts) when the
table is hidden-partitioned), and ``html`` is never referenced so column
pruning drops the heavy blob at the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: metrics derivable per (domain, bucket)
METRICS = ("doc_count", "text_bytes", "lang_share")


def with_domain(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Extract the host from the url with codegen-friendly string ops.

    Deliberately NOT ``parse_url``: that function degrades catastrophically
    under thread parallelism (measured 2.3 s at local[8] -> 23.7 s at
    local[32] for the same 6.4M-row aggregate — a shared-lock serialization
    inside the JVM URI machinery), which would cap the whole rollup's
    scaling. Three ``substring_index`` calls stay inside whole-stage
    codegen: scheme://host[:port]/... -> host (port and userinfo stripped).
    """
    host = F.substring_index(
        F.substring_index(F.col(url_col), "/", 3), "/", -1
    )
    # no-path urls put query/fragment in the "host" slot
    # ('https://ex.com?q=1' / 'https://ex.com#frag') — strip them first so
    # one real domain never splits across rollup keys
    host = F.substring_index(host, "?", 1)
    host = F.substring_index(host, "#", 1)
    host = F.substring_index(host, "@", -1)  # strip userinfo if present
    host = F.substring_index(host, ":", 1)  # strip port
    return pages.withColumn("domain", host)


def domain_hourly_series(pages: DataFrame, lang_of_interest: str = "en") -> DataFrame:
    """One row per (domain, hour): doc_count, text_bytes, lang_share.

    lang_share = fraction of docs in ``lang_of_interest`` (the language-mix
    metric; exact via conditional count, one pass, no join).
    """
    from .tiers import bucket_expr

    df = with_domain(pages)
    return df.groupBy("domain", bucket_expr("warc_ts", "hour")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum(F.octet_length("text")).alias("text_bytes"),
        (
            F.count(F.when(F.col("lang") == lang_of_interest, 1))
            / F.count(F.lit(1))
        ).alias("lang_share"),
    )


def text_identity_fingerprint(pages: DataFrame) -> DataFrame:
    """sha256 per (url, text) — the byte-identity invariant surface.

    The engine never rewrites ``text``; this fingerprint table is compared
    before/after any pipeline stage to prove byte-identical extracted text
    per url (BASELINE.json:16).
    """
    return pages.select(
        "url", F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256")
    )
