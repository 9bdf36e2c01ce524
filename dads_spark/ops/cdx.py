"""CDX(J) web-archive index records and SURT canonical keys.

Common Crawl (and every Wayback-style archive) publishes its URL index
as CDXJ lines — `<SURT key> <14-digit timestamp> <JSON block>` — where
the SURT (Sort-friendly URI Reordering Transform, public IA spec) key
`com,example)/path?q=v` groups a host's captures contiguously under
lexicographic sort. A crawl pipeline reads this index to pick captures
BEFORE touching any WARC bytes, so these operators are the cheap front
half of the ingest path:

- ``surt_key``: URL -> SURT as one pure-JVM expression (reverse the
  dot-split host with comma joins, drop a leading www, lowercase,
  default-port strip) — map-only codegen, mirrored node-for-node by
  the SQL oracle.
- ``parse_cdxj``: raw line -> (surt, ts, url, status, mime, digest,
  length) via two bounded splits + ``get_json_object`` — map-only.
- ``latest_captures``: the index dedup every archive reader runs — per
  SURT key keep the newest capture with a 2xx status, and collapse
  identical content (same digest) to its FIRST capture time so a
  re-crawl of unchanged bytes never looks new. One aggregation keyed
  by the SURT key: at Common-Crawl scale the index shards by SURT
  prefix, so this shuffle is the index's own sort order.

Reference analog: none; §2.4 web-ingest spine (the index in front of
warc_ingest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["surt_key", "parse_cdxj", "latest_captures"]


def surt_key(url: Column) -> Column:
    """URL -> SURT key, e.g. https://www.Example.com:443/A/b?q=1 ->
    ``com,example)/a/b?q=1``. Scheme dropped, host lowercased and
    comma-reversed, one leading www stripped, :80/:443 default ports
    stripped, path+query lowercased, bare host gets '/'. Pure codegen.
    """
    u = F.lower(url)
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    path = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 20))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    # a surviving non-default port stays attached AFTER the reversed
    # host (IA convention: com,example:8080)/path)
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    host = F.regexp_replace(host, r":\d+$", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev,
        port,
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
    )


def parse_cdxj(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ line -> typed columns. Format (public IA/Common Crawl
    spec): `surt_key SP 14-digit-ts SP json` where json carries at
    least url/status/mime/digest/length. Rows that do not match the
    three-field shape yield NULL surt (callers filter)."""
    l = F.col(line_col)
    surt = F.regexp_extract(l, r"^(\S+) (\d{14}) (\{.*\})$", 1)
    ts = F.regexp_extract(l, r"^(\S+) (\d{14}) (\{.*\})$", 2)
    js = F.regexp_extract(l, r"^(\S+) (\d{14}) (\{.*\})$", 3)
    return lines.select(
        F.when(surt != "", surt).alias("surt"),
        F.when(ts != "", ts.cast("long")).alias("cdx_ts"),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.status").cast("long").alias("status"),
        F.get_json_object(js, "$.mime").alias("mime"),
        F.get_json_object(js, "$.digest").alias("digest"),
        F.get_json_object(js, "$.length").cast("long").alias("length"),
    )


def latest_captures(cdx: DataFrame) -> DataFrame:
    """Per SURT key: the newest 2xx capture, with content-identity
    collapse — the capture time reported is the FIRST time its digest
    was captured (unchanged re-crawls don't refresh it). Returns
    (surt, url, digest, first_ts, last_ts, n_captures, n_distinct_digests)
    — exact longs, one aggregation keyed by surt + one small self-join
    back to the digest's first appearance."""
    ok = cdx.filter(
        F.col("surt").isNotNull()
        & (F.col("status") >= 200)
        & (F.col("status") < 300)
    )
    # newest capture per key: max (ts, url, digest) struct — total order
    newest = ok.groupBy("surt").agg(
        F.max(
            F.struct(
                F.col("cdx_ts").alias("t"),
                F.col("url").alias("u"),
                F.col("digest").alias("d"),
            )
        ).alias("_n"),
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.countDistinct("digest").cast("long").alias("n_distinct_digests"),
        F.max("cdx_ts").alias("last_ts"),
    )
    first_seen = ok.groupBy("surt", "digest").agg(
        F.min("cdx_ts").alias("first_ts")
    )
    return (
        newest.select(
            "surt",
            F.col("_n.u").alias("url"),
            F.col("_n.d").alias("digest"),
            "last_ts",
            "n_captures",
            "n_distinct_digests",
        )
        .join(first_seen, ["surt", "digest"])
        .select(
            "surt",
            "url",
            "digest",
            "first_ts",
            "last_ts",
            "n_captures",
            "n_distinct_digests",
        )
    )
