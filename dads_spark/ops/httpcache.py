"""HTTP cache-policy evaluation (RFC 9111 freshness) as pure codegen.

A recrawl scheduler holds response headers from the last fetch; whether a
URL can be served from cache — and for how long — decides the cheapest
possible revisit (skip) versus a conditional GET versus a full refetch.
The freshness lifetime rules, in RFC 9111 precedence order:

- ``no-store``            -> not cacheable at all
- ``no-cache``            -> cacheable but revalidate every use (ttl 0)
- ``s-maxage=N``          -> shared-cache ttl N (overrides max-age)
- ``max-age=N``           -> ttl N
- neither, Last-Modified  -> heuristic ttl (date - last_modified) / 10
                             (the classic 10% rule, RFC 9111 §4.2.2)
- nothing                 -> ttl 0

All parsing is regexp_extract / instr over the Cache-Control string and
integer epoch arithmetic — whole-stage codegen, no Python, map-only over
the corpus (the robots/blocklist discipline: policy evaluation must never
shuffle the crawl).  ``(?:^|[ ,])`` anchors keep ``max-age`` from
matching inside ``s-maxage``; both engines' regex dialects (Java, RE2)
accept the pattern identically.

Output per row: cacheable (0/1), revalidate (0/1 — serve-but-check),
ttl_sec (BIGINT), expires_ts_us (fetch time + ttl; NULL when not
cacheable), policy (which rule fired).

Reference analog: none; §2.4 web-ingest spine (revisit_schedule chooses
cadence from observed change; this reads the SERVER's own declared
freshness — real schedulers take the min of the two).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["cache_policy"]

_MAXAGE_RE = r"(?:^|[ ,])max-age=([0-9]+)"
_SMAXAGE_RE = r"(?:^|[ ,])s-maxage=([0-9]+)"


def _has(cc: Column, directive: str) -> Column:
    return F.instr(cc, directive) > 0


def cache_policy(
    df: DataFrame,
    cache_control_col: str,
    fetch_ts_col: str,
    last_modified_ts_col: str | None = None,
) -> DataFrame:
    """Annotate ``df`` with cacheable/revalidate/ttl_sec/expires_ts_us/
    policy derived from the Cache-Control header (lowercase expected —
    canonicalize upstream; HTTP header names/values are case-insensitive)
    and optional Last-Modified for the 10% heuristic."""
    cc = F.coalesce(F.col(cache_control_col), F.lit(""))
    fetch_us = F.unix_micros(F.col(fetch_ts_col).cast("timestamp"))
    smax = F.regexp_extract(cc, _SMAXAGE_RE, 1)
    mage = F.regexp_extract(cc, _MAXAGE_RE, 1)
    if last_modified_ts_col is not None:
        lm_us = F.unix_micros(F.col(last_modified_ts_col).cast("timestamp"))
        # integer floor-division kept exact: subtract the modulus first so
        # the double division is over an exact multiple (no boundary risk)
        d = fetch_us - lm_us
        heur = F.when(
            lm_us.isNotNull() & (fetch_us > lm_us),
            (d - d % F.lit(10_000_000)) / F.lit(10_000_000),
        ).cast("long")
    else:
        heur = F.lit(None).cast("long")

    policy = (
        F.when(_has(cc, "no-store"), F.lit("no-store"))
        .when(_has(cc, "no-cache"), F.lit("no-cache"))
        .when(smax != "", F.lit("s-maxage"))
        .when(mage != "", F.lit("max-age"))
        .when(heur.isNotNull(), F.lit("heuristic"))
        .otherwise(F.lit("none"))
    )
    ttl = (
        F.when(policy == "s-maxage", smax.cast("long"))
        .when(policy == "max-age", mage.cast("long"))
        .when(policy == "heuristic", heur)
        .otherwise(F.lit(0).cast("long"))
    )
    cacheable = (policy != "no-store").cast("long")
    revalidate = (policy == "no-cache").cast("long")
    expires = F.when(
        cacheable == 1, fetch_us + ttl * F.lit(1_000_000)
    ).cast("long")
    return df.select(
        "*",
        cacheable.alias("cacheable"),
        revalidate.alias("revalidate"),
        ttl.alias("ttl_sec"),
        expires.alias("expires_ts_us"),
        policy.alias("policy"),
    )
