"""URL parsing and canonicalization for web-corpus pipelines.

Everything here is pure JVM expression work (``parse_url``, regexes,
higher-order array functions) — whole-stage-codegen friendly, no Python in
the hot path, so it composes with scans at full width and survives a 100x
scale-up as a map-only stage (zero shuffles).

Canonicalization rules (the usual crawl-dedup prep):
- scheme + host lowercased, default ports (:80 http, :443 https) stripped,
  a leading ``www.`` label stripped;
- path keeps case (paths are case-sensitive), a single trailing slash is
  dropped (except the bare root), fragment dropped;
- query parsed into k=v pairs, TRACKING_PARAMS (utm_*, fbclid, gclid, ...)
  removed, the rest sorted by key then re-joined — so two crawls of the
  same page with shuffled/tracking-polluted queries canonicalize equal.

``registrable_domain`` approximates the public-suffix list with the
well-known two-level country suffixes (co.uk, com.au, ...): exact PSL
parity needs the full Mozilla list, which is data, not code — callers on a
cluster should broadcast-join the real list; the embedded set keeps the
operator dependency-free and is explicitly a subset.

Reference analog: none (DADS is a pure time-series engine); this is part
of the training-data-pipeline suite (URL-keyed dedup and per-site rollups
over web text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: query parameters that identify a click, not a page
TRACKING_PARAMS = (
    "utm_source utm_medium utm_campaign utm_term utm_content "
    "gclid fbclid msclkid mc_eid igshid ref_src"
).split()

#: common second-level public suffixes (subset; see module docstring)
TWO_LEVEL_SUFFIXES = (
    "co.uk org.uk ac.uk gov.uk co.jp or.jp ne.jp com.au net.au org.au "
    "co.nz com.br com.cn com.mx co.in co.kr com.sg com.tr com.ar co.za"
).split()


def _canon_query(query: Column) -> Column:
    """Strip tracking params, sort the rest by key, re-join with '&'."""
    pairs = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.split(p, "=").getItem(0).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(pairs), "&")


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Decompose ``url_col`` into host / path / query / protocol columns
    (NULL-safe: a malformed URL yields NULL parts, rows are kept)."""
    u = F.col(url_col)
    # AUTHORITY (userinfo@host:port) rather than HOST: Java's URI.getHost
    # drops the port, which canonicalization needs to see to strip only
    # the DEFAULT ones
    authority = F.regexp_replace(
        F.lower(F.try_parse_url(u, F.lit("AUTHORITY"))), r"^[^@]*@", ""
    )
    return df.withColumns(
        {
            "protocol": F.lower(F.try_parse_url(u, F.lit("PROTOCOL"))),
            "host": authority,
            "path": F.try_parse_url(u, F.lit("PATH")),
            "query": F.try_parse_url(u, F.lit("QUERY")),
        }
    )


def registrable_domain(host: Column) -> Column:
    """Best-effort eTLD+1: last 3 labels when the last 2 form a known
    two-level suffix, else last 2 labels. Hosts with one label (or IPs —
    not detected) pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    return (
        F.when(n <= 1, host)
        .when(
            (n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES),
            F.array_join(F.slice(labels, n - 2, 3), "."),
        )
        .otherwise(F.when(n >= 2, last2).otherwise(host))
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url``, ``host``, ``site`` (registrable domain) —
    the dedup/rollup keys for a crawl. See module docstring for rules."""
    parsed = parse_urls(df, url_col)
    host = F.regexp_replace(
        F.regexp_replace(F.col("host"), r"^www\.", ""), r":(80|443)$", ""
    )
    path = F.coalesce(F.col("path"), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.expr("substring(path, 1, length(path) - 1)"),
        ).otherwise(path)
    )
    query = _canon_query(F.coalesce(F.col("query"), F.lit("")))
    return (
        parsed.withColumn("site", registrable_domain(host))
        .withColumn(
            "canonical_url",
            F.concat(
                F.coalesce(F.col("protocol"), F.lit("https")),
                F.lit("://"),
                host,
                path,
                F.when(query == "", F.lit("")).otherwise(
                    F.concat(F.lit("?"), query)
                ),
            ),
        )
        .withColumn("host", host)
    )


def host_suffixes(host: Column, max_labels: int = 8) -> Column:
    """Array of the dot-suffixes of ``host`` with 1..max_labels labels,
    shortest first: 'a.b.example.com' -> ['com', 'example.com',
    'b.example.com', 'a.b.example.com']. Pure array expressions (split /
    sequence / transform / slice) — codegen, no Python."""
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda k: F.array_join(F.slice(labels, n - k + 1, k), "."),
    )


def blocklist_annotate(
    df: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    rule_col: str = "rule",
    max_labels: int = 8,
) -> DataFrame:
    """Domain-suffix blocklist matching (UT1/adult-filter style): a row is
    blocked when its host equals a rule domain OR is a subdomain of one.
    Adds ``blocked`` (bool) and ``matched_rule`` (the most specific, i.e.
    longest, matching rule, else NULL — all matches are suffixes of one
    host, so equal length implies equality and the max is tie-free).

    Scale shape (the corpus is never shuffled):
    1. distinct hosts — a shuffle over the narrow host column only, with
       map-side partials; host cardinality is sites, not pages;
    2. suffix-explode the distinct hosts (<= max_labels rows each) and
       broadcast-join the rule table on equality — suffix matching becomes
       an equi-join, no LIKE scans over the rule list;
    3. reduce to one (host, matched_rule) row, broadcast THAT back onto
       the corpus as a map-side hash join.
    Step 3's broadcast holds only hosts that matched some rule — bounded
    by the blocklist's reach, not the corpus. If the matched-host set ever
    outgrows a broadcast, replace the final join with a shuffle join on
    host; steps 1-2 are unchanged.
    """
    host = F.lower(F.col(host_col))
    hosts = df.select(host.alias("_bl_host")).distinct()
    rule_norm = F.lower(F.col(rule_col))
    matched = (
        hosts.select(
            "_bl_host",
            F.explode(host_suffixes(F.col("_bl_host"), max_labels)).alias("_sfx"),
        )
        .join(
            F.broadcast(rules.select(rule_norm.alias("_sfx")).distinct()),
            "_sfx",
        )
        .groupBy("_bl_host")
        .agg(
            # most specific rule: longest suffix, then lexicographic
            F.max(F.struct(F.length("_sfx").alias("l"), F.col("_sfx").alias("r")))
            .alias("_best")
        )
        .select("_bl_host", F.col("_best.r").alias("matched_rule"))
    )
    return (
        df.withColumn("_bl_host", host)
        .join(F.broadcast(matched), "_bl_host", "left")
        .withColumn("blocked", F.col("matched_rule").isNotNull())
        .drop("_bl_host")
    )


def blocklist_filter(
    df: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    rule_col: str = "rule",
    max_labels: int = 8,
) -> DataFrame:
    """Rows of ``df`` NOT blocked by the suffix blocklist (see
    ``blocklist_annotate``); the annotation columns are dropped."""
    return (
        blocklist_annotate(df, rules, host_col, rule_col, max_labels)
        .filter(~F.col("blocked"))
        .drop("blocked", "matched_rule")
    )


def url_templates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Mine URL path TEMPLATES: collapse volatile id-ish runs so
    /p/123/x and /p/456/x both read /p/{n}/x, then count pages and
    distinct raw paths per (host, template). The classic crawl-frontier
    question — which URL *patterns* dominate a host (calendar traps,
    session-id explosions, faceted-search grids) — is only visible after
    templating; raw-path counts rank every page once.

    Rules (order matters and is part of the contract — hex first so the
    digits inside a hex id don't get templated piecemeal):
      1. runs of >=8 lowercase hex chars -> ``{hex}``  (uuids, digests)
      2. runs of decimal digits          -> ``{n}``    (ids, dates, pages)

    Output: host, template, n_pages, n_paths — integers + strings only,
    hash-exact cross-engine (both regexes are shared RE2/Java-regex
    subset: character classes + bounded repetition, no lookaround).

    Scale shape: per-row regex (codegen, no Python) + ONE groupBy on
    (host, template) with partial aggregation — the same shape at 100 TB;
    template cardinality is bounded by real site structure, and a skewed
    mega-template is mergeable (counts are decomposable sums).
    """
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    path = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    template = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{hex}"), r"[0-9]+", "{n}"
    )
    return (
        df.select(
            host.alias("host"),
            path.alias("_path"),
            template.alias("template"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.countDistinct("_path").cast("long").alias("n_paths"),
        )
    )


def path_prefix_rollup(
    df: DataFrame,
    url_col: str = "url",
    weight_col: str | None = None,
    max_depth: int = 4,
) -> DataFrame:
    """Hierarchical directory drilldown — the classic web-analytics
    rollup: every page contributes one row to EACH ancestor directory
    of its URL path up to ``max_depth`` levels, so /docs/api/v2/intro
    counts under /docs, /docs/api and /docs/api/v2.  The site operator
    reads it top-down ("which sections are growing"); the crawler
    reads it bottom-up ("which subtrees are worth re-fetching").

    Per (host, prefix, depth): n_pages (exact), and sum_weight (exact
    long sum of ``weight_col`` — pass text bytes for volume rollups).

    Scale shape: the prefix explode is BOUNDED (<= max_depth rows per
    page, a constant), aggregation is ONE keyed exchange with map-side
    partials — the hierarchy is computed in a single pass, not one
    scan per level (the CUBE trap).  No join, no Python; segments come
    from codegen string ops.
    """
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    )
    path = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    segs = F.filter(
        F.split(path, "/"), lambda s: s != F.lit("")
    )
    depth_n = F.least(F.size(segs), F.lit(int(max_depth)))
    weight = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    staged = df.select(
        host.alias("host"),
        segs.alias("_segs"),
        depth_n.alias("_nd"),
        weight.alias("_w"),
    ).filter(F.col("_nd") > 0)
    exploded = staged.select(
        "host",
        "_w",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("_nd")),
                lambda i: F.struct(
                    i.cast("long").alias("depth"),
                    F.concat(
                        F.lit("/"),
                        F.array_join(F.slice("_segs", F.lit(1), i), "/"),
                    ).alias("prefix"),
                ),
            )
        ).alias("_p"),
    ).select("host", F.col("_p.depth"), F.col("_p.prefix"), "_w")
    return exploded.groupBy("host", "prefix", "depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum("_w").alias("sum_weight"),
    )
