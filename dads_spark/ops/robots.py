"""robots.txt crawl-policy filtering for web-corpus pipelines.

A compliant corpus pipeline must drop pages a site's robots policy
disallows. This module implements the standard matching semantics
(RFC 9309 / Google subset, public spec) for the `User-agent: *` group:

- a path is governed by the LONGEST matching rule prefix;
- on equal length, Allow beats Disallow;
- no matching rule (or no rules for the host) -> allowed.

Architecture keeps the corpus MAP-ONLY, the same discipline as the
domain blocklist: per-host rules are collapsed to ONE array column on
the (small, site-level) rules table and broadcast; matching then runs as
JVM higher-order array functions (filter/transform/array_max) inside the
corpus projection — no explode of page rows, no shuffle, no Python.

``parse_robots`` turns raw robots.txt bodies into (host, rtype, prefix)
rule rows with a JVM ``aggregate`` state machine over the lines (group
tracking is inherently sequential: rules bind to the `User-agent: *`
group above them). Sites are few relative to pages, and the parse is a
one-off on the rules side. The oracle-gated query pins the MATCHING
semantics on synthesized rules; the parser is pinned by its own pytest
cases (comment stripping, group switching, multi-agent groups, empty
Disallow).

Reference analog: none; §2.4 training-data pipeline suite (crawl
compliance beside the URL blocklist).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["crawl_delays", "parse_robots", "robots_annotate", "robots_filter"]


def parse_robots(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> one row per `User-agent: *` rule:
    (host, rtype 'allow'|'disallow', prefix). Comments (#...) stripped,
    matching is case-insensitive on directives, an empty Disallow is the
    spec's 'allow everything' no-op and is dropped."""
    lines = F.split(F.col(txt_col), "\n")
    # state: (in_star: boolean, seen_agent_gap: boolean, rules: array)
    # `aggregate` walks lines in order — group membership is positional
    init = F.struct(
        F.lit(False).alias("in_star"),
        F.lit(True).alias("fresh_group"),
        F.expr(
            "CAST(array() AS array<struct<rtype:string,prefix:string>>)"
        ).alias("rules"),
    )

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*$", ""))
        low = F.lower(line)
        is_agent = low.startswith("user-agent:")
        # strip only the LEADING directive token — a ':' inside a value
        # (e.g. "Disallow: /a:b") must survive
        value = F.trim(
            F.regexp_replace(line, "(?i)^(user-agent|disallow|allow):", "")
        )
        agent = value
        # consecutive user-agent lines open ONE group; any rule line
        # closes it (next user-agent starts a new group)
        in_star = (
            F.when(is_agent & acc.fresh_group, (agent == "*") | acc.in_star)
            .when(is_agent, agent == "*")
            .otherwise(acc.in_star)
        )
        is_dis = low.startswith("disallow:")
        is_all = low.startswith("allow:")
        prefix = value
        emit = acc.in_star & (is_dis | is_all) & (prefix != "")
        rule = F.struct(
            F.when(is_all, F.lit("allow")).otherwise(F.lit("disallow")).alias(
                "rtype"
            ),
            prefix.alias("prefix"),
        )
        # RFC 9309: the run of consecutive User-agent lines that opens a
        # group ends at the FIRST non-blank non-UA line — including
        # unknown directives (Crawl-delay:, Sitemap:). Blank lines are
        # ignored entirely (RFC 9309 drops the 1994 record-separator
        # role), so they neither extend nor terminate the UA run.
        return F.struct(
            in_star.alias("in_star"),
            (is_agent | (acc.fresh_group & (line == ""))).alias(
                "fresh_group"
            ),
            F.when(emit, F.array_append(acc.rules, rule))
            .otherwise(acc.rules)
            .alias("rules"),
        )

    parsed = robots.select(
        F.col(host_col).alias("host"),
        F.aggregate(lines, init, step).getField("rules").alias("_rules"),
    )
    return parsed.select(
        "host", F.explode("_rules").alias("_r")
    ).select("host", F.col("_r.rtype").alias("rtype"), F.col("_r.prefix").alias("prefix"))


def _match_len(rules: Column, path: Column, rtype: str) -> Column:
    """Length of the longest ``rtype`` rule prefix matching ``path``
    (NULL when none matches)."""
    hits = F.filter(
        rules,
        lambda r: (r.getField("rtype") == rtype)
        & path.startswith(r.getField("prefix")),
    )
    return F.array_max(F.transform(hits, lambda r: F.length(r.getField("prefix"))))


def robots_annotate(
    docs: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Adds ``crawl_allowed`` per doc under longest-match semantics.
    ``rules``: (host, rtype, prefix) — from :func:`parse_robots` or any
    policy source. Corpus stays map-only: rules collapse to one broadcast
    array row per host."""
    rule_arrays = rules.groupBy(F.col("host").alias("_rb_host")).agg(
        F.collect_list(F.struct("rtype", "prefix")).alias("_rb_rules")
    )
    joined = docs.join(
        F.broadcast(rule_arrays),
        F.lower(F.col(host_col)) == F.col("_rb_host"),
        "left",
    )
    path = F.col(path_col)
    allow_len = _match_len(F.col("_rb_rules"), path, "allow")
    dis_len = _match_len(F.col("_rb_rules"), path, "disallow")
    allowed = (
        F.when(F.col("_rb_rules").isNull(), F.lit(True))  # no policy
        .when(dis_len.isNull(), F.lit(True))  # nothing disallows
        .otherwise(F.coalesce(allow_len, F.lit(-1)) >= dis_len)
    )
    return joined.withColumn("crawl_allowed", allowed).drop(
        "_rb_host", "_rb_rules"
    )


def robots_filter(
    docs: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Rows whose path the robots policy allows."""
    return (
        robots_annotate(docs, rules, host_col, path_col)
        .filter(F.col("crawl_allowed"))
        .drop("crawl_allowed")
    )


def crawl_delays(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, delay_ms): the ``Crawl-delay`` of
    the ``User-agent: *`` group, as exact integer MILLISECONDS (the
    directive allows decimals — "0.5" is half a second; Bing/Yandex
    semantics, first applicable value wins). Hosts whose star group
    declares no parseable delay emit NULL — the caller supplies its
    politeness default.

    Group membership reuses :func:`parse_robots`'s RFC 9309 walk (a
    ``Crawl-delay`` inside a non-star group never applies), and the
    millisecond conversion is a decimal(12,3) cast times 1000 — exact
    integer arithmetic, no float parsing.
    """
    lines = F.split(F.col(txt_col), "\n")
    init = F.struct(
        F.lit(False).alias("in_star"),
        F.lit(True).alias("fresh_group"),
        F.lit(None).cast("long").alias("delay_ms"),
    )

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*$", ""))
        low = F.lower(line)
        is_agent = low.startswith("user-agent:")
        agent = F.trim(F.regexp_replace(line, "(?i)^user-agent:", ""))
        in_star = (
            F.when(is_agent & acc.fresh_group, (agent == "*") | acc.in_star)
            .when(is_agent, agent == "*")
            .otherwise(acc.in_star)
        )
        is_delay = low.startswith("crawl-delay:")
        value = F.trim(F.regexp_replace(line, "(?i)^crawl-delay:", ""))
        ms = (value.try_cast("decimal(12,3)") * 1000).cast("long")
        new_delay = (
            F.when(
                acc.delay_ms.isNull()
                & acc.in_star
                & is_delay
                & ms.isNotNull(),
                ms,
            )
            .otherwise(acc.delay_ms)
        )
        return F.struct(
            in_star.alias("in_star"),
            (is_agent | (acc.fresh_group & (line == ""))).alias(
                "fresh_group"
            ),
            new_delay.alias("delay_ms"),
        )

    return robots.select(
        F.col(host_col).alias("host"),
        F.aggregate(lines, init, step).getField("delay_ms").alias(
            "delay_ms"
        ),
    )
