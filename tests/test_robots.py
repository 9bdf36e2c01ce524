"""robots.txt parsing + longest-match policy filtering (ops/robots.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dads_spark.ops import parse_robots, robots_annotate, robots_filter

ROBOTS_A = """# site A
User-agent: googlebot
Disallow: /gb-only

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp

User-agent: weirdbot
Disallow: /
"""

ROBOTS_B = """User-agent: badbot
User-agent: *
Disallow: /all:colons
Disallow:
Allow: /
"""


ROBOTS_C = """User-agent: *
Crawl-delay: 1
User-agent: badbot
Disallow: /
"""

ROBOTS_D = """User-agent: badbot

User-agent: *
Sitemap: https://d.com/sitemap.xml
Disallow: /blocked
"""


def _rules(spark):
    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)], "host string, robots_txt string"
    )
    return parse_robots(robots)


def test_parse_robots_star_group_only(spark):
    got = sorted(map(tuple, _rules(spark).collect()))
    assert got == [
        ("a.com", "allow", "/private/ok"),
        ("a.com", "disallow", "/private"),
        ("a.com", "disallow", "/tmp"),
        # b.com: multi-agent header containing *, colon kept in value,
        # empty Disallow dropped
        ("b.com", "allow", "/"),
        ("b.com", "disallow", "/all:colons"),
    ]


def test_unknown_directive_ends_ua_run_blank_does_not(spark):
    """RFC 9309 group boundaries: a non-blank non-UA line (Crawl-delay,
    Sitemap) terminates the User-agent run, so a later UA line opens a
    NEW group instead of merging; blank lines are ignored entirely and
    neither extend nor break the run."""
    robots = spark.createDataFrame(
        [("c.com", ROBOTS_C), ("d.com", ROBOTS_D)],
        "host string, robots_txt string",
    )
    got = sorted(map(tuple, parse_robots(robots).collect()))
    # c.com: `Disallow: /` binds ONLY to badbot (Crawl-delay closed the *
    # group) -> no * rules at all. d.com: blank line between UA lines
    # keeps one group containing *, Sitemap is an in-group unknown
    # directive -> Disallow /blocked applies to *.
    assert got == [("d.com", "disallow", "/blocked")]


def test_matching_longest_wins_allow_beats_disallow(spark):
    rules = _rules(spark)
    docs = spark.createDataFrame(
        [
            (1, "a.com", "/public/x"),        # no rule matches -> allowed
            (2, "a.com", "/private/x"),       # disallow /private wins
            (3, "a.com", "/private/ok/x"),    # longer allow overrides
            (4, "a.com", "/tmp"),             # exact disallow
            (5, "b.com", "/all:colons/x"),    # /all:colons (11) > / (1)
            (6, "b.com", "/anything"),        # allow / vs no disallow match
            (7, "c.com", "/no/policy"),       # host without robots
        ],
        "doc_id long, host string, path string",
    )
    got = {
        r["doc_id"]: r["crawl_allowed"]
        for r in robots_annotate(docs, rules).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: False, 5: False, 6: True, 7: True}
    kept = sorted(r["doc_id"] for r in robots_filter(docs, rules).collect())
    assert kept == [1, 3, 6, 7]


def test_corpus_side_stays_broadcast(spark):
    rules = _rules(spark)
    docs = spark.createDataFrame(
        [(1, "a.com", "/x")], "doc_id long, host string, path string"
    )
    plan = (
        robots_annotate(docs, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def _delays(spark, txt):
    from dads_spark.ops import crawl_delays

    df = spark.createDataFrame(
        [("h.example.com", txt)], "host string, robots_txt string"
    )
    return crawl_delays(df).collect()[0]["delay_ms"]


def test_crawl_delay_star_group(spark):
    assert _delays(
        spark, "User-agent: *\nCrawl-delay: 2\nDisallow: /x"
    ) == 2000


def test_crawl_delay_decimal_is_exact_millis(spark):
    assert _delays(spark, "User-agent: *\nCrawl-delay: 0.5") == 500
    assert _delays(spark, "User-agent: *\nCrawl-delay: 1.25") == 1250


def test_crawl_delay_other_group_does_not_apply(spark):
    txt = "User-agent: badbot\nCrawl-delay: 99\n\nUser-agent: *\nDisallow: /x"
    assert _delays(spark, txt) is None


def test_crawl_delay_first_applicable_wins(spark):
    txt = "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7"
    assert _delays(spark, txt) == 3000


def test_crawl_delay_unparseable_ignored(spark):
    assert _delays(spark, "User-agent: *\nCrawl-delay: soon") is None


def test_crawl_delay_comment_stripped(spark):
    assert _delays(
        spark, "User-agent: * # all bots\nCrawl-delay: 4 # secs"
    ) == 4000
