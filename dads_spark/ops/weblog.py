"""Combined-log-format (CLF) access-log parsing as one codegen projection.

Web server access logs are the raw input of every traffic time series —
before any rollup there is a text line per request:

  ip ident user [21/Mar/2024:13:55:36 +0000] "GET /p/1 HTTP/1.1"
      200 2326 "referer" "user-agent"

This parser turns the Apache combined format into typed columns with
regexp_extract per capture group over ONE anchored pattern — the regex
compiles once per task and the whole projection is whole-stage codegen,
map-only (the robots/blocklist discipline: log parsing must never
shuffle).  Derived columns:

- ``status_class``  ('2xx'..'5xx') — the rollup key for availability
- ``n_bytes``       BIGINT, the CLF '-' (no body) mapped to 0
- ``iso_ts``        'YYYY-MM-DD HH:MM:SS' normalized from the CLF
                    %d/%b/%Y clock (month-name CASE map — no locale,
                    no timezone machinery), plus ``tz`` kept verbatim
- ``is_bot``        declared crawlers by UA marker (bot/crawler/spider/
                    curl/wget substring match, the standard first cut;
                    gap-regularity bot detection covers the UNdeclared
                    ones from timing)

Malformed lines (pattern miss) survive with NULL fields and
``parsed = 0`` rather than vanishing — at 100 TB the malformed-line
RATE is itself a monitored signal.

Reference analog: none; §2.4 web-ingest spine. Format: Apache
mod_log_config "combined" (public documentation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["parse_clf"]

_CLF_RE = (
    r'^(\S+) (\S+) (\S+) \[(\d{2})/([A-Za-z]{3})/(\d{4}):'
    r'(\d{2}:\d{2}:\d{2}) ([+-]\d{4})\] "(\S+) (\S+) ([^"]*)" '
    r'(\d{3}) (\S+) "([^"]*)" "([^"]*)"$'
)

_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]

_BOT_MARKERS = ["bot", "crawler", "spider", "curl", "wget"]


def _g(line: Column, i: int) -> Column:
    return F.regexp_extract(line, _CLF_RE, i)


def parse_clf(df: DataFrame, line_col: str) -> DataFrame:
    """Parse ``line_col`` into typed request columns; unparseable lines
    keep NULLs with parsed = 0."""
    line = F.col(line_col)
    ok = _g(line, 12) != ""  # status matched => whole pattern matched
    mon = _g(line, 5)
    mon_num = F.lit(None).cast("string")
    for i, m in enumerate(_MONTHS):
        mon_num = F.when(mon == m, F.lit(f"{i + 1:02d}")).otherwise(mon_num)
    iso = F.concat(
        _g(line, 6), F.lit("-"), mon_num, F.lit("-"), _g(line, 4),
        F.lit(" "), _g(line, 7),
    )
    ua = _g(line, 15)
    ua_l = F.lower(ua)
    is_bot = F.lit(False)
    for marker in _BOT_MARKERS:
        is_bot = is_bot | (F.instr(ua_l, marker) > 0)
    nb = _g(line, 12 + 1)
    status = _g(line, 12)

    def _n(c: Column) -> Column:
        return F.when(ok, c)

    return df.select(
        "*",
        ok.cast("long").alias("parsed"),
        _n(_g(line, 1)).alias("ip"),
        _n(iso).alias("iso_ts"),
        _n(_g(line, 8)).alias("tz"),
        _n(_g(line, 9)).alias("method"),
        _n(_g(line, 10)).alias("path"),
        _n(status.cast("long")).alias("status"),
        _n(F.concat(F.substring(status, 1, 1), F.lit("xx"))).alias(
            "status_class"
        ),
        _n(
            F.when(nb == "-", F.lit(0)).otherwise(nb.cast("long"))
        ).alias("n_bytes"),
        _n(_g(line, 14)).alias("referer"),
        _n(ua).alias("user_agent"),
        _n(is_bot.cast("long")).alias("is_bot"),
    )
