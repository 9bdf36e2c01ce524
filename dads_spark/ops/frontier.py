"""Crawl-frontier scheduling: politeness-constrained fetch ordering.

A recrawl/backfill pipeline holds a frontier of (host, url, priority)
candidates; fetches must respect per-host politeness (one request per
``delay`` seconds per host) while keeping crawler workers busy. The
deterministic schedule:

- hosts shard to ``n_workers`` by hash (a host's requests always hit one
  worker, so politeness is enforceable locally — the same key discipline
  a distributed crawler like the Common Crawl fetcher uses);
- within a host, urls rank by (priority DESC, url ASC) — a total order;
- a url's earliest fetch offset is (host_rank - 1) * delay seconds;
- each worker interleaves its hosts by (offset, priority DESC, url) into
  one fetch sequence.

Everything is window functions over ONE shuffle keyed by host (worker id
is a host-derived column, so the per-worker ordering reuses the same
exchange via a window over worker) — no Python, no driver loops; the
frontier can be billions of rows.

Reference analog: none; §2.4 training-data suite (web-ingest spine:
robots_policy decides WHETHER to fetch, this decides WHEN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["frontier_schedule"]


def frontier_schedule(
    frontier: DataFrame,
    n_workers: int,
    delay_sec: int = 30,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    worker_col: str | None = None,
    delay_ms_col: str | None = None,
) -> DataFrame:
    """(host, url, priority) -> (host, url, worker, fetch_offset_sec,
    fetch_order) with per-host politeness spacing and a total per-worker
    fetch order. Deterministic for any partitioning: worker assignment
    hashes the host (non-negative pmod of a 64-bit xxhash), ranks break
    ties on url. Pass ``worker_col`` to plug an externally computed
    host->worker sharding (consistent-hash ring, locality map, or a
    cross-engine hash for oracle gating) — it must be host-functional
    (one worker per host) for politeness to hold.

    ``delay_ms_col`` switches to PER-HOST politeness (a host-functional
    millisecond column — robots.txt ``Crawl-delay`` via
    :func:`dads_spark.ops.robots.crawl_delays`, coalesced with the
    crawler's default): offsets become ``fetch_offset_ms`` =
    (rank-1) * that host's delay, the per-host generalization of the
    uniform ``delay_sec`` spacing."""
    w_host = W.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col)
    )
    worker = (
        F.col(worker_col).cast("int")
        if worker_col
        else F.pmod(F.xxhash64(F.col(host_col)), F.lit(n_workers)).cast("int")
    )
    if delay_ms_col:
        offset_col = "fetch_offset_ms"
        offset = (
            (F.row_number().over(w_host) - 1) * F.col(delay_ms_col)
        ).cast("long")
    else:
        offset_col = "fetch_offset_sec"
        offset = ((F.row_number().over(w_host) - 1) * delay_sec).cast(
            "long"
        )
    staged = frontier.select(
        F.col(host_col),
        F.col(url_col),
        F.col(priority_col),
        worker.alias("worker"),
        offset.alias(offset_col),
    )
    w_worker = W.partitionBy("worker").orderBy(
        F.col(offset_col),
        F.col(priority_col).desc(),
        F.col(url_col),
    )
    return staged.select(
        host_col,
        url_col,
        "worker",
        offset_col,
        F.row_number().over(w_worker).cast("long").alias("fetch_order"),
    )
