"""Count-min frequency-sketch tier cascade — fully relational.

The HLL cascade (`rollup/distinct.py`) solves tiered COUNT(DISTINCT);
this module solves tiered item FREQUENCY ("how often did url X appear per
domain per day, without storing per-item rows at week grain"). A count-min
sketch (Cormode-Muthukrishnan, public method) is a d x w counter matrix;
estimates are min over d counters, always >= the true count.

The representation here is deliberately RELATIONAL — one row per
(keys..., bucket_ts, hash_row, hash_col) non-zero counter — because that
makes every sketch operation a plain Spark aggregate:

- BUILD: each item maps to d (row, col) cells via md5-derived hashes
  (engine-portable: Spark ``conv(substr(md5..))`` == DuckDB
  ``('0x'||substr(md5..))::BIGINT``, verified bytewise), exploded JVM-side
  and counted with ONE hash aggregate — map-side partials mean the
  shuffle carries at most d*w cells per (key, bucket), never the items;
- MERGE / CASCADE: counter matrices add cell-wise, so hour -> day -> week
  is ``groupBy(bucket(day), row, col).sum`` over STORED hour cells — the
  same no-raw-re-read contract as the HLL and t-digest cascades;
- ESTIMATE: join a query item's d cells, take min(count) — a missing
  cell means count 0, so the inner-join form emits 0 whenever fewer than
  d cells matched (no outer join over the sketch needed).

Everything is exact integer arithmetic over deterministic hashes: the
whole pipeline (build, cascade, estimate, even the >=-truth guarantee) is
oracle-checkable in ANSI SQL, unlike binary-blob sketch formats.

Reference analog: none (DADS keeps raw series); spec source
BASELINE.json:6 ("continuous aggregates" — frequency queries at coarse
tiers need a mergeable summary; COUNT GROUP BY item does not retire old
item rows, a sketch tier does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .tiers import bucket_expr

__all__ = ["cm_build_tier", "cm_cascade", "cm_estimate"]


def _cm_col(item: Column, i: int, w: int) -> Column:
    """Hash row ``i``'s column index for ``item`` in [0, w): the first 32
    md5 bits of 'cm{i}:' || item, mod w. Engine-portable integer hash."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cm{i}:"), item.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % F.lit(w)


def cm_build_tier(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    item_col: str,
    tier: str = "hour",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Per-(keys, tier bucket) count-min sketch as non-zero cells:
    (keys..., bucket_ts, hrow, hcol, c). One JVM explode (d rows per
    input) + one hash aggregate with map-side partials."""
    item = F.col(item_col)
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("hrow"), _cm_col(item, i, w).alias("hcol"))
            for i in range(d)
        ]
    )
    return (
        df.select(*key_cols, bucket_expr(ts_col, tier), F.explode(cells).alias("_c"))
        .groupBy(*key_cols, "bucket_ts", F.col("_c.hrow").alias("hrow"),
                 F.col("_c.hcol").alias("hcol"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_cascade(
    sketch: DataFrame, key_cols: list[str], to_tier: str
) -> DataFrame:
    """Merge finer-tier sketch cells into ``to_tier`` buckets: counter
    matrices add cell-wise, so the cascade is a plain SUM over stored
    cells — no raw re-read, bit-exact vs building at ``to_tier``."""
    return (
        sketch.groupBy(
            *key_cols, bucket_expr("bucket_ts", to_tier), "hrow", "hcol"
        )
        .agg(F.sum("c").alias("c"))
    )


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    key_cols: list[str],
    item_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-frequency estimates: for each (item row x sketch bucket),
    min over the item's d counters (absent cell = 0). ``items`` must carry
    ``key_cols``; output adds bucket_ts and ``est``.

    The items side is exploded to d probe rows and BROADCAST into an
    inner join on (keys, bucket, hrow, hcol), so the sketch — the big
    side at a year of tiers — streams map-side and never shuffles (the
    usual shape: a dashboard watchlist probing stored sketch cells)."""
    item = F.col(item_col)
    probes = items.select(
        *key_cols,
        item,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hrow"), _cm_col(item, i, w).alias("hcol")
                    )
                    for i in range(d)
                ]
            )
        ).alias("_p"),
    ).select(*key_cols, item_col, F.col("_p.hrow").alias("hrow"),
             F.col("_p.hcol").alias("hcol"))
    buckets = sketch.select(*key_cols, "bucket_ts").distinct()
    grid = probes.join(F.broadcast(buckets), key_cols)
    # INNER broadcast join, probe grid on the build side: the sketch
    # (the big table) streams map-side and never shuffles. A probe cell
    # absent from the sketch means count 0, which forces the min to 0 —
    # so instead of an outer join we count matched cells and emit 0
    # whenever fewer than d matched.
    joined = sketch.join(
        F.broadcast(grid), [*key_cols, "bucket_ts", "hrow", "hcol"]
    )
    return (
        joined.groupBy(*key_cols, "bucket_ts", item_col)
        .agg(
            F.when(F.count(F.lit(1)) < d, F.lit(0))
            .otherwise(F.min("c"))
            .cast("long")
            .alias("est")
        )
        # items whose d cells ALL miss vanish from the inner join: restore
        # them as explicit zero estimates via the (tiny) grid side
        .join(
            grid.select(*key_cols, "bucket_ts", item_col).distinct(),
            [*key_cols, "bucket_ts", item_col],
            "right",
        )
        .withColumn("est", F.coalesce("est", F.lit(0)).cast("long"))
    )
