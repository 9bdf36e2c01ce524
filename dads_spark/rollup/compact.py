"""Tier-store compaction: bin-packed, range-clustered parquet rewrite.

Continuous aggregates are written incrementally (per micro-batch, per
backfill slice, per resumed checkpoint stage), so a long-lived tier store
accretes many small files — the classic warehouse pathology: at 10^12 docs
an hour tier appended hourly for a year is ~9k write jobs, each spraying
one file per shuffle partition, and every read pays open/footer/seek costs
per file plus a task per file in the scan. Compaction rewrites a tier
directory into few, large, range-clustered files:

- ``repartitionByRange`` on the serving predicate columns (key, bucket_ts)
  bin-packs rows into ``target_files`` balanced output partitions using a
  sampled range boundary — one shuffle sized by the TIER (orders of
  magnitude below raw), never the raw table;
- ``sortWithinPartitions`` clusters rows so parquet row-group min/max
  statistics become disjoint across files: a reader filtering on key or
  time range prunes whole files/row-groups from the footer alone, the
  same serving property Iceberg's hidden partitioning + sort orders give
  (parquet ``partitionBy`` is this repo's documented Iceberg stand-in,
  README "Iceberg proper");
- ``maxRecordsPerFile`` caps any single file so one hot range cannot
  produce an unsplittable giant.

The rewrite is data-identical by construction (a repartition + sort
changes layout, never content); `compact_roundtrip` in the query registry
pins that cross-engine (read-back == DuckDB aggregate of raw), and
tests/test_compact_distinct.py pins the file-count and per-file
range-disjointness properties.

Reference analog: none (DADS holds series in memory across actors); spec
source BASELINE.json:6 — a "retention engine" that rewrites tiers on a
schedule owns the file-layout problem too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["compact_tier", "file_stats"]


def compact_tier(
    df: DataFrame,
    range_cols: list[str],
    out_path: str,
    target_files: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite ``df`` at ``out_path`` as ``target_files`` range-clustered
    parquet files, sorted by ``range_cols`` within each file."""
    packed = df.repartitionByRange(target_files, *[F.col(c) for c in range_cols])
    packed = packed.sortWithinPartitions(*range_cols)
    writer = packed.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(out_path)


def file_stats(spark: SparkSession, path: str, range_cols: list[str]) -> DataFrame:
    """Per-file layout audit over a parquet directory: row count and
    min/max of each range column, one row per physical file. Used by the
    tests to assert bin-packing (few files, balanced rows) and clustering
    (per-file ranges disjoint => footer-only pruning works)."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in range_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def compaction_plan(
    stats: DataFrame,
    rows_col: str = "n_rows",
    min_files: int = 4,
    max_tier: int = 40,
) -> DataFrame:
    """Size-tiered compaction PLANNER over a file-stats table — the
    LSM-style policy (Cassandra/RocksDB size-tiered, HBase minor
    compaction): bucket files into power-of-two size tiers by row
    count and schedule a merge for every tier holding >= ``min_files``
    files. Separating the plan from the rewrite makes the policy
    auditable and cheap: the planner reads footer statistics only;
    ``compact_tier`` executes the chosen rewrites.

    Exactness: the size tier is floor(log2(rows)) computed WITHOUT
    floating log — a broadcast join against the 41-row powers-of-two
    table takes max(k : 2^k <= rows), so tier assignment can never
    flip on a libm boundary. All outputs are exact longs.

    Output: one row per size tier — (size_tier, n_files, total_rows,
    min_rows, max_rows, compact) with ``compact`` = 1 when the tier
    merges. Scale shape: the stats table is one row per FILE (footer
    metadata, not data); the join broadcasts the tiny powers table and
    the rollup is one bounded-key aggregate.
    """
    spark = stats.sparkSession
    pows = spark.createDataFrame(
        [(k, 1 << k) for k in range(max_tier + 1)], "k long, p long"
    )
    tiered = (
        stats.select(F.col(rows_col).cast("long").alias("_r"))
        .join(F.broadcast(pows), F.col("p") <= F.col("_r"))
        .groupBy("_r")
        .agg(F.max("k").alias("size_tier"))
        .join(stats.select(F.col(rows_col).cast("long").alias("_r")), "_r")
    )
    return (
        tiered.groupBy("size_tier")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("_r").alias("total_rows"),
            F.min("_r").alias("min_rows"),
            F.max("_r").alias("max_rows"),
        )
        .select(
            "size_tier",
            "n_files",
            "total_rows",
            "min_rows",
            "max_rows",
            F.when(F.col("n_files") >= min_files, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("compact"),
        )
    )
