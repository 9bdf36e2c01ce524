"""Z-order (Morton) clustering for two-dimensional tier-file pruning.

``compact_tier`` range-clusters on ONE sort key, which makes parquet
min/max footer pruning perfect along that key and useless along any
other: a layout sorted by (domain, bucket_ts) answers "one domain, any
time" from few files but "all domains, one hour" from ALL of them. The
standard warehouse fix (Delta/Iceberg OPTIMIZE ZORDER, public technique)
interleaves the bits of both keys into one Morton value and range-clusters
on THAT: every file then covers a roughly-square tile of the (x, y) grid,
so a predicate on EITHER dimension prunes ~sqrt-fraction of the files
instead of none.

The interleave is pure integer bit arithmetic — built here as a JVM
expression tree (shiftright/shiftleft/AND summed over disjoint bit
positions), whole-stage-codegen friendly, no Python, and reproducible
bit-for-bit in ANSI SQL, so the value itself is oracle-checkable. The
write path is the same ``repartitionByRange`` + ``sortWithinPartitions``
+ ``maxRecordsPerFile`` shape as ``compact_tier`` with ``zvalue`` as the
range key; tests pin the tiling property (per-partition bounding boxes
shrink in BOTH dimensions vs a 1-D layout).

Reference analog: none; spec source BASELINE.json:6,14 (Iceberg
hidden-partitioned tier tables; the retention/compaction engine owns file
layout — multi-dimensional serving predicates are the rule for tiers
keyed by (domain bucket, time bucket)).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zvalue", "zorder_write"]


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints:
    bit k of x lands at position 2k, bit k of y at 2k+1. Caller masks /
    buckets inputs into [0, 2^bits); higher bits are ignored."""
    terms = []
    for k in range(bits):
        xb = F.shiftleft(F.shiftright(x.cast("long"), k).bitwiseAND(F.lit(1)), 2 * k)
        yb = F.shiftleft(
            F.shiftright(y.cast("long"), k).bitwiseAND(F.lit(1)), 2 * k + 1
        )
        terms.append(xb + yb)  # disjoint bit positions: sum == OR
    return functools.reduce(lambda a, b: a + b, terms)


def zvalue_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL expression string (DuckDB
    dialect-compatible) — the oracle twin of :func:`zvalue`."""
    terms = []
    for k in range(bits):
        terms.append(f"((({x_expr} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({y_expr} >> {k}) & 1) << {2 * k + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    out_path: str,
    target_files: int = 8,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite ``df`` at ``out_path`` as ``target_files`` Morton-clustered
    parquet files: range-partitioned and sorted by the interleave of
    (x_col, y_col). One shuffle, sized by the tier being rewritten."""
    z = zvalue(F.col(x_col), F.col(y_col), bits).alias("_zv")
    out = (
        df.withColumn("_zv", z)
        .repartitionByRange(target_files, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_path)
