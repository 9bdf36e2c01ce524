"""Schema evolution on read: unify tier files written under old schemas.

A tier store that lives for years accretes files written by successive
pipeline versions: columns get RENAMED (cnt -> doc_count), ADDED
(lang arrives in v2), and WIDENED (int -> bigint when a counter outgrew
32 bits).  Rewriting petabytes of old files for every schema change is
exactly the re-scan the tier architecture exists to avoid, so the store
must read old files AS IF they carried the current schema — Iceberg
calls this schema evolution; Spark's own ``mergeSchema`` only handles
additions, not renames or widenings, hence this explicit mapping layer.

``align_to_schema`` rewrites one legacy frame to the current schema:
rename per the mapping, cast to the target type (widenings only — the
caller's contract; narrowing would corrupt), fill absent columns with
NULL (or a declared default).  ``read_evolved`` unions any number of
generations with UNION ALL after alignment — the result is
indistinguishable from data written under the current schema, and every
transformation is a zero-cost projection pushed into the scan (no
shuffle, no rewrite, files prune as before because rename mapping is
metadata, not data).

Reference analog: none; spec source BASELINE.json:6 (a decade-retention
tier store cannot freeze its schema). Public semantics: Iceberg schema
evolution (spec, public docs) re-expressed as explicit projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["align_to_schema", "read_evolved"]


def align_to_schema(
    df: DataFrame,
    target: list[tuple[str, str]],
    renames: dict[str, str] | None = None,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Project ``df`` onto ``target`` = [(col, spark_type), ...]:
    ``renames`` maps legacy name -> current name; missing columns fill
    with ``defaults`` (else NULL); every column casts to the target
    type. Output column order is exactly ``target``."""
    renames = renames or {}
    defaults = defaults or {}
    current = {renames.get(c, c): c for c in df.columns}
    cols = []
    for name, typ in target:
        if name in current:
            cols.append(F.col(current[name]).cast(typ).alias(name))
        elif name in defaults:
            cols.append(F.lit(defaults[name]).cast(typ).alias(name))
        else:
            cols.append(F.lit(None).cast(typ).alias(name))
    return df.select(*cols)


def read_evolved(
    frames: list[tuple[DataFrame, dict[str, str] | None]],
    target: list[tuple[str, str]],
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """UNION ALL of every generation aligned to the current schema.
    ``frames`` = [(df, renames_for_that_generation), ...]."""
    if not frames:
        raise ValueError("at least one generation is required")
    out = None
    for df, renames in frames:
        aligned = align_to_schema(df, target, renames, defaults)
        out = aligned if out is None else out.unionByName(aligned)
    return out
