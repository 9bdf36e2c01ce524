"""Streaming continuous-aggregate maintenance: foreachBatch tier backfill.

The batch path (`rollup/tiers.py:incremental_refresh`) folds a delta into
a tier; this module keeps an ON-DISK hour tier continuously up to date
from an event stream, surviving kills:

- each micro-batch aggregates ITS rows to a delta tier (map-side partial
  per batch — the raw batch never joins history);
- only the touched date partitions of the stored tier are read back,
  merged bucket-wise (`merge_tier`), and rewritten via dynamic partition
  overwrite — a day's ingest touches a day's files, never the history
  (the 100-TB property: work is proportional to the DELTA's bucket span);
- a batch-id ledger file beside the tier makes the merge idempotent
  under Structured Streaming's at-least-once foreachBatch contract: a
  replayed batch (post-crash restart from the stream checkpoint) is
  skipped, so counts never double. Ledger + stream checkpoint together
  give effective exactly-once UP TO the commit window between the parquet
  partition overwrite and the ledger write: a crash exactly inside that
  window replays a batch whose data already landed. Iceberg's
  single-snapshot commit (data + ledger property in one atomic swap)
  closes that window — the per-partition overwrite here is its documented
  parquet stand-in (README "Iceberg proper").

Reference analog: none (DADS is batch over binary files); spec source
BASELINE.json:6,14 — "continuous aggregates", "resumes from the last
committed tier".
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..rollup.tiers import merge_tier, rollup_from_raw

__all__ = ["run_tier_backfill_stream", "read_backfill_tier"]

_LEDGER = "_batch_ledger.json"


def _ledger_path(tier_path: str) -> str:
    return os.path.join(tier_path, _LEDGER)


def _committed_batch(tier_path: str) -> int:
    try:
        with open(_ledger_path(tier_path)) as fh:
            return int(json.load(fh)["batch_id"])
    except (OSError, ValueError, KeyError):
        return -1


def read_backfill_tier(spark: SparkSession, tier_path: str) -> DataFrame:
    """The stored tier (empty-with-schema if nothing committed yet)."""
    try:
        return spark.read.parquet(tier_path).drop("bucket_date")
    except Exception:
        return None  # caller treats as empty


def _read_touched(spark: SparkSession, path: str, dates) -> DataFrame | None:
    if not os.path.isdir(path):
        return None
    if not (
        os.path.exists(os.path.join(path, "_SUCCESS"))
        or any(e.startswith("bucket_date=") for e in os.listdir(path))
    ):
        return None
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket_date").isin(dates))
        .drop("bucket_date")
    )


def _overwrite_touched(staged: DataFrame, path: str) -> None:
    (
        staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_date")
        .parquet(path)
    )


def _merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    key_cols: list[str],
    ts_col: str,
    value_col: str | None,
    tier_path: str,
    tier: str,
    distinct_item_col: str | None = None,
) -> None:
    if batch_id <= _committed_batch(tier_path):
        return  # replayed batch: already folded in, skip (idempotence)
    delta = rollup_from_raw(batch_df, key_cols, ts_col, value_col, tier)
    delta = delta.withColumn("bucket_date", F.to_date("bucket_ts")).cache()
    dates = [r["bucket_date"] for r in delta.select("bucket_date").distinct().collect()]
    existing = _read_touched(spark, tier_path, dates)
    if existing is not None:
        # localCheckpoint materializes the merge BEFORE the overwrite so
        # the plan no longer reads the path it is about to replace
        staged = (
            merge_tier(existing, delta.drop("bucket_date"), key_cols)
            .withColumn("bucket_date", F.to_date("bucket_ts"))
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    else:  # first batch: nothing stored yet, write the delta directly
        staged = delta.coalesce(1)
    _overwrite_touched(staged, tier_path)
    delta.unpersist()

    if distinct_item_col is not None:
        # co-maintained HLL distinct tier: register-max union with the
        # stored sketches — the non-decomposable aggregate the plain
        # count/sum merge cannot carry (distinct users per bucket).
        # HLL union is associative+idempotent ON REGISTERS, but replaying
        # a batch would still be wrong only for the VALUE tier; the
        # shared ledger already gates both.
        from ..rollup.distinct import distinct_sketch_tier

        sk_path = tier_path + "_distinct"
        os.makedirs(sk_path, exist_ok=True)
        sk_delta = (
            distinct_sketch_tier(batch_df, key_cols, ts_col, distinct_item_col, tier)
            .withColumn("bucket_date", F.to_date("bucket_ts"))
            .cache()
        )
        sk_dates = [
            r["bucket_date"]
            for r in sk_delta.select("bucket_date").distinct().collect()
        ]
        sk_existing = _read_touched(spark, sk_path, sk_dates)
        if sk_existing is not None:
            sk_staged = (
                sk_existing.unionByName(sk_delta.drop("bucket_date"))
                .groupBy(*key_cols, "bucket_ts")
                .agg(F.hll_union_agg("distinct_hll").alias("distinct_hll"))
                .withColumn("bucket_date", F.to_date("bucket_ts"))
                .coalesce(1)
                .localCheckpoint(eager=True)
            )
        else:
            sk_staged = sk_delta.coalesce(1)
        _overwrite_touched(sk_staged, sk_path)
        sk_delta.unpersist()
    # Atomic commit: a crash mid-write must not leave truncated JSON
    # (truncated -> _committed_batch falls back to -1 -> the replayed
    # batch double-counts into a tier that already contains it). Same
    # temp-file + os.replace pointer swap as SnapshotStore._append.
    ledger = _ledger_path(tier_path)
    tmp = ledger + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"batch_id": batch_id}, fh)
    os.replace(tmp, ledger)


def run_tier_backfill_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    key_cols: list[str],
    ts_col: str,
    value_col: str | None,
    tier_path: str,
    checkpoint_dir: str,
    tier: str = "hour",
    max_files_per_trigger: int = 1,
    fail_after_batches: int | None = None,
    state_partitions: int | None = 4,
    distinct_item_col: str | None = None,
) -> int:
    """Drive the parquet backlog at ``source_path`` through foreachBatch
    tier maintenance until exhausted (availableNow trigger). Restartable:
    the stream checkpoint replays uncommitted batches, the ledger skips
    committed ones. ``fail_after_batches`` injects a crash after N merges
    (tests the kill/resume contract). ``distinct_item_col`` additionally
    co-maintains an HLL distinct-count tier at ``<tier_path>_distinct``
    (register-union merges — the continuous aggregate COUNT(DISTINCT)
    needs but plain merge cannot carry). Returns the number of batches
    this RUN folded in (a resumed run folds only the uncommitted tail)."""
    os.makedirs(tier_path, exist_ok=True)
    seen = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if fail_after_batches is not None and seen["n"] >= fail_after_batches:
            raise RuntimeError("injected failure for resume test")
        _merge_batch(
            spark, batch_df, batch_id, key_cols, ts_col, value_col, tier_path,
            tier, distinct_item_col,
        )
        seen["n"] += 1

    from .windowed import sized_state_partitions

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_path)
    )
    # foreachBatch holds no state stores, but the per-batch merge groupBy
    # still plans spark.sql.shuffle.partitions tasks over a handful of
    # tier rows — size it to the delta, and skip the trailing no-data
    # batch (nothing emits on it here)
    with sized_state_partitions(spark, state_partitions, no_data_batches=False):
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return seen["n"]
