"""Streaming KMV sketch store: continuous COUNT(DISTINCT) state that
needs no exactly-once machinery.

The batch KMV tier (rollup/distinct.py) is mergeable; this maintains a
per-key bottom-k digest store under a file stream. The property worth
the lane: KMV merge is IDEMPOTENT and commutative — re-folding an
already-folded batch unions the same digests and changes nothing — so
unlike the counting tiers (backfill.py, which needs its batch ledger to
avoid double counts), the sketch store is exactly-once FOR FREE: crash,
replay, out-of-order redelivery all converge to the same state, which
is bit-identical to sketching the full history in one batch (pinned by
the gate against the batch SQL oracle).

State size is |keys| x k digests regardless of stream length; each
micro-batch costs one distinct on the batch delta + a bottom-k over
(stored ∪ delta) per key — never a rescan of history.

Reference analog: none (the reference is batch); SURVEY §2.3 north-rule
suite — the streaming face of the KMV cascade.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _sketch(df: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    rn = F.row_number().over(W.partitionBy(*key_cols).orderBy("_h"))
    return (
        df.distinct()
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list("_h")).alias("kmv"))
    )


def run_kmv_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    key_cols: list[str],
    item_col: str,
    store_path: str,
    checkpoint_dir: str,
    k: int = 64,
    max_files_per_trigger: int = 1,
) -> int:
    """Fold the parquet backlog at ``source_path`` into the sketch
    store (availableNow trigger). Returns the number of batches folded.

    The store swap is tmp-write + rename; a crash between the renames
    leaves the PREVIOUS store, and the checkpoint replays the batch —
    idempotent by the KMV merge property, so no ledger is needed."""
    from .windowed import sized_state_partitions

    folded = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.select(
            *key_cols,
            F.md5(F.col(item_col).cast("string")).alias("_h"),
        )
        if os.path.exists(f"{store_path}/_SUCCESS"):
            prev = (
                spark.read.parquet(store_path)
                .select(*key_cols, F.explode("kmv").alias("_h"))
            )
            delta = delta.unionByName(prev)
        new = _sketch(delta, key_cols, k)
        tmp = f"{store_path}__new"
        new.write.mode("overwrite").parquet(tmp)
        old = f"{store_path}__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(store_path):
            os.rename(store_path, old)
        os.rename(tmp, store_path)
        shutil.rmtree(old, ignore_errors=True)
        folded["n"] += 1

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_path)
    )
    with sized_state_partitions(spark, 4, no_data_batches=False):
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return folded["n"]
