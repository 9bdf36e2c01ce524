"""Per-stage checkpoint manifest with lineage + row-count metrics.

north rule (BASELINE.json:6,14): every rollup stage checkpoints
per-partition lineage and row counts so a killed job resumes from the last
committed tier.

Design: each stage commit writes
- the stage output itself (parquet, atomic via Spark's _SUCCESS semantics)
- a manifest row table ``<root>/_manifest/stage=<name>/`` holding one row
  per output partition: (stage, partition_id, row_count, input_fingerprint,
  committed_at)

``input_fingerprint`` is a stable hash of the stage's declared inputs
(paths + parameters), so resuming with *changed* inputs invalidates the
checkpoint instead of silently reusing it. The runner (``TieredRollupJob``)
skips any stage whose manifest is present AND fingerprint-matched, giving
resume-from-last-committed-tier.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def fingerprint(payload: dict) -> str:
    return hashlib.sha256(json.dumps(payload, sort_keys=True, default=str).encode()).hexdigest()[:16]


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, "_manifest", f"stage={stage}")

    def is_committed(self, stage: str, input_fp: str) -> bool:
        path = self._manifest_path(stage)
        try:
            rows = self.spark.read.parquet(path).select("input_fingerprint").distinct().collect()
        except Exception:
            return False
        return len(rows) == 1 and rows[0][0] == input_fp

    def commit(self, stage: str, df: DataFrame, input_fp: str) -> DataFrame:
        """Write stage output + manifest; returns the reloaded output."""
        out_path = self._stage_path(stage)
        df.write.mode("overwrite").parquet(out_path)
        written = self.spark.read.parquet(out_path)
        manifest = (
            written.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("row_count"))
            .withColumn("stage", F.lit(stage))
            .withColumn("input_fingerprint", F.lit(input_fp))
            .withColumn("committed_at", F.lit(time.time()))
        )
        manifest.write.mode("overwrite").parquet(self._manifest_path(stage))
        return written

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._stage_path(stage))

    def metrics(self, stage: str) -> list:
        return self.spark.read.parquet(self._manifest_path(stage)).collect()


class TieredRollupJob:
    """Resumable hour->day->week rollup over a raw bucketed source.

    Each tier is one checkpointed stage; a rerun skips committed tiers (same
    inputs), recomputing only what is missing — the kill/resume contract.
    """

    def __init__(self, spark: SparkSession, ckpt_root: str, key_cols: list[str]):
        from ..metrics import StageMetricsCollector

        self.ckpt = CheckpointManager(spark, ckpt_root)
        self.key_cols = key_cols
        self.ran_stages: list[str] = []
        self.skipped_stages: list[str] = []
        self.metrics = StageMetricsCollector(spark)

    def run(self, raw: DataFrame, ts_col: str, value_col: str | None, input_desc: dict):
        from ..rollup.tiers import cascade, rollup_from_raw

        fp = fingerprint({**input_desc, "keys": self.key_cols, "value": value_col})
        outputs = {}
        prev_tier = None
        for tier in ("hour", "day", "week"):
            stage = f"tier_{tier}"
            if self.ckpt.is_committed(stage, fp):
                outputs[tier] = self.ckpt.load(stage)
                self.skipped_stages.append(stage)
            else:
                if tier == "hour":
                    df = rollup_from_raw(raw, self.key_cols, ts_col, value_col, "hour")
                else:
                    df = cascade(outputs[prev_tier], self.key_cols, tier)
                with self.metrics.stage(stage):
                    outputs[tier] = self.ckpt.commit(stage, df, fp)
                self.ran_stages.append(stage)
            prev_tier = tier
        if self.ran_stages:  # pure-resume reruns keep the prior metrics table
            self.metrics.write(self.ckpt.root)
        return outputs
