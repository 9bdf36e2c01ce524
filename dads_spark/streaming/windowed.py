"""Streaming hour-tier rollup: readStream -> watermark -> windowed agg.

Mirrors ``rollup.rollup_from_raw`` incrementally: one row per
(key, 1-hour window) with count/sum/min/max, late data bounded by the
watermark. For tests/smoke the parquet source + memory sink runs a bounded
backlog to completion synchronously (``run_stream_once``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def streaming_hourly_rollup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str | None,
    watermark: str = "2 hours",
) -> DataFrame:
    val = F.col(value_col) if value_col else F.lit(0.0)
    # watermarks require TIMESTAMP (not NTZ, which parquet reads produce)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.window(ts_col, "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum(val).alias("value_sum"),
            F.min(val).alias("value_min"),
            F.max(val).alias("value_max"),
        )
        .select(*key_cols, F.col("win.start").alias("bucket_ts"),
                "doc_count", "value_sum", "value_min", "value_max")
    )


def run_stream_once(
    spark: SparkSession,
    source_path: str,
    schema,
    key_cols: list[str],
    ts_col: str,
    value_col: str | None,
    query_name: str = "rollup_stream",
) -> DataFrame:
    """Drive a bounded parquet backlog through the streaming rollup and
    return the completed result (memory sink)."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_path)
    )
    agg = streaming_hourly_rollup(stream, key_cols, ts_col, value_col)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_dedup_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    id_col: str,
    ts_col: str,
    watermark: str = "2 hours",
    query_name: str = "dedup_stream",
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` on the id
    over a bounded backlog (state for an id is held only within the
    watermark horizon — the production shape for at-least-once ingestion,
    where re-delivered rows arrive close to the original).

    Returns the deduplicated rows from the memory sink; feeding a source
    containing every row TWICE and hash-matching an oracle over the
    single-copy batch table proves the semantics.
    """
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(source_path)
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([id_col])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
