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
