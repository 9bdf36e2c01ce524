"""Reference-format I/O.

The reference consumes flat binary files of big-endian IEEE-754 doubles with
no header (reference: fileHandling/reading/BinarySequenceReader.java:57,
script/sequence-converter/convert.py:21-23) and emits one decimal score per
line (FileDoubleSink.java:75-87, merged in subsequence order by
FileMerger.java:54-82).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_binary_series(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=">f8").astype(np.float64)


def write_binary_series(path: str, values: np.ndarray) -> None:
    np.asarray(values, dtype=np.float64).astype(">f8").tofile(path)


def binary_series_df(spark: SparkSession, path: str) -> DataFrame:
    """Distributed load of a reference-format series into (idx, value).

    Uses Spark's binaryFile source + one vectorized frombuffer per file;
    suitable for fixture replay (one file = one series). For huge single
    files, slice-range reads per partition would be the scale path.
    """
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("content")

    def decode(it):
        for pdf in it:
            for buf in pdf["content"]:
                vals = np.frombuffer(bytes(buf), dtype=">f8").astype(np.float64)
                yield pd.DataFrame(
                    {"idx": np.arange(len(vals), dtype=np.int64), "value": vals}
                )

    return raw.mapInPandas(decode, "idx long, value double")


def write_scores_text(df: DataFrame, path: str) -> None:
    """Scores as text, one shortest-roundtrip decimal per line, in window
    order (the reference's merged output-file format)."""
    (
        df.orderBy("window_idx")
        .select(F.col("score").cast("string"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
