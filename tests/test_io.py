"""Reference-format I/O: big-endian binary series + text score sink."""

from __future__ import annotations

import struct

import numpy as np

from dads_spark.io import (
    binary_series_df,
    read_binary_series,
    write_binary_series,
    write_scores_text,
)


def test_binary_roundtrip(tmp_path):
    path = str(tmp_path / "series.bin")
    x = np.array([4.4, 5.5, 6.6, 7.7])  # the reference's own smoke fixture
    write_binary_series(path, x)
    # byte-level check: big-endian IEEE-754, no header
    # (reference: script/sequence-converter/convert.py:21-23)
    raw = open(path, "rb").read()
    assert len(raw) == 32
    assert struct.unpack("!d", raw[:8])[0] == 4.4
    got = read_binary_series(path)
    assert np.array_equal(got, x)


def test_binary_series_df(spark, tmp_path):
    path = str(tmp_path / "series2.bin")
    x = np.sin(np.arange(500) / 7.0)
    write_binary_series(path, x)
    df = binary_series_df(spark, path).orderBy("idx").toPandas()
    assert len(df) == 500
    assert np.array_equal(df["value"].to_numpy(), x)


def test_scores_text_sink(spark, tmp_path):
    out = str(tmp_path / "scores_out")
    df = spark.createDataFrame(
        [(0, 0.25), (2, 0.75), (1, 0.5)], "window_idx long, score double"
    )
    write_scores_text(df, out)
    import glob

    files = glob.glob(out + "/part-*")
    lines = open(files[0]).read().splitlines()
    assert lines == ["0.25", "0.5", "0.75"]  # window order, one decimal per line
