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


def test_offline_toolkit(tmp_path):
    import numpy as np

    from dads_spark.io import (
        convert_text_to_binary,
        read_binary_series,
        replicate_series,
        score_diff,
    )

    txt = tmp_path / "series.txt"
    txt.write_text("1.5\n-2.25\n0.0\n3.125\n")
    binp = str(tmp_path / "series.bin")
    assert convert_text_to_binary(str(txt), binp) == 4
    assert (read_binary_series(binp) == [1.5, -2.25, 0.0, 3.125]).all()

    big = str(tmp_path / "big.bin")
    assert replicate_series(binp, big, 11) == 11
    vals = read_binary_series(big)
    assert (vals[:4] == [1.5, -2.25, 0.0, 3.125]).all() and vals[4] == 1.5

    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("1.0\n2.0\n3.0\n")
    b.write_text("1.0\n2.5\n3.0\n")
    d = score_diff(str(a), str(b))
    assert d["count"] == 3 and d["max_diff"] == 0.5 and d["n_exact"] == 2
    assert np.isclose(d["avg_diff"], 0.5 / 3)
