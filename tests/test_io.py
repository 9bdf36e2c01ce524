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


def test_node_diff_roundtrip(tmp_path):
    """write_nodes emits the reference's node-dump format; node_diff
    reproduces node_diff.py's key-matched comparison on real pipeline
    node collections."""
    from dads_spark.fixtures import benchmark_series
    from dads_spark.io import node_diff, write_nodes
    from dads_spark.s2g import S2GParams, s2g_oracle

    params = S2GParams(m=20, c=6, S=30, ell=30)
    x = benchmark_series(2000, seed=5)
    nodes = {
        seg: arr
        for seg, arr in enumerate(s2g_oracle(x, params).nodes_by_segment)
        if len(arr)
    }
    pa, pb = tmp_path / "a.txt", tmp_path / "b.txt"
    n = write_nodes(nodes, str(pa))
    assert n > 0
    # identical dumps -> zero diff
    write_nodes(nodes, str(pb))
    d = node_diff(str(pa), str(pb))
    assert d["count"] == n and d["max_diff"] == 0.0 and d["n_key_mismatch"] == 0
    # perturbed distances -> nonzero max/avg, keys still aligned
    pert = {s: np.asarray(v) + 1e-3 for s, v in nodes.items()}
    write_nodes(pert, str(pb))
    d = node_diff(str(pa), str(pb))
    assert d["count"] == n and np.isclose(d["max_diff"], 1e-3)
    assert np.isclose(d["avg_diff"], 1e-3)


def test_matrix_diff(tmp_path):
    from dads_spark.io import matrix_diff, write_matrix

    rng = np.random.default_rng(3)
    m = rng.normal(size=(5, 4))
    pa, pb = tmp_path / "ma.txt", tmp_path / "mb.txt"
    write_matrix(m, str(pa))
    write_matrix(m, str(pb))
    d = matrix_diff(str(pa), str(pb))
    assert d["count"] == 20 and d["max_diff"] == 0.0
    m2 = m.copy(); m2[2, 1] += 0.25
    write_matrix(m2, str(pb))
    d = matrix_diff(str(pa), str(pb))
    assert np.isclose(d["max_diff"], 0.25) and np.isclose(d["avg_diff"], 0.25 / 20)
    write_matrix(m, str(pb), header="other")
    assert "header_mismatch" in matrix_diff(str(pa), str(pb))


def test_statistics_extract_and_report(spark, tmp_path):
    from dads_spark.io import extract_statistics, metrics_report
    from dads_spark.metrics import StageMetricsCollector

    mc = StageMetricsCollector(spark)
    with mc.stage("agg"):
        spark.range(0, 200_000).selectExpr("id % 5 k").groupBy("k").count().collect()
    with mc.stage("scan"):
        spark.range(0, 1_000).collect()
    csv = tmp_path / "stages.csv"
    summary = extract_statistics(mc.rows(), out_csv=str(csv))
    assert summary["n_stages"] == 2 and summary["stages"] == ["agg", "scan"]
    assert summary["total_wall_sec"] > 0
    lines = csv.read_text().strip().split("\n")
    assert len(lines) == 3 and lines[0].startswith("stage,wall_sec")
    rep = metrics_report(mc.rows(), n_cores=4)
    assert "agg" in rep and "scan" in rep and "util=" in rep and "#" in rep


def test_run_dads_cli_matches_oracle(tmp_path):
    """The reference-shaped CLI (binary in -> score text out) produces
    exactly the oracle's scores, including the accepted-but-ignored
    compatibility flags."""
    import subprocess
    import sys

    from dads_spark.fixtures import benchmark_series
    from dads_spark.io import write_binary_series
    from dads_spark.s2g import S2GParams, s2g_oracle

    x = benchmark_series(3000, seed=2)
    seq = str(tmp_path / "seq.bin")
    out = str(tmp_path / "scores_out")
    write_binary_series(seq, x)
    p = subprocess.run(
        [
            sys.executable, "scripts/run_dads.py",
            "--sequence", seq,
            "--sub-sequence-length", "20", "--convolution-size", "6",
            "--intersection-segments", "30", "--query-length", "30",
            "--output", out, "--threads", "2", "--slices", "3",
            "--distribution", "HETEROGENEOUS",  # warns, falls back
            "--no-smart-scoring", "--min-slaves", "2",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "DADS_RUN" in p.stdout
    got = []
    import glob

    for f in sorted(glob.glob(f"{out}/part-*")):
        with open(f) as fh:
            got.extend(float(line) for line in fh if line.strip())
    want = s2g_oracle(x, S2GParams(m=20, c=6, S=30, ell=30), n_slices=3).scores
    assert len(got) == len(want)
    assert (np.asarray(got) == want).all()  # bit-exact through the text sink
