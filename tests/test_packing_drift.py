"""Sequence packing (ops/packing.py) and TV drift (rollup/drift.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dads_spark.ops.packing import pack_sequences
from dads_spark.rollup.drift import tv_drift


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"),
        (F.pmod(F.hash(F.col("id")), F.lit(900)) + 10).alias("n_toks"),
    )


def test_packing_invariants(spark):
    out = pack_sequences(_docs(spark), ["lang"], "doc_id", "n_toks", 2048).toPandas()
    assert (out["bin_offset"] >= 0).all() and (out["bin_offset"] < 2048).all()
    assert (out["spans_boundary"] == (out["bin_offset"] + out["n_tokens"] > 2048)).all()
    for lang, grp in out.sort_values("doc_id").groupby("lang"):
        # greedy fill: bin ids are non-decreasing, start at 0, and the
        # running offset reconstructs the cumulative token stream exactly
        assert grp["bin_id"].iloc[0] == 0
        assert (grp["bin_id"].diff().dropna() >= 0).all()
        cum = grp["n_tokens"].cumsum() - grp["n_tokens"]
        assert ((cum // 2048).to_numpy() == grp["bin_id"].to_numpy()).all()
        assert ((cum % 2048).to_numpy() == grp["bin_offset"].to_numpy()).all()


def test_packing_repartition_invariant(spark):
    docs = _docs(spark)
    a = pack_sequences(docs.coalesce(1), ["lang"], "doc_id", "n_toks", 2048)
    b = pack_sequences(
        docs.repartition(7, "doc_id"), ["lang"], "doc_id", "n_toks", 2048
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _drift_events(spark, shifted: bool):
    # 14 days of data: baseline week ~ Uniform(0,100); second week either
    # identical (no drift) or shifted +100 (total drift)
    base = spark.range(2_000).select(
        F.lit("t").alias("event_type"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % (7 * 86_400)).alias("ts"),
        (F.pmod(F.hash("id"), F.lit(1000)) / 10.0).alias("value"),
    )
    second = spark.range(2_000).select(
        F.lit("t").alias("event_type"),
        F.timestamp_seconds(
            F.lit(1_700_000_000 + 7 * 86_400) + F.col("id") % (7 * 86_400)
        ).alias("ts"),
        (
            F.pmod(F.hash(F.col("id") + 77), F.lit(1000)) / 10.0
            + (F.lit(1000.0) if shifted else F.lit(0.0))
        ).alias("value"),
    )
    return base.union(second)


def test_tv_drift_extremes(spark):
    # identical generator -> small tv; fully shifted -> tv == 1 exactly
    calm = tv_drift(_drift_events(spark, False), ["event_type"], "ts", "value")
    calm_rows = calm.collect()
    assert calm_rows and all(r["tv"] < 0.25 for r in calm_rows)

    # fully shifted: every period value clamps into the top bin. The top
    # bin is NOT empty in the baseline (equal-width bins are fitted on the
    # baseline range, so bin 9 always holds v_hi), so the exact ceiling is
    # 2*N*(M - m_9), reproduced here bin-for-bin in numpy.
    import numpy as np

    src = _drift_events(spark, True)
    pdf = src.toPandas()
    t0 = pdf["ts"].min()
    base = pdf[pdf["ts"] < t0 + __import__("pandas").Timedelta(days=7)]
    bv = base["value"].to_numpy()
    lo, hi = bv.min(), bv.max()
    mb = np.bincount(
        np.clip(np.floor((bv - lo) / ((hi - lo) / 10.0)).astype(int), 0, 9),
        minlength=10,
    )
    M = len(bv)
    for r in tv_drift(src, ["event_type"], "ts", "value").collect():
        N = r["n_period"]
        n = np.zeros(10, dtype=np.int64)
        n[9] = N
        assert r["n_baseline"] == M
        assert r["tv_numer"] == int(np.abs(n * M - mb * N).sum())
        assert r["tv"] > 0.8


def test_tv_drift_zero_on_identical_histogram(spark):
    # literally the same rows re-timestamped into the next week -> every
    # bin ratio matches exactly -> integer numerator is exactly 0
    base = spark.range(1_000).select(
        F.lit("t").alias("event_type"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400).alias("ts"),
        (F.pmod(F.hash("id"), F.lit(500)) / 5.0).alias("value"),
    )
    nxt = base.withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp("ts") + F.lit(8 * 86_400))
    )
    out = tv_drift(base.union(nxt), ["event_type"], "ts", "value").collect()
    assert out and all(r["tv_numer"] == 0 and r["tv"] == 0.0 for r in out)


def test_psi_drift_calm_vs_shifted(spark):
    from dads_spark.rollup.drift import psi_drift

    calm = psi_drift(_drift_events(spark, False), ["event_type"], "ts", "value").collect()
    assert calm and all(r["psi"] < 0.25 for r in calm)
    hot = psi_drift(_drift_events(spark, True), ["event_type"], "ts", "value").collect()
    # fully shifted distribution: PSI far beyond the 0.25 action threshold
    assert hot and all(r["psi"] > 1.0 for r in hot)


def test_psi_drift_matches_numpy_reference(spark):
    import math

    import numpy as np
    import pandas as pd

    from dads_spark.rollup.drift import psi_drift

    src = _drift_events(spark, True)
    pdf = src.toPandas()
    t0 = pdf["ts"].min()
    base = pdf[pdf["ts"] < t0 + pd.Timedelta(days=7)]
    bv = base["value"].to_numpy()
    lo, hi = bv.min(), bv.max()
    mb = np.bincount(
        np.clip(np.floor((bv - lo) / ((hi - lo) / 10.0)).astype(int), 0, 9),
        minlength=10,
    )
    M = len(bv)
    for r in psi_drift(src, ["event_type"], "ts", "value").collect():
        N = r["n_period"]
        n = np.zeros(10, dtype=np.int64)
        n[9] = N  # every shifted value clamps into the top bin
        want = 0
        for i in range(10):
            p = (n[i] + 1) / (N + 10)
            q = (mb[i] + 1) / (M + 10)
            lnr = math.log(float((n[i] + 1) * (M + 10))) - math.log(
                float((mb[i] + 1) * (N + 10))
            )
            want += math.floor((p - q) * lnr * 1e9 + 0.5)
        assert r["psi_q9"] == want


def test_psi_drift_partition_invariant(spark):
    from dads_spark.rollup.drift import psi_drift

    src = _drift_events(spark, False)
    a = sorted(tuple(r) for r in psi_drift(src.repartition(1), ["event_type"], "ts", "value").collect())
    b = sorted(tuple(r) for r in psi_drift(src.repartition(13), ["event_type"], "ts", "value").collect())
    assert a == b


def test_chi2_drift_zero_when_identical(spark):
    from pyspark.sql import functions as F

    from dads_spark.rollup import chi2_drift

    # same value distribution in baseline and period -> chi2 == 0
    rows = []
    for day in range(14):
        for i in range(100):
            rows.append(("k", f"2024-01-{day+1:02d} 00:{i % 60:02d}:00",
                         float(i % 10)))
    df = spark.createDataFrame(rows, "k string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    out = chi2_drift(df, ["k"], "ts", "value", baseline_days=7,
                     period="day", bins=10).collect()
    assert out and all(r.chi2_q6 == 0 for r in out)
    assert all(r.dof == 9 for r in out)


def test_chi2_drift_detects_shift(spark):
    from pyspark.sql import functions as F

    from dads_spark.rollup import chi2_drift

    rows = []
    for day in range(7):  # baseline: uniform 0..9
        for i in range(100):
            rows.append(("k", f"2024-01-{day+1:02d} 00:{i % 60:02d}:00",
                         float(i % 10)))
    for day in range(7, 10):  # period: all mass at 9
        for i in range(100):
            rows.append(("k", f"2024-01-{day+1:02d} 00:{i % 60:02d}:00",
                         9.0))
    df = spark.createDataFrame(rows, "k string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    out = chi2_drift(df, ["k"], "ts", "value", baseline_days=7,
                     period="day", bins=10).collect()
    # total shift: chi2 = n * (k - 1) = 100 * 9 = 900 for 10 equal bins
    assert all(r.chi2_q6 == 900_000_000 for r in out)


def test_wasserstein_vs_scalar_definition(spark):
    import numpy as np

    from dads_spark.rollup import wasserstein_drift

    # one key; baseline = first 7 days (value ~ N-ish ints), then one
    # shifted day — W1 must exceed 0 and equal the cumulative identity
    rows = []
    us = 86_400_000_000
    for d in range(7):
        for i in range(50):
            rows.append(("k", (d * us + i * 1000) // 1000, float(i % 10)))
    for i in range(50):
        rows.append(("k", (8 * us + i * 1000) // 1000, float(i % 10 + 3)))
    df = spark.createDataFrame(
        [(k, t, v) for k, t, v in rows],
        "event_type string, tms long, value double",
    ).select(
        "event_type",
        F.timestamp_micros(F.col("tms") * 1000).alias("ts"),
        "value",
    )
    out = wasserstein_drift(df, ["event_type"], "ts", "value").collect()
    assert len(out) == 1
    r = out[0]
    # scalar re-derivation: baseline = 7 days x 5 per value 0..9
    # (bin width 0.9 maps each integer value to its own bin, 9 clamps);
    # period day values 3..12 -> bins 3..8 get 5 each, bin 9 gets
    # 9/10/11/12 = 20
    m = [35] * 10
    n = [0, 0, 0, 5, 5, 5, 5, 5, 5, 20]
    N, M = sum(n), sum(m)
    cn = np.cumsum(n)
    cm = np.cumsum(m)
    want = int(np.abs(cn * M - cm * N).sum())
    assert r["w1_numer"] == want and r["n_period"] == N
    assert r["n_baseline"] == M


def test_chunk_documents_overlap_and_stubs(spark):
    import hashlib

    from dads_spark.ops import chunk_documents

    words = [f"w{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b c")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_documents(
            docs, chunk_tokens=64, overlap=16
        ).collect()
    }
    # doc 1: chunk 0 = tokens 0..63; chunk 1 = tokens 48..99 (52 toks);
    # chunk 2 would cover 96..99 -- all inside chunk 1 -> dropped
    assert set(out) == {(1, 0), (1, 1), (2, 0)}
    c0, c1 = out[(1, 0)], out[(1, 1)]
    assert (c0["first_pos"], c0["last_pos"], c0["n_tokens"]) == (0, 63, 64)
    assert (c1["first_pos"], c1["last_pos"], c1["n_tokens"]) == (48, 99, 52)
    want = hashlib.md5(" ".join(words[:64]).encode()).hexdigest()
    assert c0["chunk_md5"] == want
    # short doc: single chunk with everything
    s = out[(2, 0)]
    assert s["n_tokens"] == 3
    assert s["chunk_md5"] == hashlib.md5(b"a b c").hexdigest()


def test_chunk_documents_full_coverage(spark):
    from dads_spark.ops import chunk_documents

    n = 150
    docs = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(n)))],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    covered = set()
    for r in rows:
        covered |= set(range(r["first_pos"], r["last_pos"] + 1))
    assert covered == set(range(n)), "every token in some chunk"
