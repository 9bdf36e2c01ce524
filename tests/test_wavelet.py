"""Haar synopsis: Parseval identity, reconstruction, Spark parity."""

from __future__ import annotations

import numpy as np

from dads_spark.oracles import haar_topk_oracle
from dads_spark.rollup import haar_coefficients, haar_topk_grouped


def test_parseval_identity_exact():
    # sum of integer energy keys == 2^J * sum(v^2) — the orthonormal
    # Parseval identity scaled by 2^J, exactly, in longs
    v = np.array([((i * 31) % 17) + 1 for i in range(32)], dtype=np.int64)
    coeffs = haar_coefficients(v)
    assert sum(e for *_, e in coeffs) == 32 * int((v * v).sum())


def test_reconstruction_from_all_coefficients():
    # invert the unnormalized transform: walking levels top-down
    # recovers the series bit-exactly
    v = [5, 9, 2, 2, 7, 1, 8, 8]
    coeffs = {(lv, pos): c for lv, pos, c, _ in haar_coefficients(v)}
    j_max = 3
    s = [coeffs[(0, 0)]]
    for j in range(j_max, 0, -1):
        nxt = []
        for pos, tot in enumerate(s):
            d = coeffs[(j, pos)]
            nxt.extend([(tot + d) // 2, (tot - d) // 2])
        s = nxt
    assert s == v


def test_truncates_to_dyadic_prefix():
    v = list(range(10))  # m = 8
    coeffs = haar_coefficients(np.array(v))
    # levels 1..3 plus the approximation: 4 + 2 + 1 + 1 rows
    assert len(coeffs) == 8


def test_topk_rank_deterministic_on_ties():
    # constant series: every detail is 0 (tied) — ties go (level asc,
    # pos asc) after the approximation
    top = haar_topk_oracle([4] * 8, k=4)
    assert top[0][:2] == (0, 0)  # approximation first (energy > 0)
    assert [r[:2] for r in top[1:]] == [(1, 0), (1, 1), (1, 2)]


def test_spark_matches_oracle(spark):
    v = [((i * 13) % 7) + (40 if i in (9, 10) else 0) for i in range(50)]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(v)],
        "key string, t long, v long",
    )
    got = [
        (r["rank"], r["level"], r["pos"], r["coef"], r["energy"])
        for r in sorted(
            haar_topk_grouped(df, ["key"], "t", "v", k=10).collect(),
            key=lambda r: r["rank"],
        )
    ]
    want = [
        (i + 1, lv, pos, c, e)
        for i, (lv, pos, c, e) in enumerate(haar_topk_oracle(v, 10))
    ]
    assert got == want
