"""Distributed embedding PCA (ops/embpca.py) — the S2G TSQR protocol
re-exposed over the embeddings table."""

from __future__ import annotations

import numpy as np
import pandas as pd

from dads_spark.ops import embedding_pca, pca_components
from dads_spark.oracles import embedding_pca_oracle


def _synth(n=200, d=12, seed=3):
    rng = np.random.RandomState(seed)
    # planted anisotropy: two dominant directions with clear eigengaps
    u = rng.randn(d, d)
    q, _ = np.linalg.qr(u)
    scales = np.array([10.0, 5.0] + [0.5] * (d - 2))
    x = rng.randn(n, d) * scales @ q.T
    return np.arange(n, dtype=np.int64), x


def _df(spark, ids, vecs):
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": [v.astype(np.float32) for v in vecs]}
    )
    return spark.createDataFrame(pdf, "vec_id long, embedding array<float>")


def test_embedding_pca_parity_with_oracle(spark):
    ids, vecs = _synth()
    got = sorted(
        tuple(r) for r in embedding_pca(_df(spark, ids, vecs), k=3).collect()
    )
    # the Spark path reads float32 arrays; mirror that exact dtype chain
    want = sorted(
        embedding_pca_oracle(ids, vecs.astype(np.float32).astype(np.float64), k=3)
    )
    assert got == want


def test_embedding_pca_matches_direct_svd_subspace(spark):
    ids, vecs = _synth()
    x32 = vecs.astype(np.float32).astype(np.float64)
    mean, v = pca_components(_df(spark, ids, vecs), k=2)
    xc = x32 - x32.mean(axis=0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    direct = vt.T[:, :2]
    # distributed TSQR components span the same top-2 subspace as a direct
    # SVD of the centered data (|cos| of matched axes ~ 1)
    for col in range(2):
        c = abs(float(v[:, col] @ direct[:, col]))
        assert c > 0.999, c


def test_embedding_pca_variance_ordering(spark):
    ids, vecs = _synth()
    out = embedding_pca(_df(spark, ids, vecs), k=3).toPandas()
    var = [out[f"pc{i}_q6"].astype(float).var() for i in (1, 2, 3)]
    assert var[0] > var[1] > var[2]


def test_embedding_pca_partition_invariant(spark):
    ids, vecs = _synth(n=120)
    df = _df(spark, ids, vecs)
    a = sorted(tuple(r) for r in embedding_pca(df.repartition(1), k=2).collect())
    b = sorted(tuple(r) for r in embedding_pca(df.repartition(7), k=2).collect())
    assert a == b
