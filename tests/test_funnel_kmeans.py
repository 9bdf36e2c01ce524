"""Funnel conversion ordering semantics and k-means assignment properties."""

from __future__ import annotations

import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from dads_spark.ops import kmeans_assign


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes the funnel in order
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 11:00:00"),
        (1, "purchase", "2024-01-01 12:00:00"),
        # u2 clicks BEFORE viewing -> stops at step 1
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        # u3 views and clicks but purchase precedes the click -> step 2
        (3, "view", "2024-01-01 08:00:00"),
        (3, "purchase", "2024-01-01 08:30:00"),
        (3, "click", "2024-01-01 09:00:00"),
        # u4 never views -> not even step 1
        (4, "purchase", "2024-01-01 08:00:00"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("_funnel_events")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = (
            entry_mod.q_funnel_steps(spark, d)
            .orderBy("step")
            .toPandas()
        )
    assert out["users"].tolist() == [3, 2, 1]


def test_kmeans_assign_properties(spark):
    rng = np.random.default_rng(5)
    # 3 well-separated direction clusters in 8d
    centers = np.eye(8)[:3] * 10
    vecs = np.concatenate(
        [c + rng.normal(0, 0.3, size=(40, 8)) for c in centers]
    )
    pdf = pd.DataFrame(
        {"vec_id": np.arange(120, dtype=np.int64), "embedding": list(vecs)}
    )
    df = spark.createDataFrame(pdf)
    out = kmeans_assign(df, n_clusters=3, sample_size=120).toPandas()
    assert len(out) == 120
    assert out["cluster"].nunique() == 3
    # members of one true cluster land in one learned cluster
    for lo in (0, 40, 80):
        grp = out[(out["vec_id"] >= lo) & (out["vec_id"] < lo + 40)]
        assert grp["cluster"].nunique() == 1
    # determinism: second run identical
    again = kmeans_assign(df, n_clusters=3, sample_size=120).toPandas()
    assert out.sort_values("vec_id").reset_index(drop=True).equals(
        again.sort_values("vec_id").reset_index(drop=True)
    )
