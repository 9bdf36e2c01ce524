"""Mergeable quantile digest: the two-phase sketch shape for 100 TB aggs.

A t-digest-style centroid sketch built with the partial -> merge contract
every warehouse-scale approximate aggregate needs: each partition reduces
its values to ``compression`` weighted centroids (one mapInPandas pass, no
sort shuffle of raw values), the per-key merge re-clusters the concatenated
centroids (at most partitions x compression rows per key cross the wire —
independent of row count), and quantiles interpolate the merged cumulative
weights. Associative and order-insensitive by construction, so the result
is reproducible under any partitioning.

Complements ``approx_aggregates`` (Spark's built-in approx_percentile):
this one exposes the sketch itself as DATA — ``digest`` emits one
(centroids, weights) row per key that a tier table can persist, and
``merge_digests`` re-keys those rows so day/week quantiles merge from the
stored hour sketches WITHOUT re-reading raw data: the continuous-aggregate
cascade applied to percentiles (exact-decomposable aggs cascade for free;
quantiles need a mergeable sketch, and this is it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _cluster(values: np.ndarray, weights: np.ndarray, c: int) -> tuple[np.ndarray, np.ndarray]:
    """Reduce sorted (values, weights) to <= c equal-weight clusters
    (weighted means). Input MUST be sorted by value."""
    total = weights.sum()
    if len(values) <= c:
        return values, weights
    bounds = np.linspace(0, total, c + 1)
    cum = np.cumsum(weights)
    idx = np.searchsorted(cum - 1e-12, bounds[1:-1], side="left")
    starts = np.concatenate(([0], idx))
    ends = np.concatenate((idx, [len(values)]))
    means, wts = [], []
    for s, e in zip(starts, ends):
        if e <= s:
            continue
        w = weights[s:e]
        means.append(np.average(values[s:e], weights=w))
        wts.append(w.sum())
    return np.asarray(means), np.asarray(wts)


def _sketch_schema(key_cols: list[str]) -> str:
    return ", ".join(
        [f"{k} string" for k in key_cols]
        + ["centroids array<double>", "weights array<double>"]
    )


def _merge_rows_to_sketch(pdf: pd.DataFrame, compression: int) -> tuple[np.ndarray, np.ndarray]:
    v = np.concatenate([np.asarray(c, dtype=np.float64) for c in pdf["centroids"]])
    w = np.concatenate([np.asarray(c, dtype=np.float64) for c in pdf["weights"]])
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    if len(v) > 4 * compression:
        # bound merge-state for very wide inputs; one extra level costs one
        # more 1/compression of rank error
        v, w = _cluster(v, w, 4 * compression)
    return v, w


def digest(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    compression: int = 256,
) -> DataFrame:
    """Build one persisted-form sketch row per key:
    (keys..., centroids array<double>, weights array<double>)."""

    def partial(it):
        rows = {k: [] for k in key_cols} | {"centroids": [], "weights": []}
        for pdf in it:
            for keys, grp in pdf.groupby(key_cols, sort=False):
                if not isinstance(keys, tuple):
                    keys = (keys,)
                v = np.sort(grp[value_col].to_numpy(dtype=np.float64))
                means, wts = _cluster(v, np.ones(len(v)), compression)
                for k, kv in zip(key_cols, keys):
                    rows[k].append(kv)
                rows["centroids"].append(means.tolist())
                rows["weights"].append(wts.tolist())
        yield pd.DataFrame(rows)

    partials = df.select(*key_cols, value_col).mapInPandas(
        partial, _sketch_schema(key_cols)
    )

    def merge(keys, pdf):
        v, w = _merge_rows_to_sketch(pdf, compression)
        return pd.DataFrame(
            {
                **{k: [kv] for k, kv in zip(key_cols, keys)},
                "centroids": [v.tolist()],
                "weights": [w.tolist()],
            }
        )

    return partials.groupBy(*key_cols).applyInPandas(merge, _sketch_schema(key_cols))


def merge_digests(
    sketches: DataFrame,
    key_cols: list[str],
    compression: int = 256,
) -> DataFrame:
    """Re-key stored sketch rows to a coarser grouping (e.g. drop the hour
    column to cascade hour sketches into day sketches). Input rows need
    (centroids, weights) plus at least ``key_cols``."""

    def merge(keys, pdf):
        v, w = _merge_rows_to_sketch(pdf, compression)
        return pd.DataFrame(
            {
                **{k: [kv] for k, kv in zip(key_cols, keys)},
                "centroids": [v.tolist()],
                "weights": [w.tolist()],
            }
        )

    return sketches.groupBy(*key_cols).applyInPandas(merge, _sketch_schema(key_cols))


def digest_quantiles(
    sketches: DataFrame,
    key_cols: list[str],
    probs: list[float],
) -> DataFrame:
    """Interpolate quantiles from sketch rows: (keys..., prob, value)."""
    probs = sorted(float(p) for p in probs)
    out_schema = ", ".join(
        [f"{k} string" for k in key_cols] + ["prob double", "value double"]
    )

    def quant(keys, pdf):
        v, w = _merge_rows_to_sketch(pdf, 1 << 30)
        cum = np.cumsum(w) - w / 2.0  # centroid midpoints
        total = w.sum()
        qs = np.interp([p * total for p in probs], cum, v)
        return pd.DataFrame(
            {
                **{k: kv for k, kv in zip(key_cols, keys)},
                "prob": np.asarray(probs, dtype=np.float64),
                "value": qs,
            }
        )

    return sketches.groupBy(*key_cols).applyInPandas(quant, out_schema)


def quantile_digest(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    probs: list[float],
    compression: int = 256,
) -> DataFrame:
    """Approximate per-key quantiles via mergeable centroid sketches
    (digest -> digest_quantiles in one call).

    Rank error is bounded by ~1/compression per merge level; the property
    test asserts the realized rank of each reported quantile.
    Output: (keys..., prob, value).
    """
    return digest_quantiles(
        digest(df, key_cols, value_col, compression), key_cols, probs
    )


def ams_f2(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    groups: int = 5,
    per_group: int = 16,
) -> DataFrame:
    """AMS second-moment (F2) sketch per key (Alon-Matias-Szegedy,
    STOC 1996): estimate ``sum_v f_v^2`` — the SELF-JOIN SIZE of the
    value column, the quantity a cost-based planner wants before
    committing to an equi-join strategy (composes with ops/profile.py's
    per-key histogram cardinality estimates).

    The sketch is LINEAR: estimator j keeps S_j = sum over rows of
    eps_j(value) with eps in {-1, +1}, so partial sketches ADD —
    merge-order independent by construction, which is what makes it
    exactly pinnable where t-digest is rows-only. eps_j derives from an
    md5 hex digit of (j, value) — engine-portable, the dsir bucket
    discipline. The estimate is the canonical MEDIAN-OF-MEANS: the
    ``groups * per_group`` estimators split into ``groups`` (odd)
    groups, each group's mean of S_j^2 is an exact floor division, and
    the estimate is the single middle order statistic of the group
    means — all integers, no float anywhere. The EXACT F2 is computed
    alongside so the row carries estimate and truth together.

    Scale shape: the eps expansion is a k-row broadcast cross join
    evaluated map-side; both aggregations (per-(key, j) sums, exact
    per-(key, value) counts) plan partial+final. Shuffle carries
    k rows per key + one row per distinct value.
    """
    if groups % 2 == 0:
        raise ValueError("groups must be odd (single-element median)")
    k = groups * per_group
    spark = df.sparkSession
    js = spark.range(k).select(F.col("id").cast("long").alias("_j"))
    v = F.col(value_col).cast("string")
    eps = (
        1
        - 2
        * (
            (
                F.expr(
                    "locate(substring(md5(concat(CAST(_j AS STRING), ':', "
                    f"CAST({value_col} AS STRING))), 1, 1), "
                    "'0123456789abcdef') - 1"
                )
            )
            % 2
        )
    ).cast("long")
    from pyspark.sql import Window as _W

    gmeans = (
        df.select(*key_cols, v.alias(value_col))
        .crossJoin(F.broadcast(js))
        .select(*key_cols, "_j", eps.alias("_e"))
        .groupBy(*key_cols, "_j")
        .agg(F.sum("_e").alias("_s"))
        .groupBy(*key_cols, F.expr(f"_j DIV {per_group}").alias("_g"))
        .agg(
            F.expr(
                f"sum(_s * _s) DIV {per_group}"
            ).alias("_gm")
        )
    )
    mid = groups // 2 + 1
    sk = (
        gmeans.withColumn(
            "_rn",
            F.row_number().over(
                _W.partitionBy(*key_cols).orderBy("_gm", "_g")
            ),
        )
        .filter(F.col("_rn") == mid)
        .select(*key_cols, F.col("_gm").alias("f2_est"))
    )
    exact = (
        df.groupBy(*key_cols, v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_f"))
        .groupBy(*key_cols)
        .agg(
            F.sum(F.col("_f") * F.col("_f")).alias("f2_exact"),
            F.sum("_f").alias("n_rows"),
        )
    )
    return sk.join(exact, key_cols).select(
        *key_cols, "n_rows", "f2_est", "f2_exact"
    )
