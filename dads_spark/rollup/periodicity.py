"""Dominant-period detection per series via exact-integer autocorrelation.

Capacity planning and seasonal gap-fill both need the dominant cycle
length of each rolled-up series (hourly web traffic is usually 24h or
168h — but per-domain series disagree, so it must be measured, not
assumed). The classic estimator is the argmax of the autocorrelation
function over a candidate-lag band.

Exactness: with integer inputs (doc counts) the ACF ratio can be kept
RATIONAL. For a length-n series x with sum s, scale the mean-centered
terms by n:  y_t = n*x_t - s  (exact int64). Then

    acf(k) = N(k)/D,  N(k) = sum_t y_t*y_{t+k},  D = sum_t y_t^2,

and since D > 0 is constant per series, argmax_k acf(k) == argmax_k N(k)
— a pure int64 comparison, bit-equal on any engine. The emitted acf
value stays as the exact (numerator, denominator) pair; no float ever
enters the operator, so the DuckDB oracle twin matches by construction.

Distribution shape: the hourly counts are one groupBy over the fact
table (the rollup shuffle); the dense per-series vector and the O(n*B)
lag products run inside one Arrow batch per series via applyInPandas —
series are the parallelism unit, exactly like the matrix-profile and
S2G kernels in this engine (a rolled-up series is ~10^3-10^5 points:
driver-free, executor-local NumPy). Band size B is a constant (<=168).

Oracle twin: ``acf_period`` in __spark_entry__.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def acf_dominant_period(
    counts: DataFrame,
    key_cols: list[str],
    idx_col: str = "h_idx",
    value_col: str = "cnt",
    lag_lo: int = 2,
    lag_hi: int = 48,
) -> DataFrame:
    """Per-series dominant period over a dense integer index grid.

    ``counts``: (keys, idx_col, value_col) with idx_col a 0-based bucket
    index; missing buckets count as 0 (the dense grid spans the GLOBAL
    [0, max_idx] range so every series is scored on the same support).
    Returns (keys, n_buckets, period, acf_num, acf_den) — all exact
    integers; period is the band lag maximizing N(k), smallest lag wins
    ties.
    """
    if not (1 <= lag_lo <= lag_hi):
        raise ValueError("need 1 <= lag_lo <= lag_hi")
    span = counts.agg(F.max(idx_col).alias("_max_idx"))
    with_span = counts.crossJoin(F.broadcast(span))

    out_schema = (
        ", ".join(f"{c} string" for c in key_cols)
        + ", n_buckets long, period long, acf_num long, acf_den long"
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["_max_idx"].iloc[0]) + 1
        x = np.zeros(n, dtype=np.int64)
        x[pdf[idx_col].to_numpy(dtype=np.int64)] = pdf[value_col].to_numpy(
            dtype=np.int64
        )
        s = np.int64(x.sum())
        y = np.int64(n) * x - s
        d = np.int64(np.dot(y, y))
        hi = min(lag_hi, n - 1)
        if d <= 0 or hi < lag_lo:  # constant series or too short: no period
            return pd.DataFrame(
                columns=[*key_cols, "n_buckets", "period", "acf_num", "acf_den"]
            )
        nums = np.array(
            [np.dot(y[:-k], y[k:]) for k in range(lag_lo, hi + 1)],
            dtype=np.int64,
        )
        best = int(np.argmax(nums))  # first occurrence = smallest lag
        return pd.DataFrame(
            {
                **{c: [pdf[c].iloc[0]] for c in key_cols},
                "n_buckets": [n],
                "period": [lag_lo + best],
                "acf_num": [int(nums[best])],
                "acf_den": [int(d)],
            }
        )

    return with_span.groupBy(*key_cols).applyInPandas(score, out_schema)
