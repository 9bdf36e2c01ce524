"""Linear-interpolation gap-fill over bucketed series.

Per (key) group: re-index onto the dense bucket grid between the series'
first and last observed buckets, then ``np.interp`` the missing values
(north rule: BASELINE.json:6). Runs as ``groupBy(keys).applyInPandas`` — one
series per task, NumPy-vectorized inside, no cross-task coordination.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

TIER_SECONDS = {"hour": 3600, "day": 86400, "week": 604800}


def gap_fill_linear(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
    step_seconds: int,
) -> DataFrame:
    """Densify (key, bucket) series; output adds ``gap_filled`` boolean.

    Missing buckets get linearly interpolated values between their observed
    neighbors (np.interp semantics; a series with one observation stays as
    is — nothing to interpolate toward).
    """
    key_fields = [f for f in df.schema.fields if f.name in key_cols]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + [f"{bucket_col} timestamp"]
        + [f"{c} double" for c in value_cols]
        + ["gap_filled boolean"]
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        ts = pdf[bucket_col].astype("datetime64[ns]").astype("int64").to_numpy() // 10**9
        lo, hi = ts[0], ts[-1]
        dense = np.arange(lo, hi + 1, step_seconds)
        present = np.isin(dense, ts)
        out = {c: np.repeat(pdf[c].iloc[0], len(dense)) for c in key_cols}
        out[bucket_col] = pd.to_datetime(dense, unit="s")
        for c in value_cols:
            observed = pdf[c].to_numpy(dtype=np.float64)
            out[c] = np.interp(dense, ts, observed)
        out["gap_filled"] = ~present
        return pd.DataFrame(out)

    return df.groupBy(*key_cols).applyInPandas(fill, out_schema)


def gap_fill_locf(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
    step_seconds: int,
) -> DataFrame:
    """LOCF (last-observation-carried-forward) gap-fill — the other
    standard continuous-aggregate fill besides linear interpolation:
    missing buckets repeat the most recent observed value. Same dense
    reindex + ``applyInPandas`` shape as :func:`gap_fill_linear`; fully
    ANSI-SQL-expressible (last_value IGNORE NULLS), so it carries an exact
    oracle."""
    key_fields = [f for f in df.schema.fields if f.name in key_cols]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + [f"{bucket_col} timestamp"]
        + [f"{c} double" for c in value_cols]
        + ["gap_filled boolean"]
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        ts = pdf[bucket_col].astype("datetime64[ns]").astype("int64").to_numpy() // 10**9
        lo, hi = ts[0], ts[-1]
        dense = np.arange(lo, hi + 1, step_seconds)
        # index of the latest observation at-or-before each dense bucket
        prev = np.searchsorted(ts, dense, side="right") - 1
        present = np.isin(dense, ts)
        out = {c: np.repeat(pdf[c].iloc[0], len(dense)) for c in key_cols}
        out[bucket_col] = pd.to_datetime(dense, unit="s")
        for c in value_cols:
            out[c] = pdf[c].to_numpy(dtype=np.float64)[prev]
        out["gap_filled"] = ~present
        return pd.DataFrame(out)

    return df.groupBy(*key_cols).applyInPandas(fill, out_schema)
