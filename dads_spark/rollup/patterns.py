"""Subsequence pattern search: z-normalized similarity of a query shape
against every window of every series.

The query-side counterpart of discord detection: where the matrix profile
finds each window's nearest NEIGHBOR, pattern search finds each series'
windows nearest to a user-supplied SHAPE (MASS distance profile — Mueen's
FFT-based algorithm, the same public kernel the DRAG operator calibrates
with). The classic "find me days that look like this outage" query over
rolled-up per-domain series.

Distribution shape: one kernel per series via ``groupBy().applyInPandas``
(the grouped zero-coordination shape shared with the S2G scorer); each
task emits only its top-k rows, so the shuffle is k rows per series no
matter how long the series is.

Ranking is tie-free by construction: windows are ordered by the micro-unit
quantized distance (floor(d*1e6+0.5)) with the window index as tiebreak,
so independent distance implementations (FFT MASS vs direct z-norm, which
agree to ~1e-12 at these magnitudes) produce identical top-k lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..s2g.discord import mass_distance_profile


def pattern_topk_kernel(
    x: np.ndarray, pattern: np.ndarray, k: int
) -> list[tuple[int, int]]:
    """Top-k (window_idx, dist_q6) for one series, best match first."""
    m = len(pattern)
    if len(x) < m:
        return []
    d = mass_distance_profile(np.asarray(pattern, dtype=np.float64), x)
    q = np.floor(d * 1e6 + 0.5).astype(np.int64)
    order = sorted(range(len(q)), key=lambda i: (q[i], i))[:k]
    return [(i, int(q[i])) for i in order]


def pattern_topk(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    pattern: list[float],
    k: int = 5,
) -> DataFrame:
    """Per-series top-k best-matching windows:
    (keys..., rank, window_idx, dist_q6)."""
    pat = np.asarray(pattern, dtype=np.float64)
    key_fields = [f for f in df.schema.fields if f.name in key_cols]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["rank long", "window_idx long", "dist_q6 long"]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.sort_values(order_col)[value_col].to_numpy(dtype=np.float64)
        top = pattern_topk_kernel(x, pat, k)
        return pd.DataFrame(
            {
                **{c: np.repeat(pdf[c].iloc[0], len(top)) for c in key_cols},
                "rank": np.arange(1, len(top) + 1, dtype=np.int64),
                "window_idx": np.array([t[0] for t in top], dtype=np.int64),
                "dist_q6": np.array([t[1] for t in top], dtype=np.int64),
            }
        )

    return df.groupBy(*key_cols).applyInPandas(run, out_schema)
