"""Spark-free independent oracle kernels for the staged-dump twins.

The driver's correctness gate can only hash what DuckDB can SELECT, and the
sequential-recurrence operators (LTTB, EWMA, Holt, CUSUM, matrix profile,
winnowing) are not ANSI SQL. The repo's proven answer (gorilla_roundtrip r1,
s2g_score_profile r3) is a *staged oracle*: the query entry recomputes the
expected output with a Spark-free local kernel, writes it to parquet, and the
oracle SQL is ``SELECT ... FROM read_parquet(<dump>)`` — so the driver's
value hash pins the distributed pipeline's NUMBERS against an independent
single-threaded recomputation of the same algorithm.

Independence discipline: every kernel here is written as the textbook scalar
formulation (explicit loops, Horner rolling hashes, brute-force O(n^2)
distance scans) — NOT an import of the vectorized production kernels in
``dads_spark.rollup`` / ``dads_spark.ops``. Where a reduction's float result
depends on summation order (np.mean / np.std pairwise sums), the oracle uses
the same NumPy reduction on the same slice so both sides see bit-identical
doubles; everything structural (recurrences, window walks, selection rules)
is re-derived from the published algorithm.

All series fed to these twins are hourly COUNT series: counts are integers,
exact in IEEE double under any summation order, so the distributed
assembly (Spark partial aggregation) and the local assembly (pandas groupby)
produce bit-identical inputs regardless of partitioning — which makes a
local sf0.01 gate pass a *guarantee* of a driver gate pass, not a likelihood.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# shared series assembly (pyarrow/pandas only — no Spark)
# ---------------------------------------------------------------------------

def hourly_counts(sf_dir: str) -> "dict[str, np.ndarray]":
    """Per-event_type hourly count series from events.parquet, as
    {event_type: (bucket_sec int64[], count float64[])} sorted by bucket.
    Mirrors ``groupBy(event_type, date_trunc(hour, ts)).count()`` exactly:
    counting is order-independent, so this is bit-identical to any
    distributed evaluation."""
    import pyarrow.parquet as pq

    raw = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    sec = raw["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 10**9
    counts = (
        pd.DataFrame({"event_type": raw["event_type"], "b": (sec // 3600) * 3600})
        .groupby(["event_type", "b"])
        .size()
    )
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for et in sorted(counts.index.get_level_values(0).unique()):
        s = counts.loc[et]
        out[et] = (
            s.index.to_numpy(dtype=np.int64),
            s.to_numpy(dtype=np.float64),
        )
    return out


def hourly_counts_gapfilled(sf_dir: str) -> "dict[str, np.ndarray]":
    """Per-type hourly count series on the dense hourly grid with linear
    interpolation over gaps — {event_type: float64[]}. np.interp over the
    integer-second grid reproduces the Spark gap_fill_linear bit-for-bit
    (established by the s2g_score_profile staged twin)."""
    out: dict[str, np.ndarray] = {}
    for et, (b, v) in hourly_counts(sf_dir).items():
        dense = np.arange(b[0], b[-1] + 1, 3600)
        out[et] = np.interp(dense, b, v)
    return out


def fmt_bucket_sec(b: np.ndarray) -> list[str]:
    """Epoch seconds -> 'YYYY-MM-DD HH:MM:SS' (UTC), the _TS_FMT the Spark
    side emits via date_format under spark.sql.session.timeZone=UTC."""
    return (
        pd.to_datetime(b, unit="s", utc=True).strftime("%Y-%m-%d %H:%M:%S").tolist()
    )


def q6(x: np.ndarray) -> np.ndarray:
    """The repo's standard integer micro-unit quantization: both sides of a
    staged twin apply this identical NumPy expression to (ideally
    bit-identical) doubles, so no cross-engine rounding rule is involved."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# LTTB (Steinarsson 2013) — textbook scalar walk
# ---------------------------------------------------------------------------

def lttb_oracle_indices(t: np.ndarray, v: np.ndarray, n_out: int) -> list[int]:
    """Scalar-loop LTTB: keep first/last, one point per interior bucket
    maximizing the triangle with the previous kept point and the next
    bucket's centroid. Bucket edges and centroid means use the same float
    expressions as any faithful implementation of the thesis; ties keep the
    first (leftmost) maximum."""
    n = len(v)
    if n_out >= n or n <= 2:
        return list(range(n))
    if n_out < 3:
        return [0, n - 1]
    t = np.asarray(t, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    # interior bucket edges over [1, n-1): int(1 + (n-2)*k/(n_out-2))
    edges = [int(1 + (n - 2) * k / (n_out - 2)) for k in range(n_out - 1)]
    edges[-1] = n - 1
    keep = [0]
    a = 0
    for k in range(n_out - 2):
        lo, hi = edges[k], edges[k + 1]
        if k + 2 <= n_out - 2:
            nlo, nhi = edges[k + 1], edges[k + 2]
        else:
            nlo, nhi = n - 1, n
        # centroid of the NEXT bucket (np.mean: summation-order parity with
        # any vectorized evaluation of the same slice)
        avg_t = float(np.mean(t[nlo:nhi]))
        avg_v = float(np.mean(v[nlo:nhi]))
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs(
                (t[a] - avg_t) * (v[i] - v[a]) - (t[a] - t[i]) * (avg_v - v[a])
            )
            if area > best_area:
                best, best_area = i, area
        a = best
        keep.append(a)
    keep.append(n - 1)
    return keep


# ---------------------------------------------------------------------------
# EWMA (pandas adjust=True semantics)
# ---------------------------------------------------------------------------

def ewma_oracle(v: np.ndarray, alpha: float) -> np.ndarray:
    """pandas ``ewm(alpha, adjust=True).mean()`` on the assembled series.
    Kernel-level independence for EWMA is pinned elsewhere (the explicit
    weighted-sum property test); what this oracle pins is the DISTRIBUTED
    path — series assembly, grouping, ordering, quantization — against a
    local single-pass evaluation of the same published recurrence."""
    return (
        pd.Series(np.asarray(v, dtype=np.float64))
        .ewm(alpha=alpha, adjust=True)
        .mean()
        .to_numpy()
    )


# ---------------------------------------------------------------------------
# Holt linear smoothing — scalar recurrence from the standard formulation
# ---------------------------------------------------------------------------

def holt_oracle(x: np.ndarray, alpha: float, beta: float):
    """(forecast, residual) via the standard double-exponential recurrence,
    written as plain Python-float scalar steps (IEEE double, identical
    expression tree to any faithful implementation):
    level_0 = x_0, trend_0 = x_1 - x_0; f_t = level + trend;
    level' = a x_t + (1-a) f_t; trend' = b (level'-level) + (1-b) trend."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    f = [float("nan")] * n
    if n < 2:
        return np.array(f), np.full(n, np.nan)
    level = float(x[0])
    trend = float(x[1]) - float(x[0])
    for t in range(1, n):
        ft = level + trend
        f[t] = ft
        new_level = alpha * float(x[t]) + (1 - alpha) * ft
        trend = beta * (new_level - level) + (1 - beta) * trend
        level = new_level
    fa = np.array(f, dtype=np.float64)
    return fa, x - fa


def holt_outliers_oracle(
    x: np.ndarray, alpha: float, beta: float, n_sigma: float
):
    """Outlier selection mirroring the production contract: residual sigma
    over finite residuals (np.std for reduction-order parity), flag
    |resid| > n_sigma * sigma. Returns (idx, value, forecast, residual)."""
    fc, resid = holt_oracle(x, alpha, beta)
    ok = np.isfinite(resid)
    sd = float(resid[ok].std()) if ok.any() else 0.0
    if sd > 0:
        sel = ok & (np.abs(resid) > n_sigma * sd)
    else:
        sel = np.zeros(len(x), dtype=bool)
    idx = np.nonzero(sel)[0].astype(np.int64)
    return idx, np.asarray(x, dtype=np.float64)[sel], fc[sel], resid[sel]


# ---------------------------------------------------------------------------
# CUSUM — scalar two-sided standardized accumulation
# ---------------------------------------------------------------------------

def cusum_oracle(x: np.ndarray, k: float, h: float) -> list[tuple[int, str]]:
    """Two-sided CUSUM with in-control stats from the first
    max(30, n//4) points (np.mean/np.std for reduction parity), scalar
    accumulation with reset-on-alarm. Returns [(idx, 'up'|'down')]."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 3:
        return []
    b = min(n, max(30, n // 4))
    mu = float(np.mean(x[:b]))
    sd = float(np.std(x[:b]))
    if sd == 0:
        return []
    alarms: list[tuple[int, str]] = []
    sp = sn = 0.0
    for t in range(n):
        z = (float(x[t]) - mu) / sd
        sp = max(0.0, sp + z - k)
        sn = max(0.0, sn - z - k)
        if sp > h:
            alarms.append((t, "up"))
            sp = sn = 0.0
        elif sn > h:
            alarms.append((t, "down"))
            sp = sn = 0.0
    return alarms


# ---------------------------------------------------------------------------
# Matrix profile — brute-force O(n^2) z-normalized NN scan
# ---------------------------------------------------------------------------

def brute_matrix_profile(x: np.ndarray, m: int, exclusion: int | None = None):
    """Brute-force self-join matrix profile: explicitly z-normalize every
    window and take pairwise Euclidean distances — the direct definition,
    sharing no arithmetic with the STOMP dot-product recurrence. Flat
    windows follow the stumpy convention (flat-flat 0, flat-moving
    sqrt(2m)). Returns the length n-m+1 profile."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    w = n - m + 1
    if w < 2:
        return np.empty(0)
    excl = int(np.ceil(m / 2)) if exclusion is None else int(exclusion)
    wins = np.lib.stride_tricks.sliding_window_view(x, m).astype(np.float64)
    mu = wins.mean(axis=1)
    sd = wins.std(axis=1)
    flat = sd == 0.0
    z = np.where(
        flat[:, None], 0.0, (wins - mu[:, None]) / np.where(flat, 1.0, sd)[:, None]
    )
    mp = np.full(w, np.inf)
    for i in range(w):
        best = np.inf
        for j in range(w):
            if abs(i - j) <= excl:
                continue
            if flat[i] and flat[j]:
                d = 0.0
            elif flat[i] or flat[j]:
                d = float(np.sqrt(2.0 * m))
            else:
                d = float(np.sqrt(np.sum((z[i] - z[j]) ** 2)))
            if d < best:
                best = d
        mp[i] = best
    return mp


def top_discords_oracle(mp: np.ndarray, m: int, k: int, exclusion=None) -> list[int]:
    """Greedy non-overlapping top-k discords (largest profile first, stable
    on index for equal values, later picks clear earlier exclusion zones)."""
    excl = int(np.ceil(m / 2)) if exclusion is None else int(exclusion)
    finite = [(float(mp[i]), i) for i in range(len(mp)) if np.isfinite(mp[i])]
    finite.sort(key=lambda p: (-p[0], p[1]))
    picked: list[int] = []
    for _, i in finite:
        if all(abs(i - p) > excl for p in picked):
            picked.append(i)
        if len(picked) == k:
            break
    return picked


# ---------------------------------------------------------------------------
# DRAG discords — brute-force z-normalized NN distances (no MASS/FFT)
# ---------------------------------------------------------------------------

def drag_oracle(
    x: np.ndarray,
    m: int,
    r_quantile: float = 0.995,
    decision_quantum: float | None = 1e-6,
) -> list[tuple[int, int, float]]:
    """DRAG discord ranges via the direct definition: z-normalize every
    window explicitly and take exact pairwise Euclidean NN distances —
    sharing no arithmetic with the production MASS/FFT profiles. The final
    discord set is path-independent ({i : nn_i >= r}), so phase-1 pruning
    needs no mirroring; r is self-calibrated from every step-th window's NN
    distance exactly as the production operator does. Returns merged
    [(range_start, range_end, peak_nn_dist)]."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < 4 * m:
        return []
    n_win = len(x) - m + 1
    excl = max(1, m // 2)
    wins = np.lib.stride_tricks.sliding_window_view(x, m).astype(np.float64)
    mu = wins.mean(axis=1)
    sd = wins.std(axis=1)
    flat = sd == 0.0
    z = (wins - mu[:, None]) / np.where(flat, 1.0, sd)[:, None]
    z[flat] = 0.0
    root2m = float(np.sqrt(2.0 * m))
    nn = np.empty(n_win)
    for i in range(n_win):
        if flat[i]:
            d = np.full(n_win, root2m)
        else:
            d = np.sqrt(np.sum((z - z[i]) ** 2, axis=1))
            d[flat] = root2m  # no shape information, the MP convention
        d[max(0, i - excl) : min(n_win, i + excl + 1)] = np.inf
        nn[i] = d.min()
    step = max(1, n_win // 200)
    sample = nn[np.arange(0, n_win, step)]
    finite = sample[np.isfinite(sample)]
    if len(finite) == 0:
        return []
    r = float(np.quantile(finite, r_quantile))
    if decision_quantum is not None:
        # the same half-grid snap as the production operator's
        # decision_quantum: tie-free across distance implementations
        r = (np.floor(r / decision_quantum + 0.5) - 0.5) * decision_quantum
    hits = [(int(i), float(nn[i])) for i in range(n_win) if np.isfinite(nn[i]) and nn[i] >= r]
    if not hits:
        return []
    # merge overlapping/adjacent [i, i+m) windows into ranges, peak per range
    spans = sorted((i, i + m) for i, _ in hits)
    by_idx = dict(hits)
    merged = [list(spans[0])]
    for s, e in spans[1:]:
        if s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [
        (s, e, max(v for i, v in by_idx.items() if s <= i < e)) for s, e in merged
    ]


# ---------------------------------------------------------------------------
# Winnowing — Horner rolling hash + rightmost-minimum windows, all-scalar
# ---------------------------------------------------------------------------

def winnow_oracle(text: str, k: int = 8, w: int = 4, base: int = 1_000_003):
    """Fingerprints of one document per Schleimer/Wilkerson/Aiken: Rabin-
    Karp k-gram hashes mod 2^64 computed by the Horner/rolling update
    (h' = (h - b_out * base^(k-1)) * base + b_in — a different construction
    from the production kernel's vectorized powers-dot-product, identical
    values by ring arithmetic), then the RIGHTMOST minimum of every
    w-window, deduped; returned as signed int64s, sorted."""
    if not text:
        return []
    b = text.encode()
    n = len(b) - k + 1
    if n < 1:
        return []
    top_pow = pow(base, k - 1, 1 << 64)
    h = 0
    for j in range(k):
        h = (h * base + b[j]) & _MASK64
    hashes = [h]
    for i in range(1, n):
        h = ((h - b[i - 1] * top_pow) * base + b[i + k - 1]) & _MASK64
        hashes.append(h)
    if n < w:
        mn = min(hashes)
        sel = {hashes.index(mn)}  # first minimum (argmin convention)
    else:
        sel = set()
        for s in range(n - w + 1):
            win = hashes[s : s + w]
            mn = min(win)
            # rightmost occurrence of the window minimum
            off = max(i for i, hv in enumerate(win) if hv == mn)
            sel.add(s + off)
    fps = {hashes[i] for i in sel}
    return sorted(fp - (1 << 64) if fp >= (1 << 63) else fp for fp in fps)
