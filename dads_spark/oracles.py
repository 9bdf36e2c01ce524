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

def holt_oracle(x: np.ndarray, alpha: float, beta: float, phi: float = 1.0):
    """(forecast, residual) via the standard double-exponential recurrence,
    written as plain Python-float scalar steps (IEEE double, identical
    expression tree to any faithful implementation):
    level_0 = x_0, trend_0 = x_1 - x_0; f_t = level + phi*trend;
    level' = a x_t + (1-a) f_t; trend' = b (level'-level) + (1-b)(phi*trend).
    phi = 1.0 is classic Holt (IEEE multiply-by-one identity); phi < 1 is
    Gardner-McKenzie damped trend."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    f = [float("nan")] * n
    if n < 2:
        return np.array(f), np.full(n, np.nan)
    level = float(x[0])
    trend = float(x[1]) - float(x[0])
    for t in range(1, n):
        ft = level + phi * trend
        f[t] = ft
        new_level = alpha * float(x[t]) + (1 - alpha) * ft
        trend = beta * (new_level - level) + (1 - beta) * (phi * trend)
        level = new_level
    fa = np.array(f, dtype=np.float64)
    return fa, x - fa


def holt_outliers_oracle(
    x: np.ndarray, alpha: float, beta: float, n_sigma: float,
    phi: float = 1.0,
):
    """Outlier selection mirroring the production contract: residual sigma
    over finite residuals (np.std for reduction-order parity), flag
    |resid| > n_sigma * sigma. Returns (idx, value, forecast, residual)."""
    fc, resid = holt_oracle(x, alpha, beta, phi)
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
# MinHash / SimHash — scalar FNV + direct all-pairs definitions
# ---------------------------------------------------------------------------

def fnv1a_scalar(token: str) -> int:
    """Per-byte FNV-1a fold in Python ints mod 2^64 — the scalar definition
    the production kernel's across-token vectorization is pinned against."""
    h = 0xCBF29CE484222325
    for byte in token.encode():
        h = ((h ^ byte) * 0x100000001B3) & _MASK64
    return h


_MERSENNE31 = (1 << 31) - 1


def minhash_permutations(num_hashes: int = 64, seed: int = 42):
    """The operator family's (a, b) parameters — part of the spec, shared
    with the production kernel (same seed stream)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, num_hashes).astype(np.int64)
    b = rng.integers(0, _MERSENNE31, num_hashes).astype(np.int64)
    return a, b


def minhash_signature_oracle(
    text: str, a: np.ndarray, b: np.ndarray, cache: dict | None = None
) -> np.ndarray:
    """Signature = per-permutation min of (a*x + b) mod (2^31 - 1) over the
    doc's DISTINCT token FNV hashes; empty doc -> the modulus. Exact
    integer arithmetic (Python ints / int64 products < 2^62)."""
    toks = set(text.split()) if text else set()
    if not toks:
        return np.full(len(a), _MERSENNE31, dtype=np.int64)
    if cache is None:
        cache = {}
    xs = []
    for t in toks:
        if t not in cache:
            cache[t] = fnv1a_scalar(t) % _MERSENNE31
        xs.append(cache[t])
    x = np.array(sorted(set(xs)), dtype=np.int64)
    vals = (x[:, None] * a[None, :] + b[None, :]) % _MERSENNE31
    return vals.min(axis=0)


def minhash_pairs_oracle(
    ids: list[int], texts: list[str], num_hashes: int = 64, threshold: float = 0.8
):
    """All-pairs minhash agreement — the DIRECT definition of the LSH
    pipeline's output. At num_hashes=64 / bands=16 / threshold=0.8 the
    banded candidate generation is lossless by pigeonhole (est >= 0.8 means
    <= 12 disagreeing components, which can dirty at most 12 of 16 bands),
    so {pairs with agree/num_hashes >= threshold} IS the production pair
    set. Returns (id_a, id_b, est) with id_a < id_b, est rounded to 4dp
    (exact: est is dyadic, so floor(est*1e4+0.5)/1e4 equals HALF_UP)."""
    cache: dict[str, int] = {}
    a, b = minhash_permutations(num_hashes)
    sig = np.stack(
        [minhash_signature_oracle(t, a, b, cache) for t in texts]
    )
    ids_arr = np.asarray(ids, dtype=np.int64)
    out = []
    n = len(ids_arr)
    for i in range(n):
        agree = num_hashes - np.count_nonzero(sig[i + 1 :] != sig[i], axis=1)
        est = agree / float(num_hashes)
        for off in np.nonzero(est >= threshold)[0]:
            j = i + 1 + off
            lo, hi = sorted((int(ids_arr[i]), int(ids_arr[j])))
            out.append((lo, hi, float(np.floor(est[off] * 1e4 + 0.5) / 1e4)))
    return out


def simhash_oracle(text: str, cache: dict | None = None) -> int:
    """64-bit SimHash over distinct token FNV hashes, scalar per-bit vote
    (bit set iff strictly more tokens have it than not); signed int64."""
    toks = set(text.split()) if text else set()
    if not toks:
        return 0
    if cache is None:
        cache = {}
    hs = []
    for t in toks:
        if t not in cache:
            cache[t] = fnv1a_scalar(t)
        hs.append(cache[t])
    n = len(hs)
    word = 0
    for bit in range(64):
        cnt = sum((h >> bit) & 1 for h in hs)
        if 2 * cnt - n > 0:
            word |= 1 << bit
    return word - (1 << 64) if word >= (1 << 63) else word


def simhash_pairs_oracle(ids: list[int], texts: list[str], max_hamming: int = 3):
    """All-pairs SimHash Hamming pairs — the direct definition; the Manku
    pigeonhole banding (4 x 16 bits at max_hamming=3) is lossless, so this
    IS the production pair set. Returns (id_a, id_b, hamming), id_a < id_b."""
    cache: dict[str, int] = {}
    sh = [simhash_oracle(t, cache) & _MASK64 for t in texts]
    ids_arr = [int(i) for i in ids]
    out = []
    n = len(ids_arr)
    for i in range(n):
        for j in range(i + 1, n):
            d = bin(sh[i] ^ sh[j]).count("1")
            if d <= max_hamming:
                lo, hi = sorted((ids_arr[i], ids_arr[j]))
                out.append((lo, hi, d))
    return out


# ---------------------------------------------------------------------------
# IVF ANN — local mirror of the full pipeline (training branch included)
# ---------------------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5


def xxh64_long(value: int, seed: int = 42) -> int:
    """Spark's ``xxhash64`` of one LongType value (XXH64.hashLong, public
    xxHash spec / Spark catalyst XXH64.java): needed to replicate the IVF
    trainer's hash-stratum sampling filter exactly. Returns signed int64."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _MASK64

    h = (seed + _XXP5 + 8) & _MASK64
    k1 = (value & _MASK64) * _XXP2 & _MASK64
    k1 = rotl(k1, 31) * _XXP1 & _MASK64
    h ^= k1
    h = (rotl(h, 27) * _XXP1 + _XXP4) & _MASK64
    h ^= h >> 33
    h = h * _XXP2 & _MASK64
    h ^= h >> 29
    h = h * _XXP3 & _MASK64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def ann_ivf_oracle(
    ids: np.ndarray,
    vecs: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
):
    """Single-threaded mirror of the IVF pipeline on the whole table at
    once: hash-stratum (or fallback) training sample, seeded spherical
    k-means, cell assignment, probe masking, exact cosine, HALF_UP-6dp
    ranking with id tiebreak. This pins the DISTRIBUTED path (Arrow
    batching, per-batch tie-safe pruning, window ranking) against one local
    evaluation; approximation quality itself is pinned by the
    full-probe==exact recall test. Returns rows (query_id, neighbor_id,
    rank, cosine6)."""
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], np.asarray(vecs, dtype=np.float64)[order]
    # training sample: the 1/64 hash stratum, first sample_size by id;
    # thin stratum (tiny tables) -> first sample_size of the full table
    stratum = np.array([i for i in range(len(ids)) if xxh64_long(int(ids[i])) % 64 == 0])
    sel = stratum[:sample_size] if len(stratum) else stratum
    if len(sel) < max(n_cells * 4, 64):
        sel = np.arange(min(sample_size, len(ids)))
    X = vecs[sel]
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=n_cells, replace=False)]
    for _ in range(kmeans_iters):
        assign = (X @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-30)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    qmat = np.stack([vecs[id_to_row[q]] for q in query_ids])
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    probe = np.zeros((n_cells, len(query_ids)), dtype=bool)
    for qi in range(len(query_ids)):
        for c in np.argsort(-(cent @ qmat[qi]))[:n_probe]:
            probe[int(c), qi] = True
    mat = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    cells = (mat @ cent.T).argmax(axis=1)
    cos = mat @ qmat.T
    allowed = probe[cells]
    allowed &= ids[:, None] != np.asarray(query_ids, dtype=np.int64)[None, :]
    rows = []
    for qi, q in enumerate(query_ids):
        col = np.where(allowed[:, qi], cos[:, qi], -np.inf)
        finite = np.isfinite(col)
        key = np.where(
            finite, np.sign(col) * np.floor(np.abs(col) * 1e6 + 0.5), -np.inf
        )
        # rank by (HALF_UP 6dp key desc, neighbor_id asc), row_number <= k
        cand = np.nonzero(finite)[0]
        cand = sorted(cand, key=lambda i: (-key[i], int(ids[i])))[:k]
        for r, i in enumerate(cand, start=1):
            rows.append((int(q), int(ids[i]), r, float(key[i] / 1e6)))
    return rows


def kmeans_assign_oracle(
    ids: np.ndarray,
    vecs: np.ndarray,
    n_clusters: int = 8,
    sample_size: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
):
    """Local mirror of the cluster-assignment pass (same trainer spec as
    the IVF oracle, argmax-cosine assignment, tie-free q6 similarity).
    Returns (id, cluster, sim_q6) rows."""
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], np.asarray(vecs, dtype=np.float64)[order]
    stratum = np.array(
        [i for i in range(len(ids)) if xxh64_long(int(ids[i])) % 64 == 0]
    )
    sel = stratum[:sample_size] if len(stratum) else stratum
    if len(sel) < max(n_clusters * 4, 64):
        sel = np.arange(min(sample_size, len(ids)))
    X = vecs[sel]
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=n_clusters, replace=False)]
    for _ in range(kmeans_iters):
        assign = (X @ cent.T).argmax(axis=1)
        for c in range(n_clusters):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-30)
    mat = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    cos = mat @ cent.T
    cl = cos.argmax(axis=1)
    best = cos[np.arange(len(cl)), cl]
    q = np.floor(best * 1e6 + 0.5).astype(np.int64)
    return [(int(i), int(c), int(s)) for i, c, s in zip(ids, cl, q)]


def semdedup_oracle(
    ids: np.ndarray,
    vecs: np.ndarray,
    tau_q6: int = 950_000,
    n_clusters: int = 8,
    sample_size: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
):
    """Local mirror of the SemDeDup pass: the kmeans_assign_oracle trainer
    spec for cluster assignment, then within every cluster drop each id
    that has a LOWER-id member at quantized cosine >= tau_q6, witnessing
    the smallest such id. Returns (id, cluster, dropped, witness_or_None)
    rows — a pure function of the input set."""
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vecs = np.asarray(vecs, dtype=np.float64)[order]
    assign = {
        i: c for i, c, _ in kmeans_assign_oracle(
            ids, vecs, n_clusters, sample_size, kmeans_iters, seed
        )
    }
    mat = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    rows = []
    for c in sorted(set(assign.values())):
        idx = np.array([k for k, i in enumerate(ids) if assign[int(i)] == c])
        sub = mat[idx]
        cos_q6 = np.floor(sub @ sub.T * 1e6 + 0.5).astype(np.int64)
        cids = ids[idx]
        for p in range(len(cids)):
            hits = np.nonzero(cos_q6[p, :p] >= tau_q6)[0]
            if len(hits):
                rows.append((int(cids[p]), int(c), True, int(cids[hits[0]])))
            else:
                rows.append((int(cids[p]), int(c), False, None))
    return rows


def cdc_chunks_oracle(
    ids,
    payloads,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
):
    """Textbook per-byte mirror of ops/dedup.py cdc_boundaries +
    cdc_chunk_table: h = (2h + GEAR[b]) mod 2^64, cut when
    (h & (avg-1)) == 0 under min/max sizes, chunk hash = 60-bit md5
    prefix. Returns rows (id, chunk_idx, offset, length, chunk_hash)."""
    import hashlib

    from dads_spark.ops.dedup import GEAR

    m64 = (1 << 64) - 1
    mask = avg_size - 1
    rows = []
    for did, payload in zip(ids, payloads):
        data = bytes(payload)
        h = 0
        start = 0
        ci = 0
        for pos, byte in enumerate(data):
            h = ((h << 1) + int(GEAR[byte])) & m64
            length = pos - start + 1
            if length >= max_size or (length >= min_size and (h & mask) == 0):
                chunk = data[start : pos + 1]
                rows.append(
                    (
                        int(did),
                        ci,
                        start,
                        length,
                        int(hashlib.md5(chunk).hexdigest()[:15], 16),
                    )
                )
                ci += 1
                start = pos + 1
        if start < len(data):
            chunk = data[start:]
            rows.append(
                (
                    int(did),
                    ci,
                    start,
                    len(chunk),
                    int(hashlib.md5(chunk).hexdigest()[:15], 16),
                )
            )
    return rows


def embedding_pca_oracle(ids, vecs, k: int = 4, n_slices: int = 8):
    """Scalar mirror of ops/embpca.py: id%P slicing in vec_id order,
    per-slice centered QR, weighted-mean correction stack + TSQR tree +
    SVD, first-coordinate sign rule, micro-unit quantized projections.
    Returns rows (id, pc1_q6, ..., pck_q6)."""
    import math as _math

    from dads_spark.s2g.core import tsqr_tree

    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vecs = np.asarray(vecs, dtype=np.float64)[order]
    d = vecs.shape[1]
    means, rs, counts = [], [], []
    for s in range(n_slices):
        sub = vecs[ids % n_slices == s]
        if len(sub) == 0:
            continue
        m = sub.mean(axis=0)
        means.append(m)
        rs.append(np.linalg.qr(sub - m, mode="r"))
        counts.append(len(sub))
    total_n = sum(counts)
    total_mean = np.zeros(d)
    for m_i, n_i in zip(means, counts):
        total_mean = total_mean + m_i * (n_i / float(total_n))
    corr = [
        (m_i - total_mean) * _math.sqrt(n_i) for m_i, n_i in zip(means, counts)
    ]
    r_final = np.linalg.qr(np.vstack(corr + [tsqr_tree(rs)]), mode="r")
    _, _, vt = np.linalg.svd(r_final)
    v = vt.T[:, :k].copy()
    for col in range(k):
        if v[0, col] < 0.0:
            v[:, col] = -v[:, col]
    coords = (vecs - total_mean) @ v
    q = (np.sign(coords) * np.floor(np.abs(coords) * 1e6 + 0.5)).astype(np.int64)
    return [(int(i), *map(int, q[j])) for j, i in enumerate(ids)]


def bpe_train_oracle(texts, n_merges: int = 30, min_pair_count: int = 2):
    """Scalar mirror of ops/bpe.py bpe_train: classic Sennrich BPE over the
    whitespace word-frequency table, argmax tie-break (count DESC, left
    ASC, right ASC), greedy leftmost non-overlapping merge application.
    Returns [(rank, left, right, merged, pair_count)]."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    learned = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            c = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (lv, rv), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        learned.append((rank, lv, rv, lv + rv, int(n)))
        for w, syms in vocab.items():
            vocab[w] = _bpe_merge_once(syms, lv, rv)
    return learned


def _bpe_merge_once(syms, lv, rv):
    out = []
    for x in syms:
        if out and out[-1] == lv and x == rv:
            out[-1] = lv + rv
        else:
            out.append(x)
    return out


def bpe_encode_oracle(ids, texts, merges):
    """Scalar mirror of ops/bpe.py bpe_encode. Returns
    [(id, n_words, n_chars, n_bpe_tokens, compression_q6)]."""
    import math

    rows = []
    for did, t in zip(ids, texts):
        wsyms = [list(w) for w in t.split(" ") if w]
        for lv, rv in merges:
            wsyms = [_bpe_merge_once(s, lv, rv) for s in wsyms]
        n_chars = sum(len(x) for s in wsyms for x in s)
        n_tok = sum(len(s) for s in wsyms)
        rows.append(
            (
                int(did),
                len(wsyms),
                n_chars,
                n_tok,
                int(math.floor(1e6 * n_chars / n_tok + 0.5)) if n_tok else 0,
            )
        )
    return rows


def ann_lsh_oracle(
    ids: np.ndarray,
    vecs: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 12,
    n_bands: int = 4,
    seed: int = 42,
):
    """Local mirror of the hyperplane-LSH ANN pipeline: seeded random
    hyperplanes, sign-pattern band buckets, candidates = any shared
    (band, bucket) with a query, exact cosine re-rank ordered by raw
    cosine desc with id tiebreak. Returns (query_id, neighbor_id, rank,
    cosine6) rows."""
    ids = np.asarray(ids, dtype=np.int64)
    vecs = np.asarray(vecs, dtype=np.float64)
    dim = vecs.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_bands, n_planes, dim))
    codes = np.empty((n_bands, len(ids)), dtype=np.int64)
    for band in range(n_bands):
        proj = vecs @ planes[band].T > 0
        packed = np.packbits(proj, axis=1, bitorder="little")[:, :2]
        codes[band] = packed[:, 0].astype(np.int64) + (
            packed[:, 1].astype(np.int64) << 8 if packed.shape[1] > 1 else 0
        )
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    rows = []
    for q in query_ids:
        qi = id_to_row[int(q)]
        cand_mask = np.zeros(len(ids), dtype=bool)
        for band in range(n_bands):
            cand_mask |= codes[band] == codes[band, qi]
        cand_mask[qi] = False
        cand = np.nonzero(cand_mask)[0]
        # per-row elementwise-multiply + sum, the re-rank kernel's expression
        cos = (norm[cand] * norm[qi][None, :]).sum(axis=1)
        order = sorted(range(len(cand)), key=lambda t: (-cos[t], int(ids[cand[t]])))[:k]
        for r, t in enumerate(order, start=1):
            c6 = float(np.sign(cos[t]) * np.floor(np.abs(cos[t]) * 1e6 + 0.5) / 1e6)
            rows.append((int(q), int(ids[cand[t]]), r, c6))
    return rows


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


def pattern_topk_oracle(
    x: np.ndarray, pattern: np.ndarray, k: int
) -> list[tuple[int, int]]:
    """Top-k pattern matches by the DIRECT definition: explicitly
    z-normalize the pattern and every window, take exact Euclidean
    distances (no FFT/MASS arithmetic), rank by (q6 distance, index).
    Flat windows follow the MASS convention (sqrt(2m) — no shape
    information)."""
    x = np.asarray(x, dtype=np.float64)
    pattern = np.asarray(pattern, dtype=np.float64)
    m = len(pattern)
    if len(x) < m:
        return []
    pq_ = pattern.std()
    zq = (pattern - pattern.mean()) / pq_ if pq_ > 0 else np.zeros(m)
    wins = np.lib.stride_tricks.sliding_window_view(x, m).astype(np.float64)
    mu = wins.mean(axis=1)
    sd = wins.std(axis=1)
    flat = sd == 0.0
    z = (wins - mu[:, None]) / np.where(flat, 1.0, sd)[:, None]
    d = np.sqrt(np.sum((z - zq[None, :]) ** 2, axis=1))
    d = np.where(flat | (pq_ == 0), np.sqrt(2.0 * m), d)
    q = np.floor(d * 1e6 + 0.5).astype(np.int64)
    order = sorted(range(len(q)), key=lambda i: (int(q[i]), i))[:k]
    return [(i, int(q[i])) for i in order]


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


def holt_winters_oracle(
    x: np.ndarray, m: int = 24, alpha: float = 0.3, beta: float = 0.1,
    gamma: float = 0.2,
):
    """Scalar textbook additive Holt-Winters (Winters 1960 / Hyndman fpp
    formulation): classical init over the first two seasons, then the
    three-state recurrence. Returns (forecast, residual); idx < m nan.

    Init means use a plain scalar sum — exact in float64 on integer count
    series, hence bit-identical to any vectorized/distributed sum."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    f = [float("nan")] * n
    r = [float("nan")] * n
    if n < 2 * m:
        return np.array(f), np.array(r)
    s1 = 0.0
    for i in range(m):
        s1 += x[i]
    s2 = 0.0
    for i in range(m, 2 * m):
        s2 += x[i]
    level = s1 / m
    trend = (s2 / m - level) / m
    season = [float("nan")] * n
    for i in range(m):
        season[i] = x[i] - level
    for t in range(m, n):
        f[t] = level + trend + season[t - m]
        new_level = alpha * (x[t] - season[t - m]) + (1 - alpha) * (level + trend)
        new_trend = beta * (new_level - level) + (1 - beta) * trend
        season[t] = gamma * (x[t] - new_level) + (1 - gamma) * season[t - m]
        level, trend = new_level, new_trend
        r[t] = x[t] - f[t]
    return np.array(f), np.array(r)


def dtw_oracle(a: np.ndarray, b: np.ndarray, band: int) -> float:
    """Scalar full-matrix banded DTW (Sakoe-Chiba 1978), L1 local cost,
    band on the length-normalized diagonal |i - round(i*m/n)| <= band.
    O(n*m) reference implementation — no row vectorization, every cell a
    scalar min of three floats, so it shares no array mechanics with the
    production kernel."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    INF = float("inf")
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(1, n + 1):
        center = int(round(i * m / n))
        for j in range(max(1, center - band), min(m, center + band) + 1):
            c = abs(float(a[i - 1]) - float(b[j - 1]))
            best = D[i - 1][j]
            if D[i][j - 1] < best:
                best = D[i][j - 1]
            if D[i - 1][j - 1] < best:
                best = D[i - 1][j - 1]
            D[i][j] = c + best
    return D[n][m]


def pelt_oracle(x: "np.ndarray", penalty: float) -> list[int]:
    """O(n^2) exact penalized-SSE segmentation DP — the unpruned textbook
    reference for rollup/changepoint.py:pelt_changepoints. Pure running
    sums + a double loop, earliest candidate wins ties (strict <), costs
    built from the identical prefix-sum expression so agreement with the
    PELT kernel is bitwise."""
    vals = [float(v) for v in x]
    n = len(vals)
    if n < 2:
        return []
    s1 = [0.0]
    s2 = [0.0]
    a = b = 0.0
    for v in vals:
        a += v
        b += v * v
        s1.append(a)
        s2.append(b)

    big = float("inf")
    F = [big] * (n + 1)
    F[0] = -penalty
    prev = [0] * (n + 1)
    for t in range(1, n + 1):
        best = big
        arg = 0
        for s in range(t):
            cost = (s2[t] - s2[s]) - (s1[t] - s1[s]) ** 2 / float(t - s)
            v = F[s] + cost + penalty
            if v < best:
                best = v
                arg = s
        F[t] = best
        prev[t] = arg

    cps: list[int] = []
    t = n
    while t > 0:
        s = prev[t]
        if s > 0:
            cps.append(s)
        t = s
    return cps[::-1]


def pq_topk_oracle(
    ids: "np.ndarray",
    vecs: "np.ndarray",
    books: "np.ndarray",
    q_ids: "np.ndarray",
    q_mat: "np.ndarray",
    k: int,
):
    """Scalar textbook PQ/ADC reference for ops/quantize.py: encode every
    vector with strict-< argmin loops, score via sequentially-accumulated
    lookup tables, rank by (6dp-quantized score desc, id asc). Returns
    [(query_id, neighbor_id, rank, score_q6)]. Bitwise twin of the
    vectorized kernels — same accumulation orders throughout."""
    m, ksub, dsub = books.shape
    n = len(ids)

    codes = [[0] * m for _ in range(n)]
    for i in range(n):
        for s in range(m):
            best = None
            arg = 0
            for c in range(ksub):
                acc = 0.0
                for dd in range(dsub):
                    diff = float(vecs[i, s * dsub + dd]) - float(books[s, c, dd])
                    acc += diff * diff
                if best is None or acc < best:
                    best = acc
                    arg = c
            codes[i][s] = arg

    out = []
    for qi in range(len(q_ids)):
        lut = [[0.0] * ksub for _ in range(m)]
        for s in range(m):
            for c in range(ksub):
                acc = 0.0
                for dd in range(dsub):
                    acc += float(q_mat[qi, s * dsub + dd]) * float(books[s, c, dd])
                lut[s][c] = acc
        scored = []
        for i in range(n):
            if int(ids[i]) == int(q_ids[qi]):
                continue
            sc = 0.0
            for s in range(m):
                sc += lut[s][codes[i][s]]
            q6v = _math_sign_floor_q6(sc)
            scored.append((-q6v, int(ids[i]), sc))
        scored.sort()
        for r, (negq6, nid, sc) in enumerate(scored[:k], 1):
            out.append((int(q_ids[qi]), nid, r, -negq6))
    return out


def _math_sign_floor_q6(x: float) -> int:
    """sign(x) * floor(|x| * 1e6 + 0.5) — the HALF_UP 6dp quantization the
    Spark side ranks and emits with (F.round semantics on doubles)."""
    import math

    s = -1.0 if x < 0 else 1.0
    return int(s * math.floor(abs(x) * 1e6 + 0.5))


def pq_ivf_oracle(
    ids: "np.ndarray",
    vecs: "np.ndarray",
    cent: "np.ndarray",
    books: "np.ndarray",
    query_ids: list,
    k: int = 10,
    n_probe: int = 4,
):
    """Single-threaded whole-table mirror of the IVF-PQ pipeline
    (ops/quantize.py:ann_ivf_pq) given its trained centroids/codebooks:
    normalize, coarse-assign, residual-encode (first-min argmin),
    probe-mask, coarse term + sequentially-accumulated ADC lookups,
    HALF_UP-6dp ranking with id tiebreak. Same expressions, same
    accumulation orders -> bitwise agreement with the distributed path.
    Returns rows (query_id, neighbor_id, rank, score_q6)."""
    m, ksub, dsub = books.shape
    ids = np.asarray(ids, dtype=np.int64)
    vecs = np.asarray(vecs, dtype=np.float64)
    mat = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    qmat = np.stack([mat[id_to_row[int(q)]] for q in query_ids])
    qc = qmat @ cent.T
    probe = np.zeros((len(cent), len(query_ids)), dtype=bool)
    for qi in range(len(query_ids)):
        for c in np.argsort(-qc[qi])[:n_probe]:
            probe[int(c), qi] = True

    cells = (mat @ cent.T).argmax(axis=1)
    resid = mat - cent[cells]
    codes = np.empty((len(mat), m), dtype=np.int64)
    for s in range(m):
        Rs = resid[:, s * dsub : (s + 1) * dsub]
        d2 = ((Rs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1)

    qsub = qmat.reshape(len(qmat), m, dsub)
    lut = np.empty((len(query_ids), m, ksub), dtype=np.float64)
    for qi in range(len(query_ids)):
        for s in range(m):
            for c in range(ksub):
                acc = 0.0
                for dd in range(dsub):
                    acc += float(qsub[qi, s, dd]) * float(books[s, c, dd])
                lut[qi, s, c] = acc

    scores = qc[:, cells].T.copy()
    for s in range(m):
        scores += lut[:, s, :][:, codes[:, s]].T
    allowed = probe[cells]
    allowed &= ids[:, None] != np.asarray(query_ids, dtype=np.int64)[None, :]
    scores = np.where(allowed, scores, -np.inf)

    rows = []
    for qi, q in enumerate(query_ids):
        col = scores[:, qi]
        finite = np.isfinite(col)
        key = np.where(
            finite, np.sign(col) * np.floor(np.abs(col) * 1e6 + 0.5), -np.inf
        )
        cand = sorted(np.nonzero(finite)[0], key=lambda i: (-key[i], int(ids[i])))[:k]
        for r, i in enumerate(cand, start=1):
            rows.append((int(q), int(ids[i]), r, int(key[i])))
    return rows


def brute_matrix_profile_idx(x: np.ndarray, m: int, exclusion=None):
    """Brute-force matrix profile WITH nearest-neighbor indices (first
    minimum on ties, matching np.argmin in the STOMP path). Same direct
    z-normalized definition as ``brute_matrix_profile``."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    w = n - m + 1
    if w < 2:
        return np.empty(0), np.empty(0, dtype=np.int64)
    excl = int(np.ceil(m / 2)) if exclusion is None else int(exclusion)
    wins = np.lib.stride_tricks.sliding_window_view(x, m).astype(np.float64)
    mu = wins.mean(axis=1)
    sd = wins.std(axis=1)
    flat = sd == 0.0
    z = np.where(
        flat[:, None], 0.0, (wins - mu[:, None]) / np.where(flat, 1.0, sd)[:, None]
    )
    mp = np.full(w, np.inf)
    mpi = np.zeros(w, dtype=np.int64)
    for i in range(w):
        best, bj = np.inf, 0
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
                best, bj = d, j
        mp[i], mpi[i] = best, bj
    return mp, mpi


def top_motifs_oracle(mp, mpi, m, k, exclusion=None):
    """Greedy non-overlapping top-k motif pairs (smallest QUANTIZED
    profile first — the 1e-6 grid the gate emits, so pick order cannot
    flip on sub-q6 float noise between methods; stable on index; both
    pair members occupy exclusion zones)."""
    excl = int(np.ceil(m / 2)) if exclusion is None else int(exclusion)
    key = np.where(np.isfinite(mp), np.floor(mp * 1e6 + 0.5), np.inf)
    order = np.argsort(key, kind="stable")
    picked, occupied = [], []
    for i in order:
        if not np.isfinite(mp[i]):
            continue
        j = int(mpi[i])
        if any(abs(int(i) - p) <= excl or abs(j - p) <= excl for p in occupied):
            continue
        picked.append((int(i), j))
        occupied.extend((int(i), j))
        if len(picked) == k:
            break
    return picked


def core_numbers_oracle(edges):
    """Exact k-core numbers by the classic peel (Batagelj-Zaversnik
    order): repeatedly remove all nodes whose remaining degree <= the
    current k, raising k when no such node exists. Shares nothing with
    the distributed h-operator iteration."""
    adj: dict = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(s) for n, s in adj.items()}
    remaining = set(adj)
    core = {}
    k = 0
    while remaining:
        k = max(k, min(deg[n] for n in remaining))
        stack = [n for n in remaining if deg[n] <= k]
        while stack:
            n = stack.pop()
            if n not in remaining:
                continue
            core[n] = k
            remaining.remove(n)
            for u in adj[n]:
                if u in remaining:
                    deg[u] -= 1
                    if deg[u] <= k:
                        stack.append(u)
    return core


def pla_swing_oracle(t, v, eps: int):
    """Scalar swing-filter PLA oracle using ``fractions.Fraction``
    (normalized rational arithmetic — a different exactness mechanism
    from the kernel's raw cross-multiplication) AND a from-scratch cone
    recheck: at every step the feasible cone is recomputed over ALL
    points since the anchor, not narrowed incrementally. O(n^2) worst
    case; the textbook definition, shares no state mechanics with
    compress/pla.py. Returns [(t_start, v_start, t_end, v_end,
    n_points), ...]."""
    from fractions import Fraction

    t = [int(x) for x in t]
    v = [int(x) for x in v]
    n = len(t)
    if n == 0:
        return []
    if n == 1:
        return [(t[0], v[0], t[0], v[0], 1)]
    eps = int(eps)

    def cone_nonempty(a: int, end: int) -> bool:
        # feasible slopes keeping points a+1..end within +-eps of a line
        # anchored at (t[a], v[a]), recomputed from scratch
        lo, hi = None, None
        for i in range(a + 1, end + 1):
            dt = t[i] - t[a]
            c_lo = Fraction(v[i] - eps - v[a], dt)
            c_hi = Fraction(v[i] + eps - v[a], dt)
            lo = c_lo if lo is None or c_lo > lo else lo
            hi = c_hi if hi is None or c_hi < hi else hi
        return lo <= hi

    segs = []
    a = 0
    i = 1
    while i < n:
        if not cone_nonempty(a, i):
            segs.append((t[a], v[a], t[i - 1], v[i - 1], i - 1 - a + 1))
            a = i - 1
            continue
        i += 1
    segs.append((t[a], v[a], t[n - 1], v[n - 1], n - a))
    return segs


def isotonic_minimax_oracle(ns, ss):
    """Isotonic regression via the MINIMAX characterization — an
    algorithm independent of the engine's pool-adjacent-violators
    stack: for tie-pooled level i, yhat_i = max_{j<=i} min_{k>=i}
    mean(y[j..k]), evaluated with exact Fractions over integer
    (count, sum) prefix arrays. O(L^2) over the L distinct levels —
    oracle-side only. Returns one reduced (num, den) per level."""
    from fractions import Fraction

    L = len(ns)
    pn = [0] * (L + 1)
    ps = [0] * (L + 1)
    for i in range(L):
        pn[i + 1] = pn[i] + int(ns[i])
        ps[i + 1] = ps[i] + int(ss[i])
    out = []
    for i in range(L):
        best = None
        for j in range(i + 1):
            inner = None
            for k in range(i, L):
                m = Fraction(ps[k + 1] - ps[j], pn[k + 1] - pn[j])
                if inner is None or m < inner:
                    inner = m
            if best is None or inner > best:
                best = inner
        out.append((best.numerator, best.denominator))
    return out


def tier_counts_gapfilled(
    sf_dir: str, unit_s: int, offset_s: int = 0
) -> "dict[str, np.ndarray]":
    """hourly_counts_gapfilled generalized to any tier grain: per-type
    count series on the dense ``unit_s``-second grid with linear
    interpolation over gaps (np.interp reproduces Spark's
    gap_fill_linear bit-for-bit — the established staged-twin result).
    ``offset_s`` shifts the grid origin (the week tier's Monday
    anchor, rollup/tiers.py _OFFSET_US)."""
    import pyarrow.parquet as pq

    raw = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    sec = raw["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 10**9
    counts = (
        pd.DataFrame(
            {
                "event_type": raw["event_type"],
                "b": ((sec - offset_s) // unit_s) * unit_s + offset_s,
            }
        )
        .groupby(["event_type", "b"])
        .size()
    )
    out: dict[str, np.ndarray] = {}
    for et in sorted(counts.index.get_level_values(0).unique()):
        s = counts.loc[et]
        b = s.index.to_numpy(dtype=np.int64)
        v = s.to_numpy(dtype=np.float64)
        dense = np.arange(b[0], b[-1] + 1, unit_s)
        out[et] = np.interp(dense, b, v)
    return out


def seasonal_esd_oracle(t, v, season: int = 24, k: int = 8,
                        alpha: float = 0.05):
    """S-H-ESD by its direct definition in plain scalar Python: per-phase
    2*median seasonal component, then the generalized ESD walk on
    median/MAD with the integer decision 2*u*1e6 > lambda_q6 * md. The
    lambda_q6 critical values are published-table constants (from
    esd_lambdas_q6 — a shared INPUT, anchored independently by the
    t-table unit tests), not shared arithmetic. Returns rows
    (step, t, v, u, md, significant)."""
    from dads_spark.rollup.esd import esd_lambdas_q6

    t = [int(x) for x in t]
    v = [int(x) for x in v]
    n = len(v)

    def med2(sorted_list):
        m = len(sorted_list)
        h = m // 2
        if m % 2 == 1:
            return 2 * sorted_list[h]
        return sorted_list[h - 1] + sorted_list[h]

    by_phase: dict[int, list[int]] = {}
    for ti, vi in zip(t, v):
        by_phase.setdefault(ti % season, []).append(vi)
    sm2 = {ph: med2(sorted(vals)) for ph, vals in by_phase.items()}
    r2 = [2 * vi - sm2[ti % season] for ti, vi in zip(t, v)]

    lambdas = esd_lambdas_q6(n, k, alpha)
    active = [True] * n
    steps = []
    for step, lam in enumerate(lambdas, start=1):
        idxs = [i for i in range(n) if active[i]]
        if len(idxs) < 3:
            break
        m4 = med2(sorted(r2[i] for i in idxs))
        u = {i: abs(2 * r2[i] - m4) for i in idxs}
        md = med2(sorted(u.values()))
        sum_u = sum(u.values())
        n_act = len(idxs)
        if md == 0 and sum_u == 0:
            break
        cand, best = None, -1
        for i in idxs:  # index order => smallest-index tie-break
            if u[i] > best:
                cand, best = i, u[i]
        if md > 0:
            passed = 2 * best * 1_000_000 > lam * md
        else:  # MeanAD fallback (Leys et al.): u*L*1e6 > lam*sum_u
            passed = best * n_act * 1_000_000 > lam * sum_u
        steps.append((step, t[cand], v[cand], best, md, sum_u, n_act,
                      passed))
        active[cand] = False
    last_pass = max((s[0] for s in steps if s[7]), default=0)
    return [
        (s, ti, vi, ui, mdi, su, na, 1 if s <= last_pass else 0)
        for s, ti, vi, ui, mdi, su, na, _p in steps
    ]


def vopt_oracle(v, b: int = 6):
    """V-optimal histogram boundaries by the direct O(B n^2) dynamic
    program in plain scalar Python (arbitrary-precision ints), over the
    same floor-q3 integer SSE objective: c = (1000*(len*sum2 - sum^2))
    // len. Strict '<' keeps the smallest split index on ties. Returns
    [(bucket, start, end, n, sum, sum2, cost_q3)] with end exclusive."""
    v = [int(x) for x in v]
    n = len(v)
    b = min(b, n)
    if n == 0:
        return []
    ps = [0] * (n + 1)
    ps2 = [0] * (n + 1)
    for i, x in enumerate(v):
        ps[i + 1] = ps[i] + x
        ps2[i + 1] = ps2[i] + x * x

    def cost(i, j):  # segment [i, j] inclusive
        length = j + 1 - i
        s = ps[j + 1] - ps[i]
        s2 = ps2[j + 1] - ps2[i]
        return (1000 * (length * s2 - s * s)) // length

    INF = float("inf")
    dp = [[INF] * n for _ in range(b + 1)]
    back = [[0] * n for _ in range(b + 1)]
    for j in range(n):
        dp[1][j] = cost(0, j)
    for k in range(2, b + 1):
        for j in range(k - 1, n):
            best, bi = INF, None
            for i in range(k - 1, j + 1):
                tot = dp[k - 1][i - 1] + cost(i, j)
                if tot < best:
                    best, bi = tot, i
            dp[k][j] = best
            back[k][j] = bi
    starts = []
    j = n - 1
    for k in range(b, 1, -1):
        i = back[k][j]
        starts.append(i)
        j = i - 1
    starts.append(0)
    starts = starts[::-1]
    ends = starts[1:] + [n]
    out = []
    for bi, (s, e) in enumerate(zip(starts, ends), start=1):
        seg = v[s:e]
        length = e - s
        sv = sum(seg)
        s2 = sum(x * x for x in seg)
        out.append((bi, s, e, length, sv, s2,
                    (1000 * (length * s2 - sv * sv)) // length))
    return out


def haar_topk_oracle(v, k: int = 12):
    """Haar synopsis by its direct definition in plain scalar Python:
    pairwise sum/difference halvings over the largest power-of-two
    prefix, integer energy keys e = d^2 * 2^(J-j), ties (energy desc,
    level asc, pos asc). Returns the top-k (level, pos, coef, energy)."""
    n = len(v)
    m = 1
    while m * 2 <= n:
        m *= 2
    s = [int(x) for x in v[:m]]
    if not s:
        return []
    j_max = m.bit_length() - 1
    out = []
    for j in range(1, j_max + 1):
        d, ns = [], []
        for i in range(0, len(s), 2):
            d.append(s[i] - s[i + 1])
            ns.append(s[i] + s[i + 1])
        s = ns
        for pos, di in enumerate(d):
            out.append((j, pos, di, di * di * (1 << (j_max - j))))
    total = s[0]
    out.append((0, 0, total, total * total))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:k]
