"""Single-process, partition-aware NumPy oracle for the full S2G pipeline.

``s2g_oracle(x, params, n_slices=P)`` reproduces what a P-processor run of
the reference system computes (see core.py for per-stage citations), using
the exact same building blocks as the Spark pipeline. Spark-at-P and
oracle-at-P must therefore be bit-identical; oracle-at-1 vs oracle-at-4 agree
only to fp tolerance (distributed PCA re-associates sums — true of the
reference as well).

The reference's end-to-end lifecycle replicated here:
reference: protocol flow in ActorSystemInitializer.java / SURVEY.md §3 E1.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from . import core
from .params import S2GParams


@dataclass
class SliceState:
    info: core.SliceInfo
    # intersections, creation-ordered
    segs: np.ndarray = field(default=None)
    dists: np.ndarray = field(default=None)
    creation: np.ndarray = field(default=None)
    subseqs: np.ndarray = field(default=None)
    node_idx: np.ndarray = field(default=None)
    edges: tuple = None  # (slots, fs, fi, ts, ti) arrays, emission order
    summands: np.ndarray = field(default=None)
    slot_starts: np.ndarray = field(default=None)
    raw_scores: np.ndarray = field(default=None)


@dataclass
class OracleResult:
    scores: np.ndarray  # final normalized running-mean scores, global order
    raw_scores: np.ndarray  # concatenated per-worker path scores
    pca: core.PCAResult
    nodes_by_segment: list
    edge_weights: dict
    node_degrees: dict
    max_value: float
    slices: list

    def anomaly_ranges(self, threshold: float) -> list[tuple[int, int]]:
        """Contiguous runs of window positions scoring above ``threshold``.

        The reference negates raw path scores during normalization
        (ScoringWorkerControl.java:491-497: norm = (-score - minScore)/f), so
        windows traversing rare graph edges — anomalies — come out HIGH in
        the final output."""
        mask = self.scores > threshold
        ranges = []
        start = None
        for i, m in enumerate(mask):
            if m and start is None:
                start = i
            elif not m and start is not None:
                ranges.append((start, i))
                start = None
        if start is not None:
            ranges.append((start, len(mask)))
        return ranges


def s2g_oracle(
    x: np.ndarray,
    params: S2GParams,
    n_slices: int = 1,
    slices: list | None = None,
) -> OracleResult:
    """``slices`` overrides the equal plan (e.g. a
    ``core.slice_bounds_weighted`` heterogeneous plan); semantics are
    identical — only the per-slice summation boundaries move."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if slices is None:
        slices = core.slice_bounds(n, n_slices, params.m)
    if not slices:
        raise ValueError("series shorter than one sub-sequence")

    # --- PCA (local QR per slice + master finalization) --------------------
    local = [core.pca_local(x[s.start:s.end], params) for s in slices]
    pca = core.finalize_pca(
        [l[0] for l in local],
        [l[1] for l in local],
        [l[2] for l in local],
        min(l[3] for l in local),
        max(l[4] for l in local),
        params,
    )

    # --- dimension reduction + coordinator handshake ------------------------
    # Padded projections: one extra leading raw value per non-first slice
    # recomputes the predecessor-boundary point locally (see
    # core.padded_projection; the reference ships the point instead).
    padded = []
    for s in slices:
        ext_start = s.start - 1 if s.first_subseq > 0 else s.start
        padded.append(core.padded_projection(x[ext_start:s.end], s.first_subseq, pca, params))
    unpadded_maxabs = [
        core.max_abs(proj[:, 1:] if s.first_subseq > 0 else proj)
        for (proj, _), s in zip(padded, slices)
    ]
    max_value = max(unpadded_maxabs) * core.MAXIMUM_VALUE_SCALE_FACTOR
    grid = core.density_grid(max_value)

    # --- intersections over padded projections ------------------------------
    states: list[SliceState] = []
    for i, s in enumerate(slices):
        proj, first = padded[i]
        segs, dists, creation, subseqs = core.intersections_for_projection(proj, first, params)
        order = np.argsort(creation, kind="stable")
        st = SliceState(info=s)
        st.segs, st.dists, st.creation, st.subseqs = (
            segs[order],
            dists[order],
            creation[order],
            subseqs[order],
        )
        states.append(st)

    # --- per-segment KDE over globally gathered samples ---------------------
    # samples per segment arrive per worker in index order, each worker's
    # share in emission order (reference shuffle:
    # NodeCreationWorkerControl.java:308-363)
    nodes_by_segment = []
    for seg in range(params.S):
        parts = [st.dists[st.segs == seg] for st in states]
        samples = np.concatenate(parts) if parts else np.empty(0)
        nodes_by_segment.append(core.kde_nodes(samples, grid))

    # --- edge-creation walk with boundary-node handoff ----------------------
    last_node: Optional[tuple[int, int]] = None
    for i, st in enumerate(states):
        st.node_idx = core.match_nodes(st.dists, st.segs, nodes_by_segment)
        s = st.info
        local_from = s.first_subseq
        local_to = s.first_subseq + s.n_subsequences(params.m)
        walk_first = local_from - 1 if local_from > 0 else local_from
        st.edges = core.edge_walk_arrays(
            st.segs, st.node_idx, st.subseqs, walk_first, local_from, local_to, last_node
        )
        if len(st.segs):
            last_node = (int(st.segs[-1]), int(st.node_idx[-1]))

    # --- graph merge + degrees (vectorized unique-count) ----------------------
    all_keys = np.concatenate(
        [
            core.encode_edge_keys(st.edges[1], st.edges[2], st.edges[3], st.edges[4])
            for st in states
        ]
    )
    uniq, counts = np.unique(all_keys, return_counts=True)
    weights = {
        (
            int(k >> 45),
            int((k >> 30) & 0x7FFF),
            int((k >> 15) & 0x7FFF),
            int(k & 0x7FFF),
        ): int(c)
        for k, c in zip(uniq, counts)
    }
    degrees = core.node_degrees(weights)

    # --- path scoring (remote overlap = prev worker's last ell-1 slots) ------
    # reference: ScoringWorkerControl.java:149-167,393-418
    lookup = core.build_graph_lookup(weights, degrees)
    gmin = core.JAVA_DOUBLE_MAX_VALUE
    gmax = core.JAVA_DOUBLE_MIN_VALUE
    for i, st in enumerate(states):
        slots, fs, fi, ts, ti = st.edges
        summ = core.edge_summands_vectorized(fs, fi, ts, ti, lookup)
        starts = (
            np.concatenate([[0], np.nonzero(np.diff(slots))[0] + 1]).astype(np.int64)
            if len(slots)
            else np.empty(0, dtype=np.int64)
        )
        st.summands, st.slot_starts = summ, starts
        if i > 0:
            prev = states[i - 1]
            k = params.ell - 1
            ps = prev.slot_starts
            if len(ps):
                cut = int(ps[-k]) if len(ps) >= k else 0
                t_summ = prev.summands[cut:]
                t_starts = (ps[-k:] if len(ps) >= k else ps) - cut
                starts = np.concatenate([t_starts, starts + len(t_summ)])
                summ = np.concatenate([t_summ, summ])
        st.raw_scores, mn, mx = core.path_scores_smart_flat(summ, starts, params.ell)
        gmin = min(gmin, mn)
        gmax = max(gmax, mx)

    # --- normalization + running mean (m-1 raw-score overlap) ----------------
    finals = []
    for i, st in enumerate(states):
        if i > 0:
            prev = states[i - 1].raw_scores[-(params.m - 1):]
            scores_in = np.concatenate([prev, st.raw_scores])
        else:
            scores_in = st.raw_scores
        finals.append(core.running_means_smart(scores_in, gmin, gmax, params.m))

    return OracleResult(
        scores=np.concatenate(finals),
        raw_scores=np.concatenate([st.raw_scores for st in states]),
        pca=pca,
        nodes_by_segment=nodes_by_segment,
        edge_weights=weights,
        node_degrees=degrees,
        max_value=max_value,
        slices=states,
    )
