"""Unit tests of the shared S2G NumPy core against naive re-implementations."""

from __future__ import annotations

import numpy as np
import pytest

from dads_spark.s2g import CANONICAL, S2GParams
from dads_spark.s2g import core

RNG = np.random.default_rng(7)


def test_moving_sum_matches_naive():
    x = RNG.normal(size=200)
    c = 16
    got = core.moving_sum(x, c)
    # reference emits exactly n - c sums (ImprovedSequenceMatrixSink loop
    # runs while remaining > c)
    assert len(got) == len(x) - c
    want = np.array([x[t : t + c].sum() for t in range(len(x) - c)])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_embedding_is_hankel():
    ms = np.arange(20.0)
    d = 5
    emb = core.embedding_matrix(ms, d)
    assert emb.shape == (16, 5)
    for i in range(emb.shape[0]):
        for j in range(d):
            assert emb[i, j] == ms[i + j]


def test_slice_bounds_cover_and_overlap():
    m = 50
    n = 4003
    for p in (1, 2, 3, 4, 7):
        slices = core.slice_bounds(n, p, m)
        assert slices[0].start == 0 and slices[0].first_subseq == 0
        assert slices[-1].end == n
        # subsequence ownership partitions [0, n-m+1)
        total = sum(s.n_subsequences(m) for s in slices)
        assert total == n - m + 1
        for a, b in zip(slices, slices[1:]):
            assert b.start == a.start + a.n_subsequences(m)  # raw overlap m-1
            assert b.first_subseq == a.first_subseq + a.n_subsequences(m)


def test_tsqr_tree_matches_full_qr():
    d = 8
    blocks = [RNG.normal(size=(40, d)) for _ in range(5)]
    tree_r = core.tsqr_tree([np.linalg.qr(b, mode="r") for b in blocks])
    full_r = np.linalg.qr(np.vstack(blocks), mode="r")
    # R'R is the Gram matrix regardless of the reduction tree
    np.testing.assert_allclose(tree_r.T @ tree_r, full_r.T @ full_r, rtol=1e-10)


def test_finalize_pca_single_vs_multi_partition():
    params = S2GParams(m=20, c=6, S=10, ell=10)
    x = RNG.normal(size=800)
    slices1 = core.slice_bounds(len(x), 1, params.m)
    slices4 = core.slice_bounds(len(x), 4, params.m)

    def pca_for(slices):
        local = [core.pca_local(x[s.start : s.end], params) for s in slices]
        return core.finalize_pca(
            [l[0] for l in local],
            [l[1] for l in local],
            [l[2] for l in local],
            min(l[3] for l in local),
            max(l[4] for l in local),
            params,
        )

    p1, p4 = pca_for(slices1), pca_for(slices4)
    np.testing.assert_allclose(p1.column_means, p4.column_means, rtol=1e-12)
    np.testing.assert_allclose(
        np.abs(p1.principal_components), np.abs(p4.principal_components), rtol=1e-8
    )
    # sign rule: first row non-negative
    assert (p1.principal_components[0] >= 0).all()
    assert (p4.principal_components[0] >= 0).all()
    # rotation maps the reference vector onto +z
    ref = (
        np.full(params.d, params.c * p1.min_record) - p1.column_means
    ) @ p1.principal_components
    rotated = p1.rotation @ (ref / np.linalg.norm(ref))
    np.testing.assert_allclose(rotated, [0, 0, 1], atol=1e-9)


def test_density_grid_excludes_endpoint():
    g = core.density_grid(10.0)
    assert len(g) == 250
    assert g[0] == 0.0
    assert g[-1] == pytest.approx(10.0 - 10.0 / 250)


def test_kde_nodes_finds_mixture_modes():
    samples = np.concatenate([RNG.normal(2.0, 0.1, 400), RNG.normal(6.0, 0.1, 400)])
    grid = core.density_grid(8.0)
    nodes = core.kde_nodes(samples, grid)
    assert len(nodes) == 2
    assert abs(nodes[0] - 2.0) < 0.2 and abs(nodes[1] - 6.0) < 0.2
    assert (np.diff(nodes) > 0).all()  # ascending


def test_kde_variance_formula_is_the_references():
    # variance = sumsq/(n-1) - (sum/n)*(sum/(n-1))
    # (DensityEstimatorControl.java:55-69) — NOT the textbook formula.
    s = RNG.normal(3.0, 2.0, 100)
    n = len(s)
    want = (s * s).sum() / (n - 1) - (s.sum() / n) * (s.sum() / (n - 1))
    assert want == pytest.approx(np.var(s, ddof=1), rel=1e-10)


def test_match_nodes_ties_prefer_lower_index():
    nodes = [np.array([1.0, 3.0])]
    idx = core.match_nodes(np.array([2.0]), np.array([0]), nodes)
    assert idx[0] == 0  # equidistant -> first wins (Calculate.java:463-481)


def test_edge_walk_semantics():
    # intersections at subseq 0 (two), 2 (one); local range [0, 6)
    segs = np.array([1, 2, 3])
    node_idx = np.array([0, 1, 0])
    subseqs = np.array([0, 0, 2])
    edges, last = core.edge_walk(segs, node_idx, subseqs, 0, 0, 6, None)
    # walk: first intersection matches (1,0); no lastNode -> no edge yet;
    # second at same subseq: edge (1,0)->(2,1) at slot 0;
    # subseq 2: self-loop slot 1 on (2,1); edge (2,1)->(3,0) at slot 2;
    # then counter -> 4, trailing self-loops at 4,5 (slot 3 skipped:
    # GraphPartitionCreator.java:62 increments once more before the tail).
    assert edges == [
        (0, 1, 0, 2, 1),
        (1, 2, 1, 2, 1),
        (2, 2, 1, 3, 0),
        (4, 3, 0, 3, 0),
        (5, 3, 0, 3, 0),
    ]
    assert last == (3, 0)


def test_path_scores_smart_matches_naive():
    # naive variant per ScoringWorkerControl.java:296-342
    slots = [RNG.normal(size=RNG.integers(1, 4)) for _ in range(40)]
    ell = 7
    smart, mn, mx = core.path_scores_smart(slots, ell)
    naive = []
    for start in range(len(slots) - ell + 1):
        vals = np.concatenate(slots[start : start + ell])
        naive.append(vals.sum() / len(vals))
    np.testing.assert_allclose(smart, naive, rtol=1e-9)
    assert mn == pytest.approx(min(naive)) and mx == pytest.approx(max(naive))


def test_running_means_smart_matches_naive():
    scores = RNG.normal(size=100)
    gmin, gmax = float(scores.min()), float(scores.max())
    m = 9
    got = core.running_means_smart(scores, gmin, gmax, m)
    norm = (-scores - (gmax * -1.0)) / (((gmin * -1.0) - (gmax * -1.0)) * m)
    want = np.array([norm[i : i + m].sum() for i in range(len(scores) - m + 1)])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_intersections_creation_order_and_distances():
    # a spiral crossing all rays: every consecutive pair should yield
    # intersections whose distance lies between the two point radii
    params = S2GParams(m=20, c=6, S=12, ell=10)
    t = np.linspace(0, 6 * np.pi, 500)
    r = np.linspace(1.0, 3.0, 500)
    proj = np.vstack([r * np.cos(t), r * np.sin(t)])
    segs, dists, creation, subseqs = core.intersections_for_projection(proj, 0, params)
    assert len(segs) == 36  # 3 full turns x 12 rays, one crossing each
    assert (np.diff(creation) > 0).all()  # strictly ascending emission
    assert (dists > 0.9).all() and (dists < 3.1).all()
    assert (subseqs[np.argsort(creation)] == np.sort(subseqs)).all()


def test_node_degrees_counts_distinct_edges():
    weights = {(0, 0, 1, 0): 5, (1, 0, 0, 0): 2, (2, 2, 2, 2): 9}
    deg = core.node_degrees(weights)
    assert deg[(0, 0)] == 2  # one out, one in — weights ignored
    assert deg[(1, 0)] == 2
    assert deg[(2, 2)] == 2  # self-loop counts twice (Calculate.java:497-504)


def test_vectorized_accumulators_bit_identical_to_scalar_fold():
    """The np.add.accumulate vectorization of the smart windows must replay
    the scalar left fold's IEEE op sequence exactly — assert `==`, not
    allclose, over randomized slot structures."""

    def scalar_flat(summands, slot_starts, ell):
        n_scores = len(slot_starts) - ell + 1
        scores = np.empty(max(0, n_scores))
        mn, mx = core.JAVA_DOUBLE_MAX_VALUE, core.JAVA_DOUBLE_MIN_VALUE
        bounds = np.append(slot_starts, len(summands)).astype(np.int64)
        vals = summands.tolist()
        ps = 0.0
        for v in vals[bounds[0] : bounds[ell]]:
            ps += v
        count = int(bounds[ell] - bounds[0])
        s = ps / count
        scores[0] = s
        mn, mx = min(mn, s), max(mx, s)
        for st in range(1, n_scores):
            for v in vals[bounds[st - 1] : bounds[st]]:
                ps -= v
            for v in vals[bounds[st + ell - 1] : bounds[st + ell]]:
                ps += v
            count += int(bounds[st + ell] - bounds[st + ell - 1]) - int(
                bounds[st] - bounds[st - 1]
            )
            s = ps / count
            scores[st] = s
            mn, mx = min(mn, s), max(mx, s)
        return scores, mn, mx

    def scalar_rm(raw, gmin, gmax, m):
        mn, mx = gmax * -1.0, gmin * -1.0
        norm = (-raw - mn) / ((mx - mn) * m)
        n = len(norm) - m + 1
        out = np.empty(max(0, n))
        rm = 0.0
        for i in range(m):
            rm += norm[i]
        out[0] = rm
        for k in range(1, n):
            rm -= norm[k - 1]
            rm += norm[k + m - 1]
            out[k] = rm
        return out

    for trial in range(25):
        n_slots = int(RNG.integers(5, 200))
        ell = int(RNG.integers(2, min(15, n_slots)))
        lens = RNG.integers(1, 6, n_slots)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        summ = RNG.normal(scale=100, size=int(lens.sum())) * RNG.integers(
            1, 50, int(lens.sum())
        )
        a_s, a_mn, a_mx = core.path_scores_smart_flat(summ, starts, ell)
        b_s, b_mn, b_mx = scalar_flat(summ, starts, ell)
        assert (a_s == b_s).all() and a_mn == b_mn and a_mx == b_mx, trial

        raw = RNG.normal(size=int(RNG.integers(12, 300)))
        m = int(RNG.integers(2, 9))
        got = core.running_means_smart(raw, raw.min(), raw.max(), m)
        want = scalar_rm(raw, raw.min(), raw.max(), m)
        assert (got == want).all(), trial


# --- property tests: slice plans (hypothesis) -------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=30, max_value=5000),
    n_slices=st.integers(min_value=1, max_value=16),
    m=st.integers(min_value=2, max_value=30),
)
def test_equal_slice_plan_partitions_subsequences(n, n_slices, m):
    """Every subsequence is owned by exactly one slice; ranges overlap by
    exactly m-1; first_subseq indexes are dense."""
    from dads_spark.s2g.core import slice_bounds

    plan = slice_bounds(n, n_slices, m)
    if n < m:
        assert plan == []
        return
    assert plan[0].start == 0
    assert plan[-1].end == n
    total = sum(s.n_subsequences(m) for s in plan)
    assert total == n - m + 1
    for a, b in zip(plan, plan[1:]):
        assert b.start == a.end - (m - 1)  # exact overlap
        assert b.first_subseq == a.first_subseq + a.n_subsequences(m)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=50, max_value=5000),
    weights=st.lists(
        st.floats(min_value=0.1, max_value=100, allow_nan=False),
        min_size=1, max_size=8,
    ),
    m=st.integers(min_value=2, max_value=25),
)
def test_weighted_slice_plan_partitions_subsequences(n, weights, m):
    """The heterogeneous plan preserves the same invariants: full coverage,
    exact m-1 overlap, dense subsequence ownership, sizes proportional-ish
    to the sorted weights."""
    from dads_spark.s2g.core import slice_bounds_weighted

    plan = slice_bounds_weighted(n, weights, m)
    if n < m:
        assert plan == []
        return
    assert plan[0].start == 0
    assert plan[-1].end == n
    assert sum(s.n_subsequences(m) for s in plan) == n - m + 1
    for a, b in zip(plan, plan[1:]):
        assert b.start == a.end - (m - 1)
        assert b.first_subseq == a.first_subseq + a.n_subsequences(m)
