"""Golden-value tests for DTW/CLS, seeded from the reference doctests
(ref: tasks/R2R-judy/src/utils/dtw.py:26-34, src/utils/cls.py:31-39) on a
3x4 grid graph, plus vectorized-batch equivalence."""
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.utils.metrics import CLS, DTW, batched_ndtw_sdtw


def grid_distance():
    """All-pairs shortest path on nx.grid_graph([3, 4]): nodes (i, j) with
    i in 0..3, j in 0..2, unit edges -> Manhattan distance."""
    return lambda u, v: abs(u[0] - v[0]) + abs(u[1] - v[1])


def test_dtw_golden():
    d = grid_distance()
    dtw = DTW(d)
    prediction = [(0, 0), (1, 0), (2, 0), (3, 0)]
    reference = [(0, 0), (1, 0), (2, 1), (3, 2)]
    assert np.isclose(dtw(prediction, reference, "dtw")[0], 3.0)
    assert np.isclose(dtw(prediction, reference, "ndtw")[0], 0.77880078307140488)
    assert np.isclose(dtw(prediction, reference, "sdtw")[0], 0.77880078307140488)
    assert np.isclose(dtw(prediction[:2], reference, "sdtw")[0], 0.0)


def test_cls_golden():
    d = grid_distance()
    cls = CLS(d)
    reference = [(0, 0), (1, 0), (1, 1), (2, 1), (2, 2), (3, 2)]
    assert np.isclose(cls(reference, reference), 1.0)
    prediction = [(0, 0), (0, 1), (1, 1), (2, 1), (3, 1), (3, 2)]
    assert np.isclose(cls(reference, prediction), 0.81994915125863865)
    prediction = [(0, 1), (1, 1), (2, 1), (3, 1)]
    assert np.isclose(cls(reference, prediction), 0.44197196102702557)


def test_batched_dtw_matches_scalar(rng):
    # random distance structure from random points on a line graph
    N = 12
    pts = rng.uniform(0, 10, N)
    dist = np.abs(pts[:, None] - pts[None, :])

    B, Tp, Tr = 5, 6, 4
    pred = rng.integers(0, N, (B, Tp))
    ref = rng.integers(0, N, (B, Tr))
    pred_len = rng.integers(1, Tp + 1, B)
    ref_len = rng.integers(1, Tr + 1, B)

    ndtw, sdtw = batched_ndtw_sdtw(dist, pred, pred_len, ref, ref_len, threshold=3.0)
    d = lambda u, v: dist[u][v]
    for b in range(B):
        worker = DTW(d)
        n_ref, s_ref = worker(list(pred[b, : pred_len[b]]), list(ref[b, : ref_len[b]]), ["ndtw", "sdtw"])
        assert np.isclose(ndtw[b], n_ref), b
        assert np.isclose(sdtw[b], s_ref), b
