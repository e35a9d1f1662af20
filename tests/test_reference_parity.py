"""Direct numerical parity against the reference implementation.

The reference metric modules (dtw.py, cls.py) are importable standalone
(only numpy/networkx deps), so when the reference tree is mounted we
fuzz-compare our implementations against the actual reference code on
random graphs and paths.  Skipped when /root/reference is absent.
"""
import importlib.util
import os

import numpy as np
import pytest

REF_DIR = "/root/reference/tasks/R2R-judy/src/utils"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not mounted"
)


def _load(name):
    spec = importlib.util.spec_from_file_location(f"ref_{name}", os.path.join(REF_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def random_world():
    """Random connected graph as nested distance dicts (reference API)."""
    import networkx as nx

    N = 20
    rng = np.random.default_rng(3)
    G = nx.Graph()
    pts = rng.uniform(0, 10, (N, 2))
    for i in range(N):
        for j in range(i + 1, N):
            if rng.random() < 0.25 or j == i + 1:
                G.add_edge(i, j, weight=float(np.linalg.norm(pts[i] - pts[j])))
    distance = dict(nx.all_pairs_dijkstra_path_length(G))
    return distance


def _random_paths(rng, n_nodes, n_pairs=25):
    for _ in range(n_pairs):
        lp = rng.integers(1, 9)
        lr = rng.integers(2, 9)
        pred = rng.integers(0, n_nodes, lp).tolist()
        ref = rng.integers(0, n_nodes, lr).tolist()
        yield pred, ref


def test_dtw_fuzz_parity(random_world, rng):
    ref_dtw_mod = _load("dtw")
    from curriculum_learning_for_vln_tpu.utils.metrics import DTW

    ref_worker = ref_dtw_mod.DTW(distance=random_world, threshold=3.0)
    ours = DTW(lambda u, v: random_world[u][v], threshold=3.0)
    for pred, refp in _random_paths(rng, 20):
        # the reference asserts a *strict* subset of {dtw,ndtw,sdtw} — ask
        # for at most two metrics per call (dtw.py:64 quirk)
        expected = ref_worker(pred, refp, metric=["ndtw", "sdtw"])
        expected += ref_worker(pred, refp, metric=["dtw"])
        got = ours(pred, refp, ["ndtw", "sdtw"]) + ours(pred, refp, ["dtw"])
        assert np.allclose(got, expected, atol=1e-9), (pred, refp)


def test_cls_fuzz_parity(random_world, rng):
    ref_cls_mod = _load("cls")
    from curriculum_learning_for_vln_tpu.utils.metrics import CLS

    ref_worker = ref_cls_mod.CLS(distance=random_world, threshold=3.0)
    ours = CLS(lambda u, v: random_world[u][v], threshold=3.0)
    for pred, refp in _random_paths(rng, 20):
        if len(pred) < 2 or len(refp) < 2:
            continue
        expected = ref_worker(pred, refp)
        got = ours(pred, refp)
        assert np.isclose(got, expected, atol=1e-9), (pred, refp)
