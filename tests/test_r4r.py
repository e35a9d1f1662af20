"""R4R: joined-path dataset construction + fidelity-metric evaluation.

R4R (Jain et al. '19) joins R2R path pairs end-to-start; the reference
only name-checks the dataset in its evaluator (ref: evaluator.py:34) —
the construction here (data/datasets.py::make_r4r_items) is an original
capability.  These tests pin the join semantics and prove the evaluator
scores string R4R path ids with discriminative fidelity metrics.
"""
import jax
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import TestAgent, assemble_trajectories
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items, make_r4r_items
from curriculum_learning_for_vln_tpu.engine.evaluator import Evaluation
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv


@pytest.fixture(scope="module")
def r4r_items(synth_dataset):
    items = make_r4r_items(synth_dataset, max_joins_per_anchor=2, seed=0)
    assert items, "synthetic dataset produced no joinable path pairs"
    return items


def test_join_semantics(synth_dataset, r4r_items):
    by_id = {it["path_id"]: it for it in synth_dataset}
    for it in r4r_items:
        a_id, b_id = it["path_id"].split("j")
        a, b = by_id[int(a_id)], by_id[int(b_id)]
        assert a["path_id"] != b["path_id"]
        assert a["scan"] == b["scan"] == it["scan"]
        # second path starts where the first ends; join drops the shared node
        assert a["path"][-1] == b["path"][0]
        assert it["path"] == list(a["path"]) + list(b["path"])[1:]
        assert it["heading"] == a["heading"]
        assert it["distance"] == pytest.approx(a["distance"] + b["distance"])
        assert len(it["instructions"]) == 3  # evaluator contract (ref: evaluator.py:35)
        for k in range(3):
            assert a["instructions"][k].strip() in it["instructions"][k]
            assert b["instructions"][k].strip() in it["instructions"][k]


def test_join_cap_and_determinism(synth_dataset):
    capped = make_r4r_items(synth_dataset, max_joins_per_anchor=1, seed=3)
    anchors = [it["path_id"].split("j")[0] for it in capped]
    assert len(anchors) == len(set(anchors))  # <= 1 continuation per anchor
    again = make_r4r_items(synth_dataset, max_joins_per_anchor=1, seed=3)
    assert capped == again
    uncapped = make_r4r_items(synth_dataset, max_joins_per_anchor=10**9, seed=3)
    assert len(uncapped) >= len(capped)


def test_r4r_paths_are_not_shortest(synth_world, r4r_items):
    """The point of R4R: joined routes overshoot the start->goal geodesic."""
    longer = 0
    for it in r4r_items:
        dist = synth_world.scan_dist(it["scan"])
        loc = lambda vp: int(synth_world.node_local[synth_world.global_id(it["scan"], vp)])
        hops = [dist[loc(u), loc(v)] for u, v in zip(it["path"], it["path"][1:])]
        geodesic = dist[loc(it["path"][0]), loc(it["path"][-1])]
        if sum(hops) > geodesic + 1e-6:
            longer += 1
    assert longer / len(r4r_items) > 0.5


def test_evaluator_scores_r4r(synth_world, r4r_items, tokenizer):
    """Rollout a teacher-following agent over an R4R env: the goal-directed
    teacher reaches the goal (SR high) but shortcuts the twisted gt routes,
    so the fidelity metrics must come out clearly below 1 — the
    discriminative property R4R exists for."""
    data = expand_r2r_items(r4r_items, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=6, tokenizer=tokenizer,
                       seed=5, name="val_seen")
    tables = synth_world.device_tables()
    agent = TestAgent(episode_len=16)
    results = []
    for ep in henv.eval_batches():
        _, result, _ = agent.rollout({}, {}, tables, ep, jax.random.PRNGKey(0))
        results += assemble_trajectories(synth_world, ep, result, data)
    ev = Evaluation(synth_world, r4r_items, data_name="R4R")
    summary, scores = ev.score(results)
    assert summary["success_rate"] > 0.9
    # geodesic teacher vs twisted gt: path fidelity visibly imperfect
    assert summary["ndtw"] < 0.95
    assert summary["cls"] < 0.95
    assert summary["ndtw"] > 0.05  # but still correlated with the route


def _rollout_summary(world, items, tokenizer, teacher_mode, episode_len=20):
    data = expand_r2r_items(items, tokenizer)
    henv = R2RBatchEnv(world, data, batch_size=6, tokenizer=tokenizer,
                       seed=5, name="val_seen", teacher_mode=teacher_mode)
    tables = world.device_tables()
    agent = TestAgent(episode_len=episode_len)
    results = []
    for ep in henv.eval_batches():
        _, result, _ = agent.rollout({}, {}, tables, ep, jax.random.PRNGKey(0))
        results += assemble_trajectories(world, ep, result, data)
    summary, _ = Evaluation(world, items, data_name="R4R").score(results)
    return summary


def test_path_teacher_reproduces_r4r_routes(synth_world, r4r_items, tokenizer):
    """AGENT.TEACHER=path (gt-route fidelity supervision): a
    teacher-following agent now reproduces the twisted R4R routes, where
    the goal-directed reference teacher shortcuts them — the fidelity gap
    is the whole point of the mode (env/env.py::_teacher_target)."""
    path_sum = _rollout_summary(synth_world, r4r_items, tokenizer, "path")
    goal_sum = _rollout_summary(synth_world, r4r_items, tokenizer, "goal")
    assert path_sum["success_rate"] > 0.9
    # route-faithful (incl. routes that revisit nodes — the waypoint
    # pointer preserves loops); large margin over the geodesic teacher
    assert path_sum["ndtw"] > 0.95
    assert path_sum["cls"] > 0.95
    assert path_sum["ndtw"] > goal_sum["ndtw"] + 0.2
    assert path_sum["cls"] > goal_sum["cls"] + 0.2


def test_path_teacher_matches_goal_teacher_on_r2r(synth_world, synth_dataset, tokenizer):
    """On R2R (gt routes ARE shortest paths) the path teacher is
    behaviorally identical to the reference goal teacher: SR 1, nDTW 1."""
    s = _rollout_summary(synth_world, synth_dataset, tokenizer, "path", episode_len=10)
    assert s["success_rate"] == 1.0
    assert s["ndtw"] > 0.99


def test_pipeline_builds_r4r_synthetic():
    from curriculum_learning_for_vln_tpu import pipeline
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults
    from curriculum_learning_for_vln_tpu.utils.tokenizer import Tokenizer, build_vocab

    cfg = get_cfg_defaults()
    cfg.DATA.NAME = "R4R"
    cfg.DATA.R4R_JOINS = 2
    cfg.TPU.SYNTHETIC_WORLD = True
    cfg.TPU.SYNTHETIC_SCANS = 2
    cfg.TPU.SYNTHETIC_NODES = 20
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.DATA.MAX_ENC_LEN = 24
    _, splits, _, _ = pipeline.build_synthetic_universe(cfg, seed=2020)
    vocab_items = splits["train"] + splits["val_seen"] + splits["val_unseen"]
    tok = Tokenizer(build_vocab(vocab_items, min_count=1),
                    encoding_length=cfg.DATA.MAX_ENC_LEN)
    world, train_env, valid_env, feat_dim = pipeline.build_environments(cfg, tok, seed=2020)
    assert train_env.size() > 0
    for it in train_env.data:
        assert "j" in str(it["path_id"])
    assert valid_env["val_unseen"].size() > 0
