"""Small-surface coverage: iterator modes, statistics, angle helpers,
profiling timers, logging table."""
import math
import time

import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.utils import angles
from curriculum_learning_for_vln_tpu.utils.logging_utils import format_score_table
from curriculum_learning_for_vln_tpu.utils.profiling import StepTimer


def test_tile_one_batches(synth_world, synth_dataset, tokenizer):
    """tile_one replicates a single item across the batch
    (ref: common_env.py:189-194)."""
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=5, tokenizer=tokenizer, seed=3)
    ep = henv.next_batch(tile_one=True)
    idx = np.asarray(ep.item_idx)
    assert len(set(idx.tolist())) == 1
    ep2 = henv.next_batch(tile_one=True)
    assert np.asarray(ep2.item_idx)[0] != idx[0]


def test_get_statistics(synth_world, synth_dataset, tokenizer):
    """Average instruction/path length (ref: common_env.py:355-365)."""
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=5, tokenizer=tokenizer, seed=3)
    stats = henv.get_statistics()
    assert stats["length"] > 0
    assert stats["path"] > 0
    # path stat equals mean geodesic start->goal distance
    d = np.mean([synth_world.dist[henv.start_node[i], henv.goal_local[i]]
                 for i in range(henv.size())])
    assert np.isclose(stats["path"], d, rtol=1e-5)


def test_angle_helpers():
    # heading snap (MatterSim discretized init semantics)
    assert angles.heading_to_view_index(0.0) == 12
    assert angles.heading_to_view_index(math.pi / 6) == 13
    assert angles.heading_to_view_index(2 * math.pi - 0.01) == 12
    assert angles.heading_to_view_index(0.0, elevation=math.pi / 6) == 24
    assert angles.heading_to_view_index(0.0, elevation=-math.pi / 6) == 0
    # canonical angle wraps into (-pi, pi]
    assert np.isclose(angles.canonical_angle(3 * math.pi), math.pi) or \
           np.isclose(angles.canonical_angle(3 * math.pi), -math.pi)
    assert np.isclose(angles.canonical_angle(0.1), 0.1)
    # view heading/elevation formulas (ref: base.py:332-333)
    assert np.isclose(float(angles.view_heading(13)), math.pi / 6)
    assert np.isclose(float(angles.view_elevation(13)), 0.0)
    assert np.isclose(float(angles.view_elevation(25)), math.pi / 6)
    # make_angle_feat block layout parity between np and jnp versions
    ref = angles.make_angle_feat_np(0.7, -0.2)
    import jax.numpy as jnp
    got = np.asarray(angles.make_angle_feat(jnp.asarray(0.7), jnp.asarray(-0.2)))
    assert np.allclose(got, ref, atol=1e-6)


def test_step_timer():
    t = StepTimer()
    with t.time("phase_a"):
        time.sleep(0.01)
    t.start("phase_b")
    time.sleep(0.005)
    t.stop("phase_b")
    s = t.summary()
    assert s["phase_a"]["count"] == 1
    assert s["phase_a"]["mean_ms"] >= 9
    assert s["phase_b"]["total_s"] > 0
    t.reset()
    assert t.summary() == {}


def test_format_score_table():
    table = format_score_table({"val_seen": {
        "lengths": 10.5, "nav_error": 3.2, "success_rate": 0.51,
        "oracle_rate": 0.6, "spl": 0.47, "ndtw": 0.55, "sdtw": 0.42, "cls": 0.5,
    }})
    assert "val_seen" in table and "0.5100" in table and "SR" in table


def test_trainer_profile_dir_captures_trace(synth_world, synth_dataset, tokenizer, tmp_path):
    """TPU.PROFILE_DIR wraps epoch 2 in a jax.profiler trace via the
    production trainer."""
    import os

    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.engine import ClassicTrainer
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    data = expand_r2r_items(synth_dataset, tokenizer)
    train = R2RBatchEnv(synth_world, data, batch_size=6, tokenizer=tokenizer, seed=1)
    valid = {"val_seen": R2RBatchEnv(synth_world, data[:18], batch_size=6,
                                     tokenizer=tokenizer, seed=2)}
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "FOLLOWER"
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
    cfg.DATA.MAX_ENC_LEN = 24
    cfg.AGENT.MAX_EPISODE_LEN = 6
    cfg.AGENT.FEEDBACK = "teacher"
    cfg.TRAIN.OPTIM = "sgd"
    cfg.TRAIN.BATCH_SIZE = 6
    cfg.TRAIN.MAX_EPOCH = 2
    cfg.TRAIN.EVAL_INTERVAL = 5
    cfg.OUTPUT.CKPT_DIR = str(tmp_path / "ckpt")
    cfg.TPU.PROFILE_DIR = str(tmp_path / "trace")

    ClassicTrainer().train(cfg, build_agent(cfg, tokenizer.vocab_size(), 64),
                           None, train, valid, seed=0, max_iters_override=2)
    found = []
    for root, _, files in os.walk(cfg.TPU.PROFILE_DIR):
        found += [f for f in files if f.endswith((".trace.json.gz", ".xplane.pb"))]
    assert found, "no profiler trace artifacts written"
