"""Curriculum engines: naive round schedule and SPCL weight solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import build_agent
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine import (NaiveCurriculum, SelfPacedCurriculum,
                                                    spcl_update_lambda, spcl_update_weight)
from curriculum_learning_for_vln_tpu.env.host_env import CLR2RBatchEnv, R2RBatchEnv
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def test_naive_round_schedule():
    nc = NaiveCurriculum(switch_epoch=20)
    env = {f"round_{k}": f"E{k}" for k in range(1, 6)}
    # (ref: curriculum.py:176-179) — switches at 21/41/61/81, capped at 5
    assert nc.select_env(env, 1) == "E1"
    assert nc.select_env(env, 20) == "E1"
    assert nc.select_env(env, 21) == "E2"
    assert nc.select_env(env, 80) == "E4"
    assert nc.select_env(env, 81) == "E5"
    assert nc.select_env(env, 500) == "E5"


def reference_update_epoch(weight, a, c, lamb, loss, pace_func):
    """Literal numpy transcription of the reference solver semantics
    (curriculum.py:428-448) for golden comparison."""
    weight = weight.copy()
    zeta = 1 - lamb
    mask = loss >= lamb
    weight[mask] = 0.01
    if pace_func == "log":
        weight[~mask] = np.log(loss[~mask] + zeta) / np.log(zeta)
    elif pace_func == "linear":
        weight[~mask] = 1 - loss[~mask] / lamb
    elif pace_func == "binary":
        weight[~mask] = 1.0
    weight[weight < 0.01] = 0.01
    if np.dot(a, weight) > c:
        a_norm = np.linalg.norm(a)
        new_weight = weight + a * (c - np.dot(a, weight)) / (a_norm * a_norm)
        new_weight[new_weight <= 0.0] = 0.001
        weight = new_weight
    return weight


@pytest.mark.parametrize("pace_func", ["linear", "binary", "log"])
def test_spcl_weight_solver_golden(pace_func, rng):
    N = 64
    a = rng.integers(1, 6, N).astype(np.float32)
    # c small enough to force the projection branch
    c = float(a.sum()) * 0.4
    # the log pace function needs zeta = 1 - lambda > 0 and loss + zeta > 0
    lamb = 0.5 if pace_func == "log" else 2.0
    loss = rng.uniform(0.1, 4.0, N).astype(np.float32)
    w0 = rng.uniform(0.2, 1.0, N).astype(np.float32)

    expected = reference_update_epoch(w0, a, c, lamb, loss, pace_func)
    got = spcl_update_weight(jnp.asarray(w0), jnp.asarray(a), jnp.asarray(c),
                             jnp.asarray(lamb), jnp.asarray(loss), pace_func=pace_func)
    assert np.allclose(np.asarray(got), expected, atol=1e-5)

    # no-projection branch
    c_big = float(a.sum()) * 10.0
    expected = reference_update_epoch(w0, a, c_big, lamb, loss, pace_func)
    got = spcl_update_weight(jnp.asarray(w0), jnp.asarray(a), jnp.asarray(c_big),
                             jnp.asarray(lamb), jnp.asarray(loss), pace_func=pace_func)
    assert np.allclose(np.asarray(got), expected, atol=1e-5)


def test_spcl_lambda_update():
    assert float(spcl_update_lambda(jnp.asarray(1.0), 2.0, jnp.asarray(5.0))) == 3.0
    assert float(spcl_update_lambda(jnp.asarray(6.0), 2.0, jnp.asarray(5.0))) == 7.0


@pytest.fixture(scope="module")
def cl_env(synth_world, synth_graphs, tokenizer):
    """Synthetic 5-round curriculum dataset."""
    from curriculum_learning_for_vln_tpu.world import synthetic

    rounds = {}
    for k in range(1, 6):
        items = synthetic.make_r2r_dataset(
            synth_graphs, num_paths=6, seed=100 + k, path_id_base=1000 * k)
        rounds[f"round_{k}"] = expand_r2r_items(items, tokenizer)
    return CLR2RBatchEnv(synth_world, rounds, batch_size=6, c_rate=1.0,
                         tokenizer=tokenizer, seed=4)


def test_clr2r_env_bookkeeping(cl_env):
    # a[i] = round number, global index order matches concatenation order
    assert cl_env.a.min() == 1 and cl_env.a.max() == 5
    assert cl_env.c == pytest.approx(cl_env.a.sum())
    batch = cl_env.next_batch()
    idx = cl_env.cur_batch_index
    assert len(idx) == 6
    for b, i in enumerate(idx):
        assert cl_env.data[i]["instr_id"] is not None


def test_spcl_training_runs(cl_env, synth_world, tokenizer, tmp_path):
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "FOLLOWER"
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
    cfg.MODEL.FOLLOWER.ENC_LAYERS = 1
    cfg.DATA.MAX_ENC_LEN = 24
    cfg.AGENT.MAX_EPISODE_LEN = 8
    cfg.AGENT.FEEDBACK = "teacher"
    cfg.TRAIN.OPTIM = "adam"
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.MAX_EPOCH = 2
    cfg.TRAIN.EVAL_INTERVAL = 10
    cfg.OUTPUT.CKPT_DIR = str(tmp_path / "ckpt")

    data = cl_env.data
    valid = {"val_seen": R2RBatchEnv(synth_world, data[:12], batch_size=6, tokenizer=tokenizer, seed=2)}
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    spcl = SelfPacedCurriculum(cl_env, pace_func="linear", init_lamb=2.0,
                               init_weight_ctrl=0.5, miu=1.0, interval=1,
                               strategy="epoch", burn_in=0)
    w_before = np.asarray(spcl.weight).copy()
    # rounds <= 2 start at 1.0, others at WCTRL (ref: curriculum.py:214-220)
    assert np.all(w_before[cl_env.a <= 2] == 1.0)
    assert np.all(w_before[cl_env.a > 2] == 0.5)

    params, mstate, _ = spcl.train(cfg, agent, None, cl_env, valid,
                                   seed=0, max_iters_override=4)
    w_after = np.asarray(spcl.weight)
    assert not np.allclose(w_before, w_after)  # solver ran
    assert float(spcl.lamb) > 2.0             # lambda advanced


# ---------------------------------------------------------------------------
# Exp3.S automated curriculum (the reference only reserves the config keys)
# ---------------------------------------------------------------------------

def test_exp3s_prefers_rewarding_arm():
    from curriculum_learning_for_vln_tpu.engine import Exp3S

    bandit = Exp3S(n_arms=3, eta=0.3, eps=0.05, alpha=0.001, rrsize=50, seed=0)
    for _ in range(200):
        arm = bandit.sample()
        reward = 1.0 if arm == 1 else -1.0
        bandit.update(arm, reward)
    pi = bandit.pi
    assert pi[1] > 0.6, pi
    assert abs(pi.sum() - 1.0) < 1e-6
    # exploration floor from eps
    assert pi.min() >= 0.05 / 3 - 1e-9


def test_auto_curriculum_trains(synth_world, synth_dataset, tokenizer, tmp_path):
    """AutoCurriculum drives ClassicTrainer per-iteration round sampling
    end to end and the bandit actually receives rewards."""
    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.engine import AutoCurriculum
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    data = expand_r2r_items(synth_dataset, tokenizer)
    per = max(1, len(data) // 5)
    train_env = {
        f"round_{k}": R2RBatchEnv(synth_world, data[(k - 1) * per: k * per + 6],
                                  batch_size=6, tokenizer=tokenizer, seed=k)
        for k in range(1, 6)
    }
    valid_env = {"val_seen": R2RBatchEnv(synth_world, data[:18], batch_size=6,
                                         tokenizer=tokenizer, seed=9)}
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "FOLLOWER"
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
    cfg.DATA.MAX_ENC_LEN = 24
    cfg.AGENT.MAX_EPISODE_LEN = 6
    cfg.AGENT.FEEDBACK = "teacher"
    cfg.TRAIN.OPTIM = "adam"
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.BATCH_SIZE = 6
    cfg.TRAIN.MAX_EPOCH = 2
    cfg.TRAIN.EVAL_INTERVAL = 5
    cfg.OUTPUT.CKPT_DIR = str(tmp_path / "ckpt")

    trainer = AutoCurriculum(eta=0.2, eps=0.1, seed=0)
    params, _, _ = trainer.train(cfg, build_agent(cfg, tokenizer.vocab_size(), 64),
                                 None, train_env, valid_env, seed=0,
                                 max_iters_override=6)
    assert trainer.bandit is not None
    # every reward from epoch 1+2 consumed (arms list drained)
    assert trainer._arms == []
    # bandit history populated by loss-decrease rewards
    assert len(trainer.bandit.history) > 0
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(params))


def test_auto_curriculum_resume_restores_bandit(synth_world, synth_dataset, tokenizer, tmp_path):
    """AutoCurriculum bandit state (weights, reward history, per-arm loss)
    rides the checkpoint and survives OUTPUT.RESUME=latest."""
    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.engine import AutoCurriculum
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    data = expand_r2r_items(synth_dataset, tokenizer)
    per = max(1, len(data) // 5)
    mk_envs = lambda: ({
        f"round_{k}": R2RBatchEnv(synth_world, data[(k - 1) * per: k * per + 6],
                                  batch_size=6, tokenizer=tokenizer, seed=k)
        for k in range(1, 6)
    }, {"val_seen": R2RBatchEnv(synth_world, data[:18], batch_size=6,
                                tokenizer=tokenizer, seed=9)})

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "FOLLOWER"
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
    cfg.DATA.MAX_ENC_LEN = 24
    cfg.AGENT.MAX_EPISODE_LEN = 6
    cfg.AGENT.FEEDBACK = "teacher"
    cfg.TRAIN.OPTIM = "adam"
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.BATCH_SIZE = 6
    cfg.TRAIN.MAX_EPOCH = 2
    cfg.TRAIN.EVAL_INTERVAL = 10
    cfg.OUTPUT.CKPT_DIR = str(tmp_path / "ckpt")

    t1 = AutoCurriculum(eta=0.2, eps=0.1, seed=0)
    train_env, valid_env = mk_envs()
    t1.train(cfg, build_agent(cfg, tokenizer.vocab_size(), 64), None,
             train_env, valid_env, seed=0, max_iters_override=6)
    saved_w = np.asarray(t1.bandit.log_w).copy()
    saved_hist = len(t1.bandit.history)
    assert saved_hist > 0

    cfg2 = cfg.clone()
    cfg2.TRAIN.MAX_EPOCH = 3
    cfg2.OUTPUT.RESUME = "latest"
    t2 = AutoCurriculum(eta=0.2, eps=0.1, seed=0)
    train_env2, valid_env2 = mk_envs()
    t2.train(cfg2, build_agent(cfg2, tokenizer.vocab_size(), 64), None,
             train_env2, valid_env2, seed=0, max_iters_override=6)
    # the resumed run continued FROM the saved bandit (history grew past it)
    assert len(t2.bandit.history) > saved_hist
