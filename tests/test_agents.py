"""Agent rollouts: compile, act, produce sane losses and trajectories."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import (
    FEEDBACK_ARGMAX, FEEDBACK_SAMPLE, FEEDBACK_TEACHER,
    EnvDropAgent, FollowerAgent, SelfMonitorAgent, TestAgent,
    assemble_trajectories,
)
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine.evaluator import Evaluation
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults


FEAT_DIM = 64


def make_cfg():
    cfg = get_cfg_defaults()
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
    cfg.MODEL.FOLLOWER.ENC_BIDIRECTION = True
    cfg.MODEL.FOLLOWER.ENC_LAYERS = 2
    cfg.MODEL.MONITOR.WORD_EMB_SIZE = 32
    cfg.MODEL.MONITOR.HIDDEN_SIZE = 64
    cfg.MODEL.MONITOR.ENC_BIDIRECTION = False
    cfg.MODEL.MONITOR.ENC_LAYERS = 1
    cfg.MODEL.MONITOR.MLP_HIDDEN = (32,)
    cfg.MODEL.ENVDROP.WORD_EMB_SIZE = 32
    cfg.MODEL.ENVDROP.ACT_EMB_SIZE = 16
    cfg.MODEL.ENVDROP.HIDDEN_SIZE = 64
    cfg.MODEL.ENVDROP.ENC_BIDIRECTION = True
    cfg.MODEL.ENVDROP.ENC_LAYERS = 1
    cfg.MODEL.ENVDROP.ML_WEIGHT = 0.2
    cfg.MODEL.ENVDROP.GAMMA = 0.9
    cfg.MODEL.ENVDROP.RL_NORMALIZE = "total"
    cfg.DATA.MAX_ENC_LEN = 24
    cfg.AGENT.MAX_EPISODE_LEN = 8
    return cfg


@pytest.fixture(scope="module")
def ctx(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=6, tokenizer=tokenizer, seed=5)
    return synth_world, henv, synth_world.device_tables(), data, tokenizer


def test_test_agent_sr_one(ctx, synth_dataset):
    """check_the_code rebuild: teacher-following scores SR = 1.0."""
    world, henv, tables, data, tok = ctx
    agent = TestAgent(episode_len=10)
    results = []
    for ep in henv.eval_batches():
        _, result, _ = agent.rollout({}, {}, tables, ep, jax.random.PRNGKey(0))
        results += assemble_trajectories(world, ep, result, data)
    ev = Evaluation(world, synth_dataset)
    summary, _ = ev.score(results)
    assert summary["success_rate"] == 1.0
    assert summary["nav_error"] == 0.0
    assert summary["spl"] > 0.99
    assert summary["ndtw"] > 0.99


@pytest.mark.parametrize("feedback", [FEEDBACK_TEACHER, FEEDBACK_ARGMAX, FEEDBACK_SAMPLE])
def test_follower_rollout(ctx, tokenizer, feedback):
    world, henv, tables, data, tok = ctx
    cfg = make_cfg()
    agent = FollowerAgent(cfg.MODEL.FOLLOWER, tok.vocab_size(), FEAT_DIM, episode_len=8)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    losses, result, _ = agent.rollout(params, mstate, tables, ep, jax.random.PRNGKey(1),
                                      feedback=feedback, train=True)
    assert np.isfinite(float(losses.ml_loss))
    assert float(losses.ml_loss) > 0
    assert losses.ml_loss_per_sample.shape == (6,)
    assert np.all(np.isfinite(np.asarray(losses.ml_loss_per_sample)))
    if feedback == FEEDBACK_TEACHER:
        # teacher-forced agents end at the goal
        assert np.array_equal(np.asarray(result.final_state.node), np.asarray(ep.goal))


def test_follower_gradients_flow(ctx, tokenizer):
    world, henv, tables, data, tok = ctx
    cfg = make_cfg()
    agent = FollowerAgent(cfg.MODEL.FOLLOWER, tok.vocab_size(), FEAT_DIM, episode_len=6)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()

    def loss(p):
        losses, _, _ = agent.rollout(p, mstate, tables, ep, jax.random.PRNGKey(1),
                                     feedback=FEEDBACK_TEACHER, train=True)
        return losses.ml_loss

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0
    assert np.isfinite(gnorm)


def test_monitor_rollout_and_progress_loss(ctx, tokenizer):
    world, henv, tables, data, tok = ctx
    cfg = make_cfg()
    agent = SelfMonitorAgent(cfg.MODEL.MONITOR, cfg.DATA.MAX_ENC_LEN, tok.vocab_size(),
                             FEAT_DIM, episode_len=8)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    losses, result, new_mstate = agent.rollout(
        params, mstate, tables, ep, jax.random.PRNGKey(1),
        feedback=FEEDBACK_TEACHER, train=True, lamb=0.5)
    assert np.isfinite(float(losses.ml_loss)) and float(losses.ml_loss) > 0
    assert np.isfinite(float(losses.progress_loss))
    # BN stats advanced during training rollout
    old_count = float(mstate["decoder_bn"]["mlp"]["bn_in"]["count"])
    new_count = float(new_mstate["decoder_bn"]["mlp"]["bn_in"]["count"])
    assert new_count > old_count


def test_envdrop_il_rl(ctx, tokenizer):
    world, henv, tables, data, tok = ctx
    cfg = make_cfg()
    agent = EnvDropAgent(cfg.MODEL.ENVDROP, cfg.DATA.MAX_ENC_LEN, tok.vocab_size(),
                         FEAT_DIM, episode_len=8)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()

    # IL phase (teacher)
    il, result, _ = agent.rollout(params, mstate, tables, ep, jax.random.PRNGKey(1),
                                  feedback=FEEDBACK_TEACHER, train=True,
                                  train_ml=True, train_rl=False)
    assert float(il.ml_loss) > 0 and float(il.rl_loss) == 0

    # RL phase (sample, same episodes via restart)
    ep2 = henv.next_batch(restart=True)
    rl, result2, _ = agent.rollout(params, mstate, tables, ep2, jax.random.PRNGKey(2),
                                   feedback=FEEDBACK_SAMPLE, train=True,
                                   train_ml=False, train_rl=True)
    assert np.isfinite(float(rl.rl_loss))
    assert float(rl.total_actions) > 0
    assert float(rl.entropy_sum) > 0

    # combined gradient flows through encoder, decoder and critic
    def loss(p):
        il, _, _ = agent.rollout(p, mstate, tables, ep, jax.random.PRNGKey(1),
                                 feedback=FEEDBACK_TEACHER, train=True,
                                 train_ml=True, train_rl=False)
        rl, _, _ = agent.rollout(p, mstate, tables, ep2, jax.random.PRNGKey(2),
                                 feedback=FEEDBACK_SAMPLE, train=True,
                                 train_ml=False, train_rl=True)
        return il.ml_loss + rl.rl_loss

    grads = jax.grad(loss)(params)
    for part in ["encoder", "decoder", "critic"]:
        gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads[part]))
        assert gnorm > 0, part


def test_rl_skipped_for_non_sample_feedback(ctx, tokenizer):
    world, henv, tables, data, tok = ctx
    cfg = make_cfg()
    agent = EnvDropAgent(cfg.MODEL.ENVDROP, cfg.DATA.MAX_ENC_LEN, tok.vocab_size(),
                         FEAT_DIM, episode_len=6)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    # ref envdrop.py:100 — feedback != sample forces train_rl off
    losses, _, _ = agent.rollout(params, mstate, tables, ep, jax.random.PRNGKey(1),
                                 feedback=FEEDBACK_ARGMAX, train=True,
                                 train_ml=True, train_rl=True)
    assert float(losses.rl_loss) == 0.0
