"""Hand-written rollout BPTT (ops/bptt.py) vs autodiff: forward bitwise,
gradients to tolerance, across feedback modes and feature options."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import (FEEDBACK_SAMPLE,
                                                    FEEDBACK_TEACHER,
                                                    EnvDropAgent)
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.models.core import dropout_mask
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def make_agent(tok, episode_len=8, drop=0.5, fdrop=0.3):
    cfg = get_cfg_defaults()
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE = 32
    m.ACT_EMB_SIZE = 16
    m.HIDDEN_SIZE = 64
    m.ENC_BIDIRECTION = True
    m.ENC_LAYERS = 1
    m.ML_WEIGHT = 0.2
    m.GAMMA = 0.9
    m.RL_NORMALIZE = "total"
    m.DROP_RATE = drop
    m.FEAT_DROP_RATE = fdrop
    agent = EnvDropAgent(m, max_enc_len=24, vocab_size=tok.vocab_size(),
                         feat_dim=FEAT_DIM, episode_len=episode_len)
    return agent


@pytest.fixture(scope="module")
def ctx(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=6, tokenizer=tokenizer, seed=7)
    return synth_world.device_tables(), henv


def _rollout_losses(agent, params, tables, ep, rng, fused, **kw):
    agent.use_fused_bptt = fused
    losses, result, _ = agent.rollout(params, {}, tables, ep, rng, train=True, **kw)
    return losses, result


@pytest.mark.parametrize("feedback,train_rl", [
    (FEEDBACK_TEACHER, False),
    (FEEDBACK_SAMPLE, True),
])
def test_forward_bitwise(ctx, tokenizer, feedback, train_rl):
    tables, henv = ctx
    agent = make_agent(tokenizer)
    params, _ = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(3)
    kw = dict(feedback=feedback, train_ml=not train_rl, train_rl=train_rl)
    l0, r0 = _rollout_losses(agent, params, tables, ep, rng, fused=False, **kw)
    l1, r1 = _rollout_losses(agent, params, tables, ep, rng, fused=True, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(l0), jax.tree_util.tree_leaves(l1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(r0.steps), jax.tree_util.tree_leaves(r1.steps)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(r0.final_state), jax.tree_util.tree_leaves(r1.final_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _grad_fn(agent, tables, ep, rng, fused, weights=None, **kw):
    def loss_fn(p):
        agent.use_fused_bptt = fused
        losses, _, _ = agent.rollout(p, {}, tables, ep, rng, train=True, **kw)
        return agent.loss_fn(losses, weights)

    return jax.value_and_grad(loss_fn)


def _assert_grads_close(g0, g1, rtol=2e-4, atol=2e-5):
    flat0, tree0 = jax.tree_util.tree_flatten(g0)
    flat1, tree1 = jax.tree_util.tree_flatten(g1)
    assert tree0 == tree1
    paths = [jax.tree_util.keystr(kp)
             for kp, _ in jax.tree_util.tree_flatten_with_path(g0)[0]]
    for path, a, b in zip(paths, flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol,
                                   atol=atol, err_msg=path)


@pytest.mark.parametrize("feedback,train_rl,drop,fdrop", [
    (FEEDBACK_TEACHER, False, 0.0, 0.0),
    (FEEDBACK_TEACHER, False, 0.5, 0.3),
    (FEEDBACK_SAMPLE, True, 0.0, 0.0),
    (FEEDBACK_SAMPLE, True, 0.5, 0.3),
])
def test_grad_parity(ctx, tokenizer, feedback, train_rl, drop, fdrop):
    """Gradients (decoder, encoder-via-ctx/h0/c0, critic) match autodiff."""
    tables, henv = ctx
    agent = make_agent(tokenizer, drop=drop, fdrop=fdrop)
    params, _ = agent.init(jax.random.PRNGKey(1))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(4)
    kw = dict(feedback=feedback, train_ml=not train_rl, train_rl=train_rl)
    v0, g0 = _grad_fn(agent, tables, ep, rng, False, **kw)(params)
    v1, g1 = _grad_fn(agent, tables, ep, rng, True, **kw)(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    _assert_grads_close(g0, g1)


def test_grad_parity_avoid_cyclic(ctx, tokenizer):
    tables, henv = ctx
    agent = make_agent(tokenizer)
    params, _ = agent.init(jax.random.PRNGKey(2))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(5)
    kw = dict(feedback=FEEDBACK_SAMPLE, train_ml=False, train_rl=True,
              avoid_cyclic=True)
    _, g0 = _grad_fn(agent, tables, ep, rng, False, **kw)(params)
    _, g1 = _grad_fn(agent, tables, ep, rng, True, **kw)(params)
    _assert_grads_close(g0, g1)


def test_grad_parity_feat_mask(ctx, tokenizer):
    """Back-translation shared-noise path (already_dropfeat)."""
    tables, henv = ctx
    agent = make_agent(tokenizer)
    params, _ = agent.init(jax.random.PRNGKey(3))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(6)
    fm = dropout_mask(jax.random.PRNGKey(9), (FEAT_DIM,), 0.4)
    kw = dict(feedback=FEEDBACK_TEACHER, train_ml=True, train_rl=False,
              feat_mask=fm)
    _, g0 = _grad_fn(agent, tables, ep, rng, False, **kw)(params)
    _, g1 = _grad_fn(agent, tables, ep, rng, True, **kw)(params)
    _assert_grads_close(g0, g1)


def test_grad_parity_spcl_weights_and_bucketed_len(ctx, tokenizer):
    """SPCL per-sample weighted loss through a bucketed (shorter) IL scan."""
    tables, henv = ctx
    agent = make_agent(tokenizer)
    params, _ = agent.init(jax.random.PRNGKey(4))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(7)
    w = jnp.linspace(0.1, 1.0, 6)
    kw = dict(feedback=FEEDBACK_TEACHER, train_ml=True, train_rl=False,
              episode_len=4)
    _, g0 = _grad_fn(agent, tables, ep, rng, False, weights=w, **kw)(params)
    _, g1 = _grad_fn(agent, tables, ep, rng, True, weights=w, **kw)(params)
    _assert_grads_close(g0, g1)


def test_bf16_compute_dtype_runs(ctx, tokenizer):
    """The bf16 compute path compiles and yields finite matching-loss grads
    (CPU still runs the same code; bitwise parity is f32-only)."""
    tables, henv = ctx
    agent = make_agent(tokenizer)
    agent.compute_dtype = jnp.bfloat16
    params, _ = agent.init(jax.random.PRNGKey(5))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(8)
    kw = dict(feedback=FEEDBACK_SAMPLE, train_ml=False, train_rl=True)
    v1, g1 = _grad_fn(agent, tables, ep, rng, True, **kw)(params)
    assert np.isfinite(float(v1))
    for leaf in jax.tree_util.tree_leaves(g1):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
