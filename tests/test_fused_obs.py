"""Fused observation op (ops/fused_obs.py + ops/pallas/pano_fused.py):
op-level parity vs the plain formulation, and agent-level loss/grad parity
with the kernels active (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import (FEEDBACK_SAMPLE,
                                                    FEEDBACK_TEACHER,
                                                    EnvDropAgent)
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.ops import fused_obs
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def make_agent(tok, episode_len=6):
    cfg = get_cfg_defaults()
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE = 32
    m.ACT_EMB_SIZE = 16
    m.HIDDEN_SIZE = 64
    m.ENC_BIDIRECTION = False
    m.ENC_LAYERS = 1
    m.ML_WEIGHT = 0.2
    m.GAMMA = 0.9
    m.RL_NORMALIZE = "total"
    return EnvDropAgent(m, max_enc_len=24, vocab_size=tok.vocab_size(),
                        feat_dim=FEAT_DIM, episode_len=episode_len)


@pytest.fixture(scope="module")
def ctx(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=6, tokenizer=tokenizer, seed=11)
    return synth_world.device_tables(), henv


def test_op_pallas_matches_xla_impl(ctx):
    """Direct op check: pallas (interpret) vs plain formulation, fwd + vjp."""
    tables, henv = ctx
    B, MC = 6, tables.cand_view.shape[1]
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    node = jax.random.randint(k[0], (B,), 0, tables.features.shape[0])
    view = jax.random.randint(k[1], (B,), 0, 36)
    c_view = jax.random.randint(k[2], (B, MC), 0, 36)
    tv = jax.random.normal(k[3], (B, FEAT_DIM + 128))
    key = jax.random.PRNGKey(7)
    cfg = (0.3, True)

    def run(t):
        return fused_obs.pano_attend_cands(cfg, node, view, c_view,
                                           tables.features, tables.loc_embed,
                                           t, key)

    fused_obs.set_backend("xla")
    try:
        vis_x, cand_x = run(tv)
        _, vjp_x = jax.vjp(lambda t: run(t)[0], tv)
        (dtv_x,) = vjp_x(jnp.ones_like(vis_x))
        fused_obs.set_backend("pallas")
        vis_p, cand_p = run(tv)
        _, vjp_p = jax.vjp(lambda t: run(t)[0], tv)
        (dtv_p,) = vjp_p(jnp.ones_like(vis_p))
    finally:
        fused_obs.set_backend("xla")

    np.testing.assert_allclose(np.asarray(vis_p), np.asarray(vis_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(cand_p), np.asarray(cand_x))
    np.testing.assert_allclose(np.asarray(dtv_p), np.asarray(dtv_x), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("feedback,train_rl", [
    (FEEDBACK_TEACHER, False),
    (FEEDBACK_SAMPLE, True),
])
def test_agent_parity_with_fused_obs(ctx, tokenizer, feedback, train_rl):
    """Full EnvDrop rollout loss + grads with the fused-observation kernels
    (interpret) match the standard path to tolerance."""
    tables, henv = ctx
    agent = make_agent(tokenizer)
    params, _ = agent.init(jax.random.PRNGKey(1))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(4)
    kw = dict(feedback=feedback, train_ml=not train_rl, train_rl=train_rl)

    def loss_fn(p):
        losses, _, _ = agent.rollout(p, {}, tables, ep, rng, train=True, **kw)
        return agent.loss_fn(losses)

    fused_obs.set_backend("xla")
    v0, g0 = jax.value_and_grad(loss_fn)(params)
    try:
        fused_obs.set_backend("pallas")
        v1, g1 = jax.value_and_grad(loss_fn)(params)
    finally:
        fused_obs.set_backend("xla")

    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_leaves(g1)
    for (kp, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(kp))


def test_fused_obs_eval_rollout_matches(ctx, tokenizer):
    """Argmax eval rollout trajectories are identical (no dropout — the
    kernel and XLA agree to numerical tolerance; actions are discrete so
    trajectories should match exactly on this world)."""
    tables, henv = ctx
    agent = make_agent(tokenizer)
    params, _ = agent.init(jax.random.PRNGKey(2))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(5)

    from curriculum_learning_for_vln_tpu.agents import FEEDBACK_ARGMAX
    fused_obs.set_backend("xla")
    _, r0, _ = agent.rollout(params, {}, tables, ep, rng, feedback=FEEDBACK_ARGMAX,
                             train=False, train_ml=True, train_rl=False)
    try:
        fused_obs.set_backend("pallas")
        _, r1, _ = agent.rollout(params, {}, tables, ep, rng, feedback=FEEDBACK_ARGMAX,
                                 train=False, train_ml=True, train_rl=False)
    finally:
        fused_obs.set_backend("xla")
    np.testing.assert_array_equal(np.asarray(r0.steps.action), np.asarray(r1.steps.action))
    np.testing.assert_array_equal(np.asarray(r0.steps.node_after), np.asarray(r1.steps.node_after))


def test_prng_mask_mode_interpret(ctx):
    """In-kernel PRNG mask mode ("pallas_prng"): the TPU interpreter stubs
    prng bits to zero => all-keep mask, so the exact reference is the
    /keep-scaled plain formulation; checks fwd, alpha, and the backward
    kernel's d_tv against jax.vjp of that reference."""
    import jax

    from curriculum_learning_for_vln_tpu.ops.pallas.pano_fused import (
        pano_attend_bwd_pallas, pano_attend_fwd_pallas)

    tables, henv = ctx
    feats, loc = tables.features, tables.loc_embed
    B, MC = 6, tables.cand_view.shape[1]
    V, D = loc.shape[1], feats.shape[-1]
    k = jax.random.split(jax.random.PRNGKey(3), 6)
    nodes = jax.random.randint(k[0], (B,), 0, feats.shape[0])
    views = jax.random.randint(k[1], (B,), 0, V)
    c_view = jax.random.randint(k[2], (B, MC), 0, V)
    tv = jax.random.normal(k[3], (B, D + loc.shape[-1]))
    seeds = jnp.arange(B, dtype=jnp.int32) * 7919 + 13
    keep = 0.7

    def ref(t):
        f = feats[nodes][:, :V]
        img = (f / keep).astype(f.dtype)
        pano = jnp.concatenate([img, loc[views]], -1).astype(jnp.float32)
        s = jnp.einsum("bvd,bd->bv", pano, t)
        a = jax.nn.softmax(s, -1)
        return jnp.einsum("bv,bvd->bd", a, pano), a

    def fwd(t):
        oi, oa, al, cd = pano_attend_fwd_pallas(
            nodes, views, c_view, feats, loc, t[:, :D], t[:, D:],
            seeds=seeds, keep=keep, interpret=True)
        return jnp.concatenate([oi, oa], -1), al

    v1, a1 = fwd(tv)
    v2, _ = fwd(tv)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    vr, ar = ref(tv)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(vr), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(ar), rtol=2e-5, atol=2e-5)

    g = jax.random.normal(k[4], v1.shape)
    _, vjp = jax.vjp(lambda t: ref(t)[0], tv)
    (d_ref,) = vjp(g)
    di, da, _ = pano_attend_bwd_pallas(
        nodes, views, c_view, feats, loc, a1, g[:, :D], g[:, D:],
        seeds=seeds, keep=keep, interpret=True)
    d_tv = jnp.concatenate([di, da], -1)
    np.testing.assert_allclose(np.asarray(d_tv), np.asarray(d_ref),
                               rtol=2e-4, atol=2e-4)


def test_agent_prng_mode_runs(ctx, tokenizer):
    """Agent rollout with backend pallas_prng: finite loss/grads and
    deterministic across identical calls."""
    tables, henv = ctx
    agent = make_agent(tokenizer, episode_len=4)
    params, _ = agent.init(jax.random.PRNGKey(6))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(9)

    def loss_fn(p):
        losses, _, _ = agent.rollout(p, {}, tables, ep, rng, train=True,
                                     feedback=FEEDBACK_TEACHER,
                                     train_ml=True, train_rl=False)
        return agent.loss_fn(losses)

    try:
        fused_obs.set_backend("pallas_prng")
        v1, g1 = jax.value_and_grad(loss_fn)(params)
        v2, _ = jax.value_and_grad(loss_fn)(params)
    finally:
        fused_obs.set_backend("xla")
    assert np.isfinite(float(v1)) and float(v1) == float(v2)
    for leaf in jax.tree_util.tree_leaves(g1):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


def test_follower_parity_with_fused_obs(ctx, tokenizer):
    """Follower's projected visual attention reparameterizes onto the same
    kernel (associativity; b_v is softmax-invariant): loss + grads match
    the standard path to tolerance."""
    from curriculum_learning_for_vln_tpu.agents import FollowerAgent

    tables, henv = ctx
    cfg = get_cfg_defaults()
    m = cfg.MODEL.FOLLOWER
    m.WORD_EMB_SIZE = 32
    m.HIDDEN_SIZE = 64
    m.ENC_BIDIRECTION = True
    m.ENC_LAYERS = 1
    agent = FollowerAgent(m, tokenizer.vocab_size(), FEAT_DIM, episode_len=6)
    params, _ = agent.init(jax.random.PRNGKey(3))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(8)

    def loss_fn(p):
        losses, _, _ = agent.rollout(p, {}, tables, ep, rng, train=True,
                                     feedback=FEEDBACK_TEACHER)
        return agent.loss_fn(losses)

    fused_obs.set_backend("xla")
    v0, g0 = jax.value_and_grad(loss_fn)(params)
    try:
        fused_obs.set_backend("pallas")
        v1, g1 = jax.value_and_grad(loss_fn)(params)
    finally:
        fused_obs.set_backend("xla")

    np.testing.assert_allclose(float(v0), float(v1), rtol=2e-5)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_leaves(g1)
    for (kp, a), b in zip(flat0, flat1):
        path = jax.tree_util.keystr(kp)
        if "linear_in_v" in path and path.endswith("['b']"):
            # b_v only shifts every view's score equally -> softmax-invariant;
            # the fused path returns exactly zero where autodiff returns
            # float-epsilon noise
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-5, err_msg=path)


def test_monitor_parity_with_fused_obs(ctx, tokenizer):
    """Self-Monitor cands_only mode: candidate features come from the op
    (zero-query kernel call, static-zero backward) — loss + grads match."""
    from curriculum_learning_for_vln_tpu.agents import SelfMonitorAgent

    tables, henv = ctx
    cfg = get_cfg_defaults()
    m = cfg.MODEL.MONITOR
    m.WORD_EMB_SIZE = 32
    m.HIDDEN_SIZE = 64
    m.ENC_BIDIRECTION = False
    m.ENC_LAYERS = 1
    m.MLP_HIDDEN = (32,)
    agent = SelfMonitorAgent(m, max_enc_len=24, vocab_size=tokenizer.vocab_size(),
                             feat_dim=FEAT_DIM, episode_len=6)
    params, mstate = agent.init(jax.random.PRNGKey(4))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(9)

    def loss_fn(p):
        losses, _, _ = agent.rollout(p, mstate, tables, ep, rng, train=True,
                                     feedback=FEEDBACK_TEACHER)
        return agent.loss_fn(losses)

    fused_obs.set_backend("xla")
    v0, g0 = jax.value_and_grad(loss_fn)(params)
    try:
        fused_obs.set_backend("pallas")
        v1, g1 = jax.value_and_grad(loss_fn)(params)
    finally:
        fused_obs.set_backend("xla")

    np.testing.assert_allclose(float(v0), float(v1), rtol=2e-5)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_leaves(g1)
    for (kp, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-5, err_msg=jax.tree_util.keystr(kp))


def test_cand_score_op_matches_xla(ctx):
    """Fused candidate-scorer kernel (ops/pallas/cand_score.py): fwd + d_q
    parity vs the plain assemble+drop+einsum chain (ext-mask mode draws
    the same bits)."""
    tables, henv = ctx
    B, MC, D = 6, tables.cand_view.shape[1], FEAT_DIM
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    cand_img = jax.random.normal(ks[0], (B, MC, D))
    cand_angle = jax.random.normal(ks[1], (B, MC, 128))
    cand_valid = jax.random.bernoulli(ks[2], 0.7, (B, MC))
    q = jax.random.normal(ks[3], (B, D + 128))
    key = jax.random.PRNGKey(11)
    cfg = (0.3, True)

    def run(q_):
        return fused_obs.cand_attend_logits(cfg, cand_img, cand_angle,
                                            cand_valid, q_, key)

    fused_obs.set_backend("xla")
    try:
        out_x = run(q)
        _, vjp_x = jax.vjp(run, q)
        g = jax.random.normal(ks[4], out_x.shape)
        (dq_x,) = vjp_x(g)
        fused_obs.set_backend("pallas")
        out_p = run(q)
        _, vjp_p = jax.vjp(run, q)
        (dq_p,) = vjp_p(g)
    finally:
        fused_obs.set_backend("xla")

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_x),
                               rtol=2e-4, atol=2e-4)
    # STOP slot logit is exactly zero (zero feature row, base.py:149-157)
    assert np.all(np.asarray(out_p)[:, -1] == 0.0)


def test_cand_score_prng_fwd_bwd_consistent(ctx):
    """In prng mode the backward must regenerate the forward's exact mask:
    the op is linear in q, so <d_q, v> == <g, fwd(v)> for any v."""
    tables, henv = ctx
    B, MC, D = 6, tables.cand_view.shape[1], FEAT_DIM
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    cand_img = jax.random.normal(ks[0], (B, MC, D))
    cand_angle = jax.random.normal(ks[1], (B, MC, 128))
    cand_valid = jax.random.bernoulli(ks[2], 0.7, (B, MC))
    key = jax.random.PRNGKey(13)
    cfg = (0.4, True)

    fused_obs.set_backend("pallas_prng")
    try:
        run = lambda q_: fused_obs.cand_attend_logits(
            cfg, cand_img, cand_angle, cand_valid, q_, key)
        q = jax.random.normal(ks[3], (B, D + 128))
        v = jax.random.normal(ks[4], (B, D + 128))
        g = jax.random.normal(ks[5], (B, MC + 1))
        _, vjp = jax.vjp(run, q)
        (dq,) = vjp(g)
        lhs = float(jnp.sum(dq * v))
        rhs = float(jnp.sum(g * run(v)))
    finally:
        fused_obs.set_backend("xla")
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3)


def test_cand_score_prng_shared_mode(ctx):
    """pallas_prng_shared (one mask per kernel group — the reference's
    batch-shared back-translation realization): fwd/bwd mask consistency
    via the linearity identity."""
    tables, henv = ctx
    B, MC, D = 6, tables.cand_view.shape[1], FEAT_DIM
    ks = jax.random.split(jax.random.PRNGKey(8), 6)
    cand_img = jax.random.normal(ks[0], (B, MC, D))
    cand_angle = jax.random.normal(ks[1], (B, MC, 128))
    cand_valid = jax.random.bernoulli(ks[2], 0.7, (B, MC))
    key = jax.random.PRNGKey(17)

    fused_obs.set_backend("pallas_prng_shared")
    try:
        run = lambda q_: fused_obs.cand_attend_logits(
            (0.4, True), cand_img, cand_angle, cand_valid, q_, key)
        q = jax.random.normal(ks[3], (B, D + 128))
        v = jax.random.normal(ks[4], (B, D + 128))
        g = jax.random.normal(ks[5], (B, MC + 1))
        _, vjp = jax.vjp(run, q)
        (dq,) = vjp(g)
        np.testing.assert_allclose(float(jnp.sum(dq * v)),
                                   float(jnp.sum(g * run(v))), rtol=1e-3)
    finally:
        fused_obs.set_backend("xla")


def test_agent_prng_shared_mode_runs(ctx, tokenizer):
    """Full rollout fwd+bwd executes under pallas_prng_shared."""
    tables, henv = ctx
    agent = make_agent(tokenizer)
    params, _ = agent.init(jax.random.PRNGKey(1))
    ep = henv.next_batch()

    fused_obs.set_backend("pallas_prng_shared")
    try:
        def loss_fn(p):
            losses, _, _ = agent.rollout(p, {}, tables, ep, jax.random.PRNGKey(4),
                                         train=True, feedback=FEEDBACK_TEACHER,
                                         train_ml=True, train_rl=False)
            return agent.loss_fn(losses)

        v, g = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(v))
        assert all(np.all(np.isfinite(np.asarray(x)))
                   for x in jax.tree_util.tree_leaves(g))
    finally:
        fused_obs.set_backend("xla")
