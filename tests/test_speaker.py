"""Speaker: feature collection, teacher forcing, inference, back-translation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents.speaker import (
    Speaker, collect_shortest_path_features, generated_to_instr_tokens)
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults
from curriculum_learning_for_vln_tpu.utils.tokenizer import BOS_IDX, EOS_IDX, PAD_IDX

FEAT_DIM = 64
EP_LEN = 8


@pytest.fixture(scope="module")
def ctx(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=4, tokenizer=tokenizer, seed=9)
    return synth_world, synth_world.device_tables(), henv


def make_speaker(tok):
    cfg = get_cfg_defaults()
    s = cfg.AIDE.SPEAKER
    s.RNN_DIM = 64
    s.WEMB = 32
    s.MAX_DECODE = 20
    s.DROPOUT = 0.5
    s.FEAT_DROPOUT = 0.3
    s.BI_DIRECTION = True
    s.LR = 1e-3
    return Speaker(s, tok.vocab_size(), feat_dim=FEAT_DIM, episode_len=EP_LEN)


def test_collect_shortest_path_features(ctx):
    world, tables, henv = ctx
    ep = henv.next_batch()
    feats = collect_shortest_path_features(tables, ep, EP_LEN)
    B = 4
    assert feats.img_feats.shape == (B, EP_LEN, 36, FEAT_DIM + 128)
    assert feats.can_feats.shape == (B, EP_LEN, FEAT_DIM + 128)
    lengths = np.asarray(feats.lengths)
    assert np.all(lengths >= 1) and np.all(lengths <= EP_LEN)
    # after stop, can_feats are zero
    for b in range(B):
        assert np.allclose(np.asarray(feats.can_feats)[b, lengths[b]:], 0.0)
        # the stop step itself has zero can-feat (STOP feature)
        assert np.allclose(np.asarray(feats.can_feats)[b, lengths[b] - 1], 0.0)
        # move steps have non-zero can-feats
        if lengths[b] > 1:
            assert not np.allclose(np.asarray(feats.can_feats)[b, 0], 0.0)


def test_teacher_forcing_trains(ctx, tokenizer):
    world, tables, henv = ctx
    spk = make_speaker(tokenizer)
    params, opt_state = spk.init(jax.random.PRNGKey(0))
    params2, opt_state2, losses = spk.train_steps(
        params, opt_state, tables, henv, jax.random.PRNGKey(1), iters=12)
    assert all(np.isfinite(l) for l in losses)
    # learning signal despite dropout noise: late average below early average
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_per_word_loss_for_listener(ctx, tokenizer):
    world, tables, henv = ctx
    spk = make_speaker(tokenizer)
    params, _ = spk.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    feats = collect_shortest_path_features(tables, ep, EP_LEN)
    per_word = spk.teacher_forcing_loss(params, feats, ep.instr_tokens,
                                        jax.random.PRNGKey(1), train=False, for_listener=True)
    L = ep.instr_tokens.shape[1]
    assert per_word.shape == (4, L - 1)
    # padding positions contribute zero
    pads = np.asarray(ep.instr_tokens)[:, 1:] == PAD_IDX
    assert np.allclose(np.asarray(per_word)[pads], 0.0)


def test_infer_batch_and_backtranslate(ctx, tokenizer):
    world, tables, henv = ctx
    spk = make_speaker(tokenizer)
    params, _ = spk.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    words = np.asarray(spk.infer_batch(params, tables, ep, jax.random.PRNGKey(3)))
    assert words.shape == (4, 20)
    # post-EOS positions are PAD
    for b in range(4):
        eos = np.where(words[b] == EOS_IDX)[0]
        if len(eos):
            assert np.all(words[b, eos[0] + 1:] == PAD_IDX)
    # no UNK generated
    from curriculum_learning_for_vln_tpu.utils.tokenizer import UNK_IDX
    assert not np.any(words == UNK_IDX)

    new_ep, noise = spk.back_translate(params, tables, henv, ep,
                                       enc_len=24, rng=jax.random.PRNGKey(4),
                                       feat_dim=FEAT_DIM)
    toks = np.asarray(new_ep.instr_tokens)
    assert toks.shape == (4, 24)
    assert np.all(toks[:, 0] == BOS_IDX)
    lens = np.asarray(new_ep.instr_len)
    for b in range(4):
        assert toks[b, lens[b] - 1] == EOS_IDX
    assert noise.shape == (FEAT_DIM,)
    # same episodes, new instructions
    assert np.array_equal(np.asarray(new_ep.start_node), np.asarray(ep.start_node))


def test_generated_to_instr_tokens_edgecases():
    words = np.array([
        [5, 6, EOS_IDX, 9, 9],       # EOS mid-sequence: truncate after EOS
        [5, 6, 7, 8, 9],             # no EOS: forced terminal EOS
        [PAD_IDX, 0, 0, 0, 0],       # empty: BOS + EOS
    ])
    tokens, lengths = generated_to_instr_tokens(words, enc_len=6)
    assert tokens[0, :4].tolist() == [BOS_IDX, 5, 6, EOS_IDX] and lengths[0] == 4
    assert tokens[1].tolist()[:6] == [BOS_IDX, 5, 6, 7, 8, EOS_IDX] and lengths[1] == 6
    assert tokens[2, :2].tolist() == [BOS_IDX, EOS_IDX] and lengths[2] == 2


def test_envdrop_backtranslation_rollout(ctx, tokenizer):
    """Full self-train combination: fake instructions + shared noise mask
    into the EnvDrop rollout (ref: envdrop.py:105-121, 155-157)."""
    from curriculum_learning_for_vln_tpu.agents import EnvDropAgent
    from curriculum_learning_for_vln_tpu.agents.common import FEEDBACK_SAMPLE

    world, tables, henv = ctx
    spk = make_speaker(tokenizer)
    sparams, _ = spk.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    new_ep, noise = spk.back_translate(sparams, tables, henv, ep, enc_len=24,
                                       rng=jax.random.PRNGKey(1), feat_dim=FEAT_DIM)

    cfg = get_cfg_defaults()
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE = 32
    m.ACT_EMB_SIZE = 16
    m.HIDDEN_SIZE = 64
    m.ML_WEIGHT = 0.2
    m.GAMMA = 0.9
    m.RL_NORMALIZE = "total"
    agent = EnvDropAgent(m, max_enc_len=24, vocab_size=tokenizer.vocab_size(),
                         feat_dim=FEAT_DIM, episode_len=EP_LEN)
    params, mstate = agent.init(jax.random.PRNGKey(2))
    losses, result, _ = agent.rollout(params, mstate, tables, new_ep, jax.random.PRNGKey(3),
                                      feedback=FEEDBACK_SAMPLE, train=True,
                                      train_ml=True, train_rl=True, feat_mask=noise)
    assert np.isfinite(float(losses.ml_loss))
    assert np.isfinite(float(losses.rl_loss))


def test_get_insts_and_valid(ctx, tokenizer):
    world, tables, henv = ctx
    spk = make_speaker(tokenizer)
    params, _ = spk.init(jax.random.PRNGKey(0))
    path2inst, loss, word_accu, sent_accu = spk.valid(
        params, tables, henv, jax.random.PRNGKey(5), tokenizer=tokenizer, n_batches=2)
    # one instruction per path, shrunk of BOS/EOS
    assert len(path2inst) > 0
    for pid, inst in path2inst.items():
        assert EOS_IDX not in inst and PAD_IDX not in inst
    assert np.isfinite(loss) and loss > 0
    assert 0.0 <= word_accu <= 1.0 and 0.0 <= sent_accu <= 1.0


def test_speaker_encoder_pallas_backend_gradient_parity():
    """The speaker encoder now routes its (un-packed) LSTMs through
    ops.rnn.masked_lstm (VERDICT r3 item 7): under the pallas backend
    (interpret mode on CPU) outputs and gradients match the XLA scan;
    oversized first layers fall back via the VMEM guard."""
    from curriculum_learning_for_vln_tpu.models.speaker_model import (
        speaker_encoder_apply, speaker_encoder_init)
    from curriculum_learning_for_vln_tpu.ops import rnn as rnn_ops

    B, T, F = 2, 5, 32 + 16  # img 32 + angle 16
    key = jax.random.PRNGKey(0)
    p = speaker_encoder_init(key, F, 32, bidirectional=True)
    acts = jax.random.normal(jax.random.fold_in(key, 1), (B, T, F))
    feats = jax.random.normal(jax.random.fold_in(key, 2), (B, T, 36, F))

    def loss(pp):
        out = speaker_encoder_apply(pp, acts, feats, jax.random.PRNGKey(3),
                                    train=False, angle_feat_size=16)
        return jnp.sum(out ** 2)

    try:
        rnn_ops.set_backend("xla")
        l_x, g_x = jax.value_and_grad(loss)(p)
        rnn_ops.set_backend("pallas")
        l_p, g_p = jax.value_and_grad(loss)(p)
    finally:
        rnn_ops.set_backend("xla")
    assert np.allclose(l_x, l_p, rtol=1e-5, atol=1e-5)
    flat_x, _ = jax.tree_util.tree_flatten(g_x)
    flat_p, _ = jax.tree_util.tree_flatten(g_p)
    for a, b in zip(flat_x, flat_p):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5)

    # VMEM guard: a first layer too big for the fused kernel silently uses
    # the XLA path (same function, same numbers)
    assert not rnn_ops._fused_fits(
        np.zeros((1, 1, 2176)), np.zeros((2176, 2048), np.float32),
        np.zeros((512, 2048), np.float32))
    assert rnn_ops._fused_fits(
        np.zeros((1, 1, 64)), np.zeros((64, 128), np.float32),
        np.zeros((32, 128), np.float32))


def test_speaker_bf16_compute_parity(ctx, tokenizer):
    """compute_dtype=bfloat16 (the TPU production path since round 5:
    the f32 speaker step was bandwidth-bound on its [B,T,36,F] pano
    traffic) matches the f32 loss within bf16 tolerance, trains without
    touching the f32 masters' dtype, and back-translates valid tokens."""
    world, tables, henv = ctx
    cfg = get_cfg_defaults()
    s = cfg.AIDE.SPEAKER
    s.RNN_DIM, s.WEMB, s.MAX_DECODE, s.LR = 64, 32, 20, 1e-3
    spk32 = Speaker(s, tokenizer.vocab_size(), feat_dim=FEAT_DIM, episode_len=EP_LEN)
    spk16 = Speaker(s, tokenizer.vocab_size(), feat_dim=FEAT_DIM, episode_len=EP_LEN,
                    compute_dtype=jnp.bfloat16)
    params, opt_state = spk32.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()

    f32 = collect_shortest_path_features(tables, ep, EP_LEN)
    f16 = collect_shortest_path_features(tables, ep, EP_LEN, jnp.bfloat16)
    assert f16.img_feats.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(f32.lengths), np.asarray(f16.lengths))

    rng = jax.random.PRNGKey(3)
    l32 = float(spk32.teacher_forcing_loss(params, f32, ep.instr_tokens, rng, train=False))
    l16 = float(spk16.teacher_forcing_loss(params, f16, ep.instr_tokens, rng, train=False))
    assert l16 == pytest.approx(l32, rel=0.05), (l32, l16)

    # a bf16 train step leaves the f32 masters f32 and reduces the loss
    p2, o2, losses = spk16.train_steps(params, opt_state, tables, henv,
                                       jax.random.PRNGKey(4), iters=8)
    assert all(l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(p2)
               if jnp.issubdtype(l.dtype, jnp.floating))
    assert losses[-1] < losses[0]

    words = np.asarray(spk16.infer_batch(p2, tables, ep, jax.random.PRNGKey(5)))
    assert words.shape == (ep.instr_tokens.shape[0], s.MAX_DECODE)
    assert words.dtype == np.int32


def _iter_eqns(jaxpr):
    """Yield every equation in ``jaxpr`` including scan/cond/pjit bodies.

    Duck-typed (``.jaxpr`` = ClosedJaxpr, ``.eqns`` = Jaxpr) because the
    concrete classes moved out of ``jax.core`` across jax versions."""

    def subjaxprs(v):
        if hasattr(v, "jaxpr"):  # ClosedJaxpr
            return [v.jaxpr]
        if hasattr(v, "eqns"):  # Jaxpr
            return [v]
        if isinstance(v, (list, tuple)):
            return [j for item in v for j in subjaxprs(item)]
        return []

    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            for sub in subjaxprs(v):
                yield from _iter_eqns(sub)


def test_speaker_bf16_no_f32_pano_contraction(ctx, tokenizer):
    """Regression guard for the round-5 soft_dot dtype fix (BASELINE.md:
    "speaker compute dtype"): the f32 LSTM query used to promote BOTH
    pano-context einsums to f32, and XLA materialized a full f32 copy of
    the [B,T,36,F] stack — the difference between 22.4 and 17.8 ms/step
    on chip.  The durable check (the device trace that first caught it
    lived on a recycled host): in the bf16 teacher-forcing *gradient*
    program, no dot_general may consume an f32 operand that carries the
    36-view axis at rank>=3 — the big stack must stay bf16 through
    forward AND backward; f32 is reserved for rank<=2 islands (recurrent
    state, the [B, L] softmax, losses)."""
    world, tables, henv = ctx
    cfg = get_cfg_defaults()
    s = cfg.AIDE.SPEAKER
    s.RNN_DIM, s.WEMB, s.MAX_DECODE, s.LR = 64, 32, 20, 1e-3
    spk16 = Speaker(s, tokenizer.vocab_size(), feat_dim=FEAT_DIM,
                    episode_len=EP_LEN, compute_dtype=jnp.bfloat16)
    params, _ = spk16.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    feats = collect_shortest_path_features(tables, ep, EP_LEN, jnp.bfloat16)

    def loss_fn(p):
        return spk16.teacher_forcing_loss(p, feats, ep.instr_tokens,
                                          jax.random.PRNGKey(3), train=True)

    jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(params)
    offenders = []
    for eqn in _iter_eqns(jaxpr.jaxpr):
        if eqn.primitive.name != "dot_general":
            continue
        for var in eqn.invars:
            aval = getattr(var, "aval", None)
            if (aval is not None and getattr(aval, "ndim", 0) >= 3
                    and aval.dtype == jnp.float32 and 36 in aval.shape):
                offenders.append(str(eqn)[:160])
    assert not offenders, offenders
