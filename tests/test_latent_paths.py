"""Latent capability paths: avoid_cyclic, GloVe, sub-instruction models,
region labels, RxR expansion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import FollowerAgent
from curriculum_learning_for_vln_tpu.agents.common import FEEDBACK_ARGMAX
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items, expand_rxr_items
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.models import subinstr as SI
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults
from curriculum_learning_for_vln_tpu.utils.region_label import REGION_LABELS

FEAT_DIM = 64


@pytest.fixture(scope="module")
def ctx(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=4, tokenizer=tokenizer, seed=21)
    return synth_world, synth_world.device_tables(), henv


def make_follower(tok, glove=None):
    cfg = get_cfg_defaults()
    m = cfg.MODEL.FOLLOWER
    m.WORD_EMB_SIZE = 32
    m.HIDDEN_SIZE = 64
    m.ENC_LAYERS = 1
    return FollowerAgent(m, tok.vocab_size(), FEAT_DIM, episode_len=10, glove=glove)


def test_avoid_cyclic_no_revisit(ctx, tokenizer):
    """With avoid_cyclic, argmax rollouts never revisit a viewpoint
    (ref: follower.py:117-122)."""
    world, tables, henv = ctx
    agent = make_follower(tokenizer)
    params, ms = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    _, result, _ = agent.rollout(params, ms, tables, ep, jax.random.PRNGKey(1),
                                 feedback=FEEDBACK_ARGMAX, train=False, avoid_cyclic=True)
    nodes = np.asarray(result.steps.node_after)  # [T, B]
    moved = np.asarray(result.steps.moved)
    starts = np.asarray(result.start_node)
    for b in range(nodes.shape[1]):
        seq = [int(starts[b])] + [int(nodes[t, b]) for t in range(nodes.shape[0]) if moved[t, b]]
        assert len(seq) == len(set(seq)), f"revisit in episode {b}: {seq}"


def test_glove_frozen_embeddings(ctx, tokenizer):
    world, tables, henv = ctx
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((tokenizer.vocab_size(), 32)).astype(np.float32)
    agent = make_follower(tokenizer, glove=glove)
    params, ms = agent.init(jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(params["encoder"]["embedding"]["w"]), glove)
    ep = henv.next_batch()

    def loss(p):
        losses, _, _ = agent.rollout(p, ms, tables, ep, jax.random.PRNGKey(1),
                                     feedback=0, train=True)
        return losses.ml_loss

    grads = jax.grad(loss)(params)
    # frozen: zero gradient to the embedding table
    assert float(jnp.sum(jnp.abs(grads["encoder"]["embedding"]["w"]))) == 0.0
    # but the rest of the encoder still learns
    assert float(jnp.sum(jnp.abs(grads["encoder"]["enc2dec"]["w"]))) > 0.0


def test_block_attention_restricts_to_block():
    key = jax.random.PRNGKey(0)
    B, L, D, S = 2, 12, 8, 3
    p = SI.soft_dot_block_attention_init(key, D)
    h = jnp.ones((B, D))
    ctx = jax.random.normal(key, (B, L, D))
    # blocks of lengths 3/4/2, starting after <BOS> at position 1
    lengths = jnp.array([[3, 4, 2], [2, 2, 5]], jnp.int32)
    sel = jnp.array([1, 2], jnp.int32)
    weighted, attn = SI.soft_dot_block_attention(p, h, ctx, lengths, sel)
    assert weighted.shape == (B, D)
    # verify manually: batch 0 block 1 spans positions [1+3, 1+3+4) = [4, 8)
    import numpy as onp
    raw = onp.asarray(attn[0])
    block = raw[4:8]
    probs = onp.exp(block - block.max())
    probs = probs / probs.sum()
    expected = probs @ onp.asarray(ctx[0, 4:8])
    assert onp.allclose(onp.asarray(weighted[0]), expected, atol=1e-5)


def test_sub_monitor_decoder_and_shifting():
    key = jax.random.PRNGKey(0)
    B, K, A, H, L = 2, 5, FEAT_DIM + 128, 32, 12
    params, state = SI.sub_monitor_decoder_init(key, H, max_enc_len=L, mlp_dims=(16,),
                                                action_embed_size=A)
    cands = jnp.ones((B, K, A))
    cand_mask = jnp.zeros((B, K), bool)
    ctx = jnp.ones((B, L, H))
    lengths = jnp.array([[3, 4, 2], [2, 2, 5]], jnp.int32)
    sel = jnp.zeros(B, jnp.int32)
    (logits, wctx), (h1, c1), st2, _ = SI.sub_monitor_decoder_step(
        params, state, jnp.ones((B, A)), cands, cand_mask,
        jnp.zeros((B, H)), jnp.zeros((B, H)), ctx, lengths, sel,
        None, jax.random.PRNGKey(1), train=True)
    assert logits.shape == (B, K)

    # shift_hidden must equal rnn_hidden (the reference's gate h_t_c =
    # sigmoid(W1 ...) * tanh(m_t) requires it, policy.py:386)
    sp = SI.instr_shifting_init(key, H, H, A, 3)
    e_t = jnp.ones((B, 3))
    prob = SI.instr_shifting_apply(sp, h1, c1, jnp.ones((B, A)), wctx, e_t,
                                   jax.random.PRNGKey(2), train=True)
    assert prob.shape == (B,)
    assert np.all((np.asarray(prob) >= 0) & (np.asarray(prob) <= 1))


def test_region_labels():
    assert REGION_LABELS["k"] == "kitchen"
    assert len(REGION_LABELS) == 31  # a-z minus q, B C D S Z, "-"


def test_rxr_expansion(tokenizer):
    items = [{
        "scan": "synth000",
        "path_id": 77,
        "path": ["a", "b"],
        "heading": 0.5,
        "instruction": "walk to the door .",
        "instruction_id": "rxr_0001",
    }]
    out = expand_rxr_items(items, tokenizer)
    assert len(out) == 1
    assert out[0]["instr_id"] == "rxr_0001"
    assert out[0]["instructions"] == "walk to the door ."
    assert "instr_encoding" in out[0]
