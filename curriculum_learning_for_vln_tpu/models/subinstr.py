"""Sub-instruction-aware decoder family (latent capability path).

Rebuild of the reference's sub-instruction modules, which ship unused on
the main path (agent factory commented out,
`tasks/R2R-judy/src/agent/__init__.py:32-42`): SoftDotBlockAttention
(`src/model/units.py:245-283`), SubMonitorDecoder
(`src/model/policy.py:274-358`), and InstrShifting
(`policy.py:361-392`).  The reference's per-sample Python loop over
instruction blocks becomes a vectorized masked softmax over a block-range
mask, so the decoder remains scan/jit-safe.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .attention import (NEG_INF, mlp_bn, mlp_bn_init, positional_encoding,
                        positional_encoding_table, soft_dot_init,
                        visual_soft_dot, visual_soft_dot_init)
from .core import dense, dense_init, dropout, lstm_cell, lstm_cell_init


def soft_dot_block_attention_init(key, dim: int) -> dict:
    return {"linear_in": dense_init(key, dim, dim, bias=False)}


def soft_dot_block_attention(
    p: dict,
    h: jnp.ndarray,                 # [B, D]
    context: jnp.ndarray,           # [B, L, D]
    sub_seq_lengths: jnp.ndarray,   # [B, S] int32 lengths per sub-instruction
    selected_block_idx: jnp.ndarray,  # [B] int32 current block
    mask: jnp.ndarray = None,       # [B, L] True = masked
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attend only within the selected sub-instruction block
    (ref: units.py:254-283).  Block k spans positions
    [1 + sum(len[:k]), 1 + sum(len[:k]) + len[k]) — the +1 skips <BOS>."""
    B, L, D = context.shape
    target = dense(p["linear_in"], h)                    # [B, D]
    attn = jnp.einsum("bld,bd->bl", context, target)     # raw scores
    if mask is not None:
        attn = jnp.where(mask, NEG_INF, attn)

    cum = jnp.cumsum(sub_seq_lengths, axis=1)
    starts = jnp.concatenate([jnp.zeros((B, 1), cum.dtype), cum[:, :-1]], axis=1) + 1
    sel = selected_block_idx[:, None]
    start = jnp.take_along_axis(starts, sel, axis=1)     # [B, 1]
    length = jnp.take_along_axis(sub_seq_lengths, sel, axis=1)
    pos = jnp.arange(L)[None, :]
    in_block = (pos >= start) & (pos < start + length)

    block_attn = jax.nn.softmax(jnp.where(in_block, attn, NEG_INF), axis=1)
    block_attn = jnp.where(in_block, block_attn, 0.0)    # exact zeros outside
    weighted = jnp.einsum("bl,bld->bd", block_attn, context)
    return weighted, attn


def sub_monitor_decoder_init(key, rnn_hidden_size: int, max_enc_len: int,
                             mlp_dims=(128, 1024), action_embed_size: int = 2048 + 128):
    ks = jax.random.split(key, 6)
    img_hidden = mlp_dims[-1]
    mlp_p, mlp_s = mlp_bn_init(ks[0], action_embed_size, list(mlp_dims))
    params = {
        "proj_navigable_mlp": mlp_p,
        "pe": positional_encoding_table(rnn_hidden_size, max_enc_len),
        "text_attn": soft_dot_block_attention_init(ks[1], rnn_hidden_size),
        "visual_attn": visual_soft_dot_init(ks[2], rnn_hidden_size, None, img_hidden),
        "lstm": lstm_cell_init(ks[3], img_hidden * 2 + rnn_hidden_size, rnn_hidden_size),
        "action_linear": dense_init(ks[4], rnn_hidden_size * 2, img_hidden),
    }
    return params, {"mlp": mlp_s}


def sub_monitor_decoder_step(
    p: dict, bn_state: dict,
    a_prev: jnp.ndarray, cand_feat: jnp.ndarray, cand_mask: jnp.ndarray,
    h: jnp.ndarray, c: jnp.ndarray, ctx: jnp.ndarray,
    sub_seq_lengths: jnp.ndarray, selected_block_idx: jnp.ndarray,
    ctx_mask, rng, train: bool, drop_rate: float = 0.5,
):
    """(ref: policy.py:320-358) -> ((logits, weighted_ctx), (h1, c1), bn)."""
    B, K, A = cand_feat.shape
    proj_prev, bn1 = mlp_bn(p["proj_navigable_mlp"], bn_state["mlp"], a_prev,
                            jax.random.fold_in(rng, 0), train)
    proj_cands, bn2 = mlp_bn(p["proj_navigable_mlp"], bn1, cand_feat.reshape(B * K, A),
                             jax.random.fold_in(rng, 1), train)
    proj_cands = proj_cands.reshape(B, K, -1)
    proj_cands = proj_cands * (1.0 - cand_mask.astype(proj_cands.dtype))[:, :, None]

    pos_ctx = positional_encoding(p["pe"], ctx, jax.random.fold_in(rng, 2), train)
    weighted_ctx, ctx_attn = soft_dot_block_attention(
        p["text_attn"], h, pos_ctx, sub_seq_lengths, selected_block_idx, ctx_mask)
    weighted_cands, cands_attn = visual_soft_dot(p["visual_attn"], h, proj_cands, cand_mask)

    concat_input = jnp.concatenate([proj_prev, weighted_cands, weighted_ctx], axis=-1)
    h1, c1 = lstm_cell(p["lstm"], concat_input, h, c)

    h1_drop = dropout(jax.random.fold_in(rng, 3), h1, drop_rate, deterministic=not train)
    h_tilde = dense(p["action_linear"], jnp.concatenate([weighted_ctx, h1_drop], axis=-1))
    logits = jnp.einsum("bkd,bd->bk", proj_cands, h_tilde)
    return (logits, weighted_ctx), (h1, c1), {"mlp": bn2}, (ctx_attn, cands_attn)


def instr_shifting_init(key, rnn_hidden_size: int, shift_hidden_size: int,
                        action_emb_size: int, max_subinstr_size: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "linear0": dense_init(ks[0], rnn_hidden_size, shift_hidden_size, bias=False),
        "linear1": dense_init(ks[1], rnn_hidden_size + shift_hidden_size + action_emb_size,
                              shift_hidden_size, bias=False),
        "linear2": dense_init(ks[2], max_subinstr_size, shift_hidden_size, bias=False),
        "linear3": dense_init(ks[3], 2 * shift_hidden_size, 1, bias=False),
    }


def instr_shifting_apply(p: dict, h_t, m_t, a_t_cur, weighted_ctx, e_t, rng, train: bool,
                         drop_rate: float = 0.5) -> jnp.ndarray:
    """Shift probability: is the current sub-instruction about to complete?
    (ref: policy.py:376-392)."""
    proj_h = dense(p["linear0"], dropout(jax.random.fold_in(rng, 0), h_t, drop_rate,
                                         deterministic=not train))
    concat = jnp.concatenate([proj_h, a_t_cur, weighted_ctx], axis=-1)
    h_t_c = jax.nn.sigmoid(dense(p["linear1"], concat)) * jnp.tanh(m_t)
    proj_e = dense(p["linear2"], e_t)
    h_t_c = dropout(jax.random.fold_in(rng, 1), h_t_c, drop_rate, deterministic=not train)
    concat2 = jnp.concatenate([proj_e, h_t_c], axis=-1)
    return jax.nn.sigmoid(dense(p["linear3"], concat2))[..., 0]
