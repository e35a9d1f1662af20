"""Navigation policy decoders: Follower, Self-Monitoring, EnvDrop, Critic.

Functional ports of `tasks/R2R-judy/src/model/policy.py`:
* AttnDecoderLSTM (:15-60)   — follower: visual attn -> LSTMCell -> text
  attn -> ActionScoring.
* MonitorDecoder (:67-166)   — BN-MLP candidate projection, positional
  text attn (context-only), candidate visual attn, LSTMCell, bmm policy
  net, and the progress monitor head.
* EnvDropDecoder (:173-246)  — angle->action embedding, environmental
  dropout on image features (angle dims kept), visual attn, LSTMCell on
  (h_tilde_prev, c), text attn producing h_tilde, candidate dot scorer.
* Critic (:249-267)          — 2-layer value head.

Each decoder is a single *step* function designed to live inside the
rollout `lax.scan`; recurrent state, BN statistics and dropout RNG are all
explicit.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .attention import (action_scoring, action_scoring_init, mlp_bn,
                        mlp_bn_init, positional_encoding,
                        positional_encoding_table, soft_dot, soft_dot_init,
                        visual_soft_dot, visual_soft_dot_init)
from .core import dense, dense_init, dropout, lstm_cell, lstm_cell_init


# ---------------------------------------------------------------------------
# Follower (Speaker-Follower, Fried et al. 2018)
# ---------------------------------------------------------------------------

def follower_decoder_init(key, hidden_size: int, action_embed_size: int, feature_size: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "lstm": lstm_cell_init(ks[0], action_embed_size + feature_size, hidden_size),
        "text_attn": soft_dot_init(ks[1], hidden_size),
        "visual_attn": visual_soft_dot_init(ks[2], hidden_size, feature_size),
        "decode_action": action_scoring_init(ks[3], action_embed_size, hidden_size),
    }


def follower_decoder_from_vis(
    p: dict,
    weighted_v: jnp.ndarray,   # [B, F] attention-weighted panorama
    a_prev: jnp.ndarray,       # [B, A]
    cand_feat: jnp.ndarray,    # [B, K, A]
    h: jnp.ndarray,
    c: jnp.ndarray,
    ctx: jnp.ndarray,
    ctx_mask: Optional[jnp.ndarray],
    rng,
    train: bool,
    drop_rate: float = 0.5,
):
    """The follower step after visual attention — shared by the
    reference-shaped ``follower_decoder_step`` and the fused-observation
    path (ops/fused_obs.py; same fold_in indices)."""
    visual_ctx = dropout(
        jax.random.fold_in(rng, 0), jnp.concatenate([a_prev, weighted_v], axis=-1),
        drop_rate, deterministic=not train,
    )
    h1, c1 = lstm_cell(p["lstm"], visual_ctx, h, c)
    h1_drop = dropout(jax.random.fold_in(rng, 1), h1, drop_rate, deterministic=not train)
    h_tilde, alpha_c = soft_dot(p["text_attn"], h1_drop, ctx, ctx_mask)
    logits = action_scoring(p["decode_action"], cand_feat, h_tilde)
    return logits, (h1, c1), alpha_c


def follower_visual_query(p: dict, h: jnp.ndarray) -> jnp.ndarray:
    """Reparameterized visual-attention query for the fused observation
    kernel: visual_soft_dot scores are (pano @ W_v + b_v) . (W_h h + b_h);
    by associativity pano . (W_v^T (W_h h + b_h)) gives the same softmax
    (the b_v term adds a per-sample constant to every view's score, which
    softmax ignores — so b_v correctly receives zero gradient)."""
    t = dense(p["visual_attn"]["linear_in_h"], h)              # [B, dot]
    return jnp.einsum("bd,fd->bf", t, p["visual_attn"]["linear_in_v"]["w"])


def follower_decoder_step(
    p: dict,
    pano_feat: jnp.ndarray,    # [B, 36, F]
    a_prev: jnp.ndarray,       # [B, A]
    cand_feat: jnp.ndarray,    # [B, K, A]
    h: jnp.ndarray,
    c: jnp.ndarray,
    ctx: jnp.ndarray,
    ctx_mask: Optional[jnp.ndarray],
    rng,
    train: bool,
    drop_rate: float = 0.5,
):
    weighted_v, alpha_v = visual_soft_dot(p["visual_attn"], h, pano_feat)
    logits, (h1, c1), alpha_c = follower_decoder_from_vis(
        p, weighted_v, a_prev, cand_feat, h, c, ctx, ctx_mask, rng, train, drop_rate,
    )
    return logits, (h1, c1), (alpha_c, alpha_v)


# ---------------------------------------------------------------------------
# Self-Monitoring (Ma et al. 2019)
# ---------------------------------------------------------------------------

def monitor_decoder_init(
    key,
    rnn_hidden_size: int,
    max_enc_len: int,
    mlp_dims=(128, 1024),
    action_embed_size: int = 2048 + 128,
) -> Tuple[dict, dict]:
    ks = jax.random.split(key, 6)
    img_hidden = mlp_dims[-1]
    mlp_p, mlp_s = mlp_bn_init(ks[0], action_embed_size, list(mlp_dims))
    params = {
        "proj_navigable_mlp": mlp_p,
        "pe": positional_encoding_table(rnn_hidden_size, max_enc_len),
        "text_attn": soft_dot_init(ks[1], rnn_hidden_size, context_only=True),
        "visual_attn": visual_soft_dot_init(ks[2], rnn_hidden_size, None, img_hidden),
        "lstm": lstm_cell_init(ks[3], img_hidden * 2 + rnn_hidden_size, rnn_hidden_size),
        "action_linear": dense_init(ks[4], rnn_hidden_size * 2, img_hidden),
        "monitor_linear": dense_init(ks[5], rnn_hidden_size + img_hidden, rnn_hidden_size),
        "critic": dense_init(jax.random.fold_in(key, 99), max_enc_len + rnn_hidden_size, 1),
    }
    return params, {"mlp": mlp_s}


def monitor_decoder_step(
    p: dict,
    bn_state: dict,
    a_prev: jnp.ndarray,       # [B, A]
    cand_feat: jnp.ndarray,    # [B, K, A]
    cand_mask: jnp.ndarray,    # [B, K] True = masked
    h: jnp.ndarray,
    c: jnp.ndarray,
    ctx: jnp.ndarray,          # [B, L, H] — L must equal max_enc_len
    ctx_mask: Optional[jnp.ndarray],
    rng,
    train: bool,
    drop_rate: float = 0.5,
):
    B, K, A = cand_feat.shape
    # shared BN-MLP applied to prev action then candidates, running stats
    # threaded in call order (ref: policy.py:144-149)
    proj_prev, bn1 = mlp_bn(p["proj_navigable_mlp"], bn_state["mlp"], a_prev,
                            jax.random.fold_in(rng, 0), train)
    proj_cands, bn2 = mlp_bn(p["proj_navigable_mlp"], bn1, cand_feat.reshape(B * K, A),
                             jax.random.fold_in(rng, 1), train)
    proj_cands = proj_cands.reshape(B, K, -1)
    proj_cands = proj_cands * (1.0 - cand_mask.astype(proj_cands.dtype))[:, :, None]

    pos_ctx = positional_encoding(p["pe"], ctx, jax.random.fold_in(rng, 2), train)
    weighted_ctx, ctx_attn = soft_dot(p["text_attn"], h, pos_ctx, ctx_mask)
    weighted_cands, cands_attn = visual_soft_dot(p["visual_attn"], h, proj_cands, cand_mask)

    concat_input = jnp.concatenate([proj_prev, weighted_cands, weighted_ctx], axis=-1)
    h1, c1 = lstm_cell(p["lstm"], concat_input, h, c)

    # policy net (ref: policy.py:108-117)
    h1_drop = dropout(jax.random.fold_in(rng, 3), h1, drop_rate, deterministic=not train)
    h_tilde = dense(p["action_linear"], jnp.concatenate([weighted_ctx, h1_drop], axis=-1))
    logits = jnp.einsum("bkd,bd->bk", proj_cands, h_tilde)

    # progress monitor (ref: policy.py:119-130): gate on *previous* h, new c
    concat_pm = dense(p["monitor_linear"], jnp.concatenate([h, weighted_cands], axis=-1))
    h_pm = dropout(jax.random.fold_in(rng, 4), jax.nn.sigmoid(concat_pm) * jnp.tanh(c1),
                   drop_rate, deterministic=not train)
    progress = jnp.tanh(dense(p["critic"], jnp.concatenate([ctx_attn, h_pm], axis=-1)))[:, 0]

    return (logits, progress), (h1, c1), {"mlp": bn2}, (ctx_attn, cands_attn)


# ---------------------------------------------------------------------------
# EnvDrop (Tan et al. 2019)
# ---------------------------------------------------------------------------

def envdrop_decoder_init(
    key,
    hidden_size: int,
    action_embed_size: int = 64,
    angle_feat_size: int = 128,
    feature_size: int = 2048 + 128,
) -> dict:
    ks = jax.random.split(key, 5)
    return {
        "act_embed": dense_init(ks[0], angle_feat_size, action_embed_size),
        "lstm": lstm_cell_init(ks[1], action_embed_size + feature_size, hidden_size),
        "text_attn": soft_dot_init(ks[2], hidden_size),
        "visual_attn": soft_dot_init(ks[3], hidden_size, context_only=True, context_dim=feature_size),
        "cand_attn": dense_init(ks[4], hidden_size, feature_size, bias=False),
    }


def envdrop_visual_query(p: dict, h_tilde_prev: jnp.ndarray, rng, train: bool,
                         drop_rate: float = 0.5) -> jnp.ndarray:
    """The visual-attention query tv = W_in . dropout(h_tilde_prev)
    (fold_in index 3) — split out so a fused gather+attention kernel
    (ops/fused_obs.py) can consume it directly."""
    prev_h1_drop = dropout(jax.random.fold_in(rng, 3), h_tilde_prev, drop_rate,
                           deterministic=not train)
    return dense(p["visual_attn"]["linear_in"], prev_h1_drop)


def envdrop_decoder_from_vis(
    p: dict,
    a_t_angle: jnp.ndarray,      # [B, 128]
    visual_feat: jnp.ndarray,    # [B, F] attention-weighted panorama
    cand_feat: Optional[jnp.ndarray],  # [B, K, F] (image dims already dropped)
    h_tilde_prev: jnp.ndarray,
    c: jnp.ndarray,
    ctx: jnp.ndarray,
    ctx_mask: Optional[jnp.ndarray],
    rng,
    train: bool,
    drop_rate: float = 0.5,
    cand_scorer=None,
):
    """The decoder step after visual attention: action embedding, LSTM,
    text attention, candidate scoring.  Shared by the reference-shaped
    ``envdrop_decoder_step`` and the fused-observation path (same fold_in
    indices, so both produce identical dropout masks).  With
    ``cand_scorer`` the candidate logits come from
    cand_scorer(projected_query) — the fused candidate kernel path
    (ops/fused_obs.py cand_attend_logits) — and ``cand_feat`` is unused."""
    act_emb = dropout(jax.random.fold_in(rng, 0), jnp.tanh(dense(p["act_embed"], a_t_angle)),
                      drop_rate, deterministic=not train)

    concat_input = jnp.concatenate([act_emb, visual_feat], axis=-1)
    # recurrent h input is h_tilde_prev (ref: policy.py:238)
    h1, c1 = lstm_cell(p["lstm"], concat_input, h_tilde_prev, c)

    h1_drop = dropout(jax.random.fold_in(rng, 4), h1, drop_rate, deterministic=not train)
    h_tilde, alpha_c = soft_dot(p["text_attn"], h1_drop, ctx, ctx_mask)

    h_tilde_drop = dropout(jax.random.fold_in(rng, 5), h_tilde, drop_rate, deterministic=not train)
    q = dense(p["cand_attn"], h_tilde_drop)
    if cand_scorer is not None:
        logits = cand_scorer(q)
    else:
        logits = jnp.einsum("bkf,bf->bk", cand_feat, q)

    return logits, (h1, c1), h_tilde


def drop_feat_img(feat: jnp.ndarray, rng, rate: float, train: bool,
                  angle_feat_size: int = 128) -> jnp.ndarray:
    """Environmental dropout on the image dims only (ref: policy.py:226-232)."""
    img, ang = feat[..., :-angle_feat_size], feat[..., -angle_feat_size:]
    img = dropout(rng, img, rate, deterministic=not train)
    return jnp.concatenate([img, ang], axis=-1)


def envdrop_decoder_step(
    p: dict,
    a_t_angle: jnp.ndarray,      # [B, 128] current-orientation angle feature
    pano_feat: jnp.ndarray,      # [B, 36, F]
    cand_feat: jnp.ndarray,      # [B, K, F]
    h_tilde_prev: jnp.ndarray,   # [B, H]
    h: jnp.ndarray,              # [B, H] (returned state, not the recurrent input)
    c: jnp.ndarray,              # [B, H]
    ctx: jnp.ndarray,
    ctx_mask: Optional[jnp.ndarray],
    rng,
    train: bool,
    drop_rate: float = 0.5,
    feat_drop_rate: float = 0.3,
    angle_feat_size: int = 128,
    already_dropfeat: bool = False,
):
    if not already_dropfeat:
        pano_feat = drop_feat_img(pano_feat, jax.random.fold_in(rng, 1),
                                  feat_drop_rate, train, angle_feat_size)
        cand_feat = drop_feat_img(cand_feat, jax.random.fold_in(rng, 2),
                                  feat_drop_rate, train, angle_feat_size)

    prev_h1_drop = dropout(jax.random.fold_in(rng, 3), h_tilde_prev, drop_rate, deterministic=not train)
    visual_feat, alpha_v = soft_dot(p["visual_attn"], prev_h1_drop, pano_feat)

    return envdrop_decoder_from_vis(
        p, a_t_angle, visual_feat, cand_feat, h_tilde_prev, c,
        ctx, ctx_mask, rng, train, drop_rate,
    )


# ---------------------------------------------------------------------------
# Critic value head
# ---------------------------------------------------------------------------

def critic_init(key, hidden_size: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": dense_init(k1, hidden_size, hidden_size),
        "fc2": dense_init(k2, hidden_size, 1),
    }


def critic_apply(p: dict, state: jnp.ndarray, rng, train: bool, drop_rate: float = 0.5) -> jnp.ndarray:
    x = jax.nn.relu(dense(p["fc1"], state))
    x = dropout(rng, x, drop_rate, deterministic=not train)
    return dense(p["fc2"], x)[..., 0]
