"""Speaker encoder/decoder models.

Functional ports of the reference speaker units
(`tasks/R2R-judy/src/model/units.py:286-390`, themselves from
airsplay/R2R-EnvDrop):

* SpeakerEncoder: feature-dropout on image dims -> LSTM over the action
  sequence (NOT packed: padded steps are processed, matching the
  reference, units.py:311-341) -> per-step attention over the 36 views ->
  post-LSTM.
* SpeakerDecoder: word embedding -> LSTM -> attention over encoder ctx ->
  vocab projection (beam-aware ctx expansion is handled by the caller
  replicating ctx rows).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .attention import soft_dot, soft_dot_init
from .core import (dense, dense_init, dropout, embedding, embedding_init,
                   lstm_cell, lstm_cell_init, masked_lstm)


def _unmasked_lstm(p: dict, xs: jnp.ndarray, h0=None, c0=None):
    """Full-length LSTM over [B, T, D] (no length masking — parity with the
    reference speaker's un-packed LSTM).

    With a zero initial state this routes through ``models.core.masked_lstm``
    with full lengths, i.e. the ops.rnn backend — under the "pallas" backend
    the fused VMEM-resident-weights scan kernel takes over (ops/rnn.py
    falls back to XLA when the weights exceed the VMEM tile budget, which
    covers the encoder's first layer at production feature dims).  A
    caller-supplied (h0, c0) — the speaker decoder resuming from the
    encoder state — keeps the plain XLA scan: the fused kernel's carries
    start at zero (ref: units.py:311-341, 364-390)."""
    B, T, Dm = xs.shape
    if h0 is None and c0 is None:
        return masked_lstm(p, xs, jnp.full((B,), T, jnp.int32))
    H = p["w_hh"].shape[0]
    h = jnp.zeros((B, H), xs.dtype) if h0 is None else h0
    c = jnp.zeros((B, H), xs.dtype) if c0 is None else c0

    def step(carry, x_t):
        h, c = carry
        h, c = lstm_cell(p, x_t, h, c)
        return (h, c), h

    (h, c), outs = jax.lax.scan(step, (h, c), jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(outs, 0, 1), (h, c)


def _bidir_unmasked_lstm(p_fwd: dict, p_bwd: Optional[dict], xs: jnp.ndarray):
    out_f, _ = _unmasked_lstm(p_fwd, xs)
    if p_bwd is None:
        return out_f
    B, T, _ = xs.shape
    # reverse direction via masked_lstm(reverse=True) with full lengths —
    # identical to scanning the flipped sequence, but backend-routable
    out_b, _ = masked_lstm(p_bwd, xs, jnp.full((B,), T, jnp.int32), reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def speaker_encoder_init(key, feature_size: int, hidden_size: int, bidirectional: bool) -> dict:
    dirs = 2 if bidirectional else 1
    H = hidden_size // dirs
    ks = jax.random.split(key, 5)
    return {
        "lstm_fwd": lstm_cell_init(ks[0], feature_size, H),
        "lstm_bwd": lstm_cell_init(ks[1], feature_size, H) if bidirectional else None,
        "attn": soft_dot_init(ks[2], hidden_size, context_dim=feature_size),
        "post_fwd": lstm_cell_init(ks[3], hidden_size, H),
        "post_bwd": lstm_cell_init(ks[4], hidden_size, H) if bidirectional else None,
    }


def speaker_encoder_apply(
    p: dict,
    action_embeds: jnp.ndarray,   # [B, T, F] chosen-candidate features
    features: jnp.ndarray,        # [B, T, 36, F] panoramic features
    rng,
    train: bool,
    drop_rate: float = 0.6,
    feat_drop_rate: float = 0.3,
    angle_feat_size: int = 128,
    already_dropfeat: bool = False,
) -> jnp.ndarray:
    """(ref: units.py:311-341) -> ctx [B, T, H]."""
    B, T, _, F = features.shape
    x = action_embeds
    if not already_dropfeat:
        img, ang = x[..., :-angle_feat_size], x[..., -angle_feat_size:]
        img = dropout(jax.random.fold_in(rng, 0), img, feat_drop_rate, deterministic=not train)
        x = jnp.concatenate([img, ang], axis=-1)

    ctx = _bidir_unmasked_lstm(p["lstm_fwd"], p["lstm_bwd"], x)
    ctx = dropout(jax.random.fold_in(rng, 1), ctx, drop_rate, deterministic=not train)
    H = ctx.shape[-1]

    feats = features
    if not already_dropfeat:
        fimg, fang = feats[..., :-angle_feat_size], feats[..., -angle_feat_size:]
        fimg = dropout(jax.random.fold_in(rng, 2), fimg, feat_drop_rate, deterministic=not train)
        feats = jnp.concatenate([fimg, fang], axis=-1)

    x2, _ = soft_dot(p["attn"], ctx.reshape(B * T, H), feats.reshape(B * T, 36, F))
    x2 = x2.reshape(B, T, H)
    x2 = dropout(jax.random.fold_in(rng, 3), x2, drop_rate, deterministic=not train)

    out = _bidir_unmasked_lstm(p["post_fwd"], p["post_bwd"], x2)
    return dropout(jax.random.fold_in(rng, 4), out, drop_rate, deterministic=not train)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def speaker_decoder_init(key, vocab_size: int, embedding_size: int, padding_idx: int,
                         hidden_size: int) -> dict:
    ks = jax.random.split(key, 5)
    return {
        "embedding": embedding_init(ks[0], vocab_size, embedding_size, padding_idx),
        "lstm": lstm_cell_init(ks[1], embedding_size, hidden_size),
        "attn": soft_dot_init(ks[2], hidden_size),
        "projection": dense_init(ks[3], hidden_size, vocab_size),
        "baseline_fc1": dense_init(jax.random.fold_in(key, 7), hidden_size, 128),
        "baseline_fc2": dense_init(ks[4], 128, 1),
    }


def speaker_decoder_apply(
    p: dict,
    words: jnp.ndarray,       # [B, L] token ids
    ctx: jnp.ndarray,         # [B, T, H]
    ctx_mask: jnp.ndarray,    # [B, T] True = masked
    h0: jnp.ndarray,          # [B, H]
    c0: jnp.ndarray,
    rng,
    train: bool,
    drop_rate: float = 0.6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(ref: units.py:364-390) -> (logits [B, L, V], h1, c1)."""
    B, L = words.shape
    H = ctx.shape[-1]
    embeds = embedding(p["embedding"], words)
    embeds = dropout(jax.random.fold_in(rng, 0), embeds, drop_rate, deterministic=not train)
    x, (h1, c1) = _unmasked_lstm(p["lstm"], embeds, h0, c0)
    x = dropout(jax.random.fold_in(rng, 1), x, drop_rate, deterministic=not train)

    ctx_rep = jnp.broadcast_to(ctx[:, None], (B, L, ctx.shape[1], H)).reshape(B * L, ctx.shape[1], H)
    mask_rep = jnp.broadcast_to(ctx_mask[:, None], (B, L, ctx.shape[1])).reshape(B * L, ctx.shape[1])
    x2, _ = soft_dot(p["attn"], x.reshape(B * L, H), ctx_rep, mask_rep)
    x2 = x2.reshape(B, L, H)
    x2 = dropout(jax.random.fold_in(rng, 2), x2, drop_rate, deterministic=not train)
    logits = dense(p["projection"], x2)
    return logits, h1, c1
