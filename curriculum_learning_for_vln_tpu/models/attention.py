"""Attention and scoring units.

Functional ports of the reference RNN-unit zoo
(`tasks/R2R-judy/src/model/units.py`): SoftDotAttention (:77-122),
VisualSoftDotAttention (:125-160), ActionScoring (:163-185),
PositionalEncoding (:188-207), MLPwithBN (:210-242).  Each unit is an
(init, apply) pair over a parameter dict; BN running statistics are
explicit state so the Self-Monitoring decoder can carry them through the
rollout `lax.scan`.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core import batchnorm, batchnorm_init, dense, dense_init, dropout

NEG_INF = -1e30  # large-finite stand-in for -inf under masked softmax


def masked_softmax(logits: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Softmax with boolean mask (True = suppress), reference's
    masked_fill(-inf) + softmax."""
    if mask is not None:
        logits = jnp.where(mask, NEG_INF, logits)
    return jax.nn.softmax(logits, axis=axis)


# -- SoftDotAttention --------------------------------------------------------

def soft_dot_init(key, query_dim: int, context_only: bool = False, context_dim: Optional[int] = None) -> dict:
    ctx_dim = query_dim if context_dim is None else context_dim
    k1, k2 = jax.random.split(key)
    p = {"linear_in": dense_init(k1, query_dim, ctx_dim, bias=False)}
    if not context_only:
        p["linear_out"] = dense_init(k2, query_dim + ctx_dim, query_dim, bias=False)
    return p


def soft_dot(
    p: dict, h: jnp.ndarray, context: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """General dot attention. h: [B, Q]; context: [B, L, C]; mask True=drop.

    Returns (h_tilde or weighted_context, attn): with a "linear_out" param
    the output is tanh(W [weighted; h]) (ref: units.py:120-122), else the
    raw weighted context (context_only mode)."""
    # Keep both context contractions in the CONTEXT's dtype: the LSTM
    # query h is f32 by design (ops/rnn f32 recurrent state), and an f32
    # query against a bf16 context would promote the whole context to
    # f32 — on the speaker's [B*T, 36, 2176] pano stack XLA materializes
    # that as a full f32 copy of the ~700 MB tensor (measured 2.4 ms
    # layout copy + 2x multiply_reduce traffic per iter, BASELINE.md r5).
    # The softmax itself stays f32 for stability; the [B, L] weights are
    # tiny either way.
    target = dense(p["linear_in"], h).astype(context.dtype)  # [B, C]
    attn = jnp.einsum("blc,bc->bl", context, target)
    attn = masked_softmax(attn.astype(jnp.float32), mask)
    weighted = jnp.einsum("bl,blc->bc", attn.astype(context.dtype), context)
    if "linear_out" not in p:
        return weighted, attn
    h_tilde = jnp.tanh(dense(p["linear_out"], jnp.concatenate([weighted, h], axis=-1)))
    return h_tilde, attn


# -- VisualSoftDotAttention --------------------------------------------------

def visual_soft_dot_init(key, h_dim: int, v_dim: Optional[int] = None, dot_dim: int = 256) -> dict:
    k1, k2 = jax.random.split(key)
    p = {"linear_in_h": dense_init(k1, h_dim, dot_dim, bias=True)}
    if v_dim is not None:
        p["linear_in_v"] = dense_init(k2, v_dim, dot_dim, bias=True)
    return p


def visual_soft_dot(
    p: dict, h: jnp.ndarray, visual_context: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Projected dot attention over views (ref: units.py:138-160): the
    weighted sum is over the *unprojected* visual context."""
    target = dense(p["linear_in_h"], h)                      # [B, dot]
    ctx = dense(p["linear_in_v"], visual_context) if "linear_in_v" in p else visual_context
    attn = jnp.einsum("bvd,bd->bv", ctx, target)
    attn = masked_softmax(attn, mask)
    weighted = jnp.einsum("bv,bvd->bd", attn, visual_context)
    return weighted, attn


# -- ActionScoring -----------------------------------------------------------

def action_scoring_init(key, action_size: int, hidden_size: int, dot_size: int = 256) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "linear_act": dense_init(k1, action_size, dot_size, bias=True),
        "linear_hid": dense_init(k2, hidden_size, dot_size, bias=True),
        "linear_out": dense_init(k3, dot_size, 1, bias=True),
    }


def action_scoring(p: dict, act_cands: jnp.ndarray, h_tilde: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-style candidate scorer (ref: units.py:174-185).
    act_cands: [B, K, A]; h_tilde: [B, H] -> logits [B, K]."""
    target = dense(p["linear_hid"], h_tilde)[:, None, :]     # [B, 1, dot]
    context = dense(p["linear_act"], act_cands)              # [B, K, dot]
    return dense(p["linear_out"], context * target)[..., 0]


# -- PositionalEncoding ------------------------------------------------------

def positional_encoding_table(d_model: int, max_len: int = 80) -> jnp.ndarray:
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


def positional_encoding(pe: jnp.ndarray, x: jnp.ndarray, rng, train: bool, rate: float = 0.1) -> jnp.ndarray:
    """x: [B, L, D] + PE (ref: units.py:205-207; dropout p=0.1)."""
    y = x + pe[None, : x.shape[1], :]
    return dropout(rng, y, rate, deterministic=not train)


# -- MLP with BatchNorm ------------------------------------------------------

def mlp_bn_init(key, input_size: int, hidden_sizes, out_size: Optional[int] = None,
                use_bn: bool = True):
    """(params, state) for MLPwithBN (ref: units.py:214-238):
    [BN(in)] -> (Linear -> [BN] -> [Dropout] -> ReLU)* -> [Linear(out)]."""
    params = {"layers": []}
    state = {"bns": []}
    keys = jax.random.split(key, len(hidden_sizes) + 1)
    if use_bn:
        bp, bs = batchnorm_init(input_size)
        params["bn_in"] = bp
        state["bn_in"] = bs
    dims = [input_size] + list(hidden_sizes)
    for i in range(len(dims) - 1):
        params["layers"].append(dense_init(keys[i], dims[i], dims[i + 1], bias=True))
        if use_bn:
            bp, bs = batchnorm_init(dims[i + 1])
            state["bns"].append(bs)
            params.setdefault("bn_layers", []).append(bp)
    if out_size is not None:
        params["out"] = dense_init(keys[-1], dims[-1], out_size, bias=True)
    return params, state


def mlp_bn(params: dict, state: dict, x: jnp.ndarray, rng, train: bool,
           drop_rate: float = 0.5, use_bn: bool = True):
    """Apply MLPwithBN; returns (y, new_state)."""
    new_state = {"bns": []}
    if use_bn:
        x, s = batchnorm(params["bn_in"], state["bn_in"], x, train)
        new_state["bn_in"] = s
    for i, lp in enumerate(params["layers"]):
        x = dense(lp, x)
        if use_bn:
            x, s = batchnorm(params["bn_layers"][i], state["bns"][i], x, train)
            new_state["bns"].append(s)
        if drop_rate > 0:
            x = dropout(jax.random.fold_in(rng, i), x, drop_rate, deterministic=not train)
        x = jax.nn.relu(x)
    if "out" in params:
        x = dense(params["out"], x)
    return x, new_state
