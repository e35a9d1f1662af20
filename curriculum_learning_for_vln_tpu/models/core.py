"""Functional parameter-pytree building blocks.

Models in this framework are pure functions over explicit parameter
pytrees (nested dicts of jnp arrays) — no stateful module framework.
That keeps every agent's full rollout (encoder + T-step decoder scan +
losses) a single traced program, makes carried state (LSTM hidden, BN
running stats, RNG) explicit in `lax.scan` carries, and gives the
parallel layer full freedom to annotate shardings.

Initialization follows the reference models' effective init (PyTorch
defaults): Linear/LSTM weights ~ U(-1/sqrt(fan), 1/sqrt(fan)), embeddings
~ N(0, 1) with a zeroed padding row — so training dynamics are comparable
even though bit-level weight parity is not a goal.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import rnn as rnn_ops


# ---------------------------------------------------------------------------
# Linear / embedding
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    bound = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return p


def dense(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def embedding_init(key, num: int, dim: int, padding_idx: Optional[int] = None) -> dict:
    w = jax.random.normal(key, (num, dim), jnp.float32)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


def embedding(p: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return p["w"][ids]


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

# Above this element count, dropout masks are drawn with the "rbg" PRNG
# (XLA RngBitGenerator -> the TPU hardware RNG) instead of threefry.
# Measured on v5e: threefry mask generation for the per-step EnvDrop
# feature masks ([64,36,2048] etc.) was ~1/3 of the whole RL training
# iteration (18.5 -> 12.0 ms/iter with feature masks off).  rbg bits are
# not reproducible across backends, so small masks keep threefry and the
# fast path is TPU-only (CPU tests stay bit-identical).
_FAST_MASK_MIN_SIZE = 1 << 15


def _rbg_key(rng):
    """Deterministically derive an rbg-impl key from a threefry key (raw
    uint32[2] or typed)."""
    kd = rng if jnp.issubdtype(rng.dtype, jnp.integer) else jax.random.key_data(rng)
    return jax.random.wrap_key_data(jnp.concatenate([kd, kd], axis=-1), impl="rbg")


def make_keep_mask(rng, shape, rate: float) -> jnp.ndarray:
    """The boolean keep-mask behind ``dropout``, exposed so a hand-written
    backward pass (ops/bptt.py) can regenerate the exact forward masks
    from the same key instead of storing them as residuals."""
    keep = 1.0 - rate
    size = 1
    for s in shape:
        size *= s
    if size >= _FAST_MASK_MIN_SIZE and jax.default_backend() == "tpu":
        rng = _rbg_key(rng)
    return jax.random.bernoulli(rng, keep, shape)


def apply_keep_mask(x: jnp.ndarray, mask: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted-dropout application (also its own transpose: the VJP of
    this op wrt ``x`` is the same masked scale applied to the cotangent)."""
    return jnp.where(mask, x / (1.0 - rate), 0.0).astype(x.dtype)


def dropout(rng, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    """Inverted dropout; identity when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    return apply_keep_mask(x, make_keep_mask(rng, x.shape, rate), rate)


def dropout_mask(rng, shape, rate: float) -> jnp.ndarray:
    """A standalone inverted-dropout mask (EnvDrop's shared feature-noise
    mask; ref: envdrop.py:106)."""
    keep = 1.0 - rate
    return jax.random.bernoulli(rng, keep, shape).astype(jnp.float32) / keep


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------

def lstm_cell_init(key, in_dim: int, hidden: int) -> dict:
    bound = 1.0 / math.sqrt(hidden)
    ks = jax.random.split(key, 4)
    return {
        "w_ih": jax.random.uniform(ks[0], (in_dim, 4 * hidden), jnp.float32, -bound, bound),
        "w_hh": jax.random.uniform(ks[1], (hidden, 4 * hidden), jnp.float32, -bound, bound),
        "b_ih": jax.random.uniform(ks[2], (4 * hidden,), jnp.float32, -bound, bound),
        "b_hh": jax.random.uniform(ks[3], (4 * hidden,), jnp.float32, -bound, bound),
    }


def lstm_cell(p: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step (gate order i, f, g, o). Routed through ops.rnn so the
    Pallas fused kernel can take over on TPU."""
    return rnn_ops.lstm_cell(x, h, c, p["w_ih"], p["w_hh"], p["b_ih"] + p["b_hh"])


def masked_lstm(
    p: dict,
    xs: jnp.ndarray,          # [B, L, D]
    lengths: jnp.ndarray,     # [B]
    reverse: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Packed-sequence LSTM semantics via a masked scan.

    Matches torch's pack_padded_sequence behavior
    (ref: units.py:58-71): outputs at padded positions are zero; the
    returned final state is the state after the last *valid* token
    (forward) or after position 0 having processed tokens len-1..0
    (reverse) — the backward direction never reads padding.

    Routed through ops.rnn: under the "pallas" backend this runs the
    fused VMEM-resident-weights kernel with an XLA-recompute VJP.
    """
    return rnn_ops.masked_lstm(
        xs, lengths, p["w_ih"], p["w_hh"], p["b_ih"] + p["b_hh"], reverse=reverse
    )


def bilstm_layer(
    p_fwd: dict, p_bwd: Optional[dict], xs: jnp.ndarray, lengths: jnp.ndarray
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One (bi)directional LSTM layer. Returns concat outputs [B, L, H*dirs]
    and final (h, c) concatenated over directions (torch's [-2],[-1] cat,
    ref: units.py:63-67)."""
    out_f, (h_f, c_f) = masked_lstm(p_fwd, xs, lengths, reverse=False)
    if p_bwd is None:
        return out_f, (h_f, c_f)
    out_b, (h_b, c_b) = masked_lstm(p_bwd, xs, lengths, reverse=True)
    return (
        jnp.concatenate([out_f, out_b], axis=-1),
        (jnp.concatenate([h_f, h_b], axis=-1), jnp.concatenate([c_f, c_b], axis=-1)),
    )


# ---------------------------------------------------------------------------
# BatchNorm (for the Self-Monitoring MLP; ref: units.py:210-242)
# ---------------------------------------------------------------------------

def batchnorm_init(dim: int) -> Tuple[dict, dict]:
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,)), "count": jnp.zeros(())}
    return params, state


def batchnorm(
    params: dict, state: dict, x: jnp.ndarray, train: bool, momentum: float = 0.1, eps: float = 1e-5
) -> Tuple[jnp.ndarray, dict]:
    """BatchNorm1d semantics: batch stats in train (running stats updated as
    a side value), running stats in eval."""
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


# ---------------------------------------------------------------------------
# Loss helpers (per-sample, SPCL-ready; ref: follower.py:63, envdrop.py:70)
# ---------------------------------------------------------------------------

def cross_entropy_per_sample(logits: jnp.ndarray, targets: jnp.ndarray, ignore_id: int = -1) -> jnp.ndarray:
    """CE with ignore_index semantics, per-sample vector [B].

    Masked (-inf) logits are handled by computing log_softmax over the
    finite entries only (masked entries carry zero probability)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
    picked = jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    return jnp.where(targets == ignore_id, 0.0, -picked)
