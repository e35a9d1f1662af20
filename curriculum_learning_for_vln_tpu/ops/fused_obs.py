"""Fused observation op: panorama gather + env-dropout + visual attention
+ candidate-row extraction, as one custom-VJP unit.

Motivation (measured on v5e, scripts/perf_ablate.py + BASELINE.md): the
panorama chain is the EnvDrop rollout's dominant per-step HBM traffic —
XLA materializes the [B, 36, D] gather, the concat, the post-dropout
copy, re-reads it in both attention einsums, saves it as a scan residual
for the backward, and separately materializes the candidate
take_along_axis.  ~63 us/step forward against an irreducible ~12 us.

This op draws a custom-VJP boundary around exactly that chain:

* forward — the Pallas kernel (ops/pallas/pano_fused.py) streams feature
  rows HBM->VMEM once and emits only (vis [B, F], cand_img [B, MC, D]);
* residuals — the attention weights [B, 36] and the integer indices;
  nothing image-sized is saved;
* backward — a second kernel re-streams the rows and emits d_tv (the
  [B, F] query cotangent).  The feature tables carry no gradient, so the
  cand_img cotangent is discarded by construction (its only upstream
  dependency is the table).

Dropout masks are never stored: the "pallas" backend regenerates them
from the same key in forward and backward (models.core.make_keep_mask,
bit-identical to the XLA path), and the production "pallas_prng" backend
draws them from the in-kernel hardware RNG (seed-deterministic; nothing
mask-sized ever touches HBM — scripts/check_rbg.py verifies the
determinism assumption on device).

Backend dispatch mirrors ops.rnn: default "xla" runs the plain
formulation (bit-identical to the unfused observe+decoder path);
``set_backend("pallas" | "pallas_prng")`` switches to the kernels — on
real TPU compiled, elsewhere in interpret mode (tests).

ref: the fused semantics are observe()'s panorama/candidate assembly
(env/env.py) + EnvDrop's environmental dropout and visual SoftDot
(tasks/R2R-judy/src/model/policy.py:226-235, units.py:100-118).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.core import dropout, make_keep_mask

_BACKEND = "xla"


def set_backend(name: str) -> None:
    """"xla" | "pallas" (external mask, bit-identical to xla) |
    "pallas_prng" (in-kernel hardware-PRNG mask — fast; the mask
    realization differs from the xla path but fwd/bwd stay consistent) |
    "pallas_prng_shared" (one mask per kernel grid-step group, the
    reference's batch-shared back-translation semantics — cheapest)."""
    global _BACKEND
    assert name in ("xla", "pallas", "pallas_prng", "pallas_prng_shared"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def enabled_for(features, compute_dtype) -> bool:
    """The Pallas path assumes the feature table is already stored in the
    compute dtype (no per-row cast inside the kernel)."""
    return _BACKEND.startswith("pallas") and features.dtype == compute_dtype


def _mask_seeds(key, B: int):
    """Per-sample int32 seeds for the in-kernel hardware PRNG, derived
    from the dropout key (regenerated identically in fwd and bwd)."""
    kd = key if jnp.issubdtype(key.dtype, jnp.integer) else jax.random.key_data(key)
    kd = kd.reshape(-1).astype(jnp.uint32)
    base = kd[0] ^ (kd[-1] * jnp.uint32(2654435761))
    return (base + jnp.arange(B, dtype=jnp.uint32) * jnp.uint32(2654435769)).astype(jnp.int32)


def _xla_impl(cfg, node, view, c_view, features, loc_embed, tv, key):
    """Plain formulation — the exact ops of observe() + the decoder's
    fold_in(rng, 1) panorama dropout, for parity and for the backward."""
    fdrop, train = cfg[0], cfg[1]
    # the stored table may be view-padded for the kernel's DMA alignment
    feats = features[node][:, :loc_embed.shape[1]]
    loc = loc_embed[view]
    img = dropout(key, feats, fdrop, deterministic=not train)
    pano = jnp.concatenate([img, loc], axis=-1)
    scores = jnp.einsum("blc,bc->bl", pano, tv)
    alpha = jax.nn.softmax(scores, axis=-1)
    vis = jnp.einsum("bl,blc->bc", alpha, pano)
    cand_img = jnp.take_along_axis(feats, c_view[:, :, None], axis=1)
    return vis, alpha, cand_img


def _pallas(cfg, node, view, c_view, features, loc_embed, tv, key):
    from .pallas.pano_fused import pano_attend_fwd_pallas

    fdrop, train = cfg[0], cfg[1]
    D = features.shape[-1]
    interpret = jax.default_backend() != "tpu"
    mask = seeds = None
    if train and fdrop > 0.0:
        if _BACKEND.startswith("pallas_prng"):
            seeds = _mask_seeds(key, node.shape[0])
        else:
            mask = make_keep_mask(key, node.shape + (36, D), fdrop)
    oi, oa, alpha, cand = pano_attend_fwd_pallas(
        node, view, c_view, features, loc_embed, tv[:, :D], tv[:, D:],
        mask=mask, seeds=seeds, keep=1.0 - fdrop, interpret=interpret,
        shared_prng=_BACKEND == "pallas_prng_shared")
    return jnp.concatenate([oi, oa], axis=-1), alpha, cand


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pano_attend_cands(cfg, node, view, c_view, features, loc_embed, tv, key):
    """(vis [B, F] f32, cand_img [B, MC, D]) for the current states.

    ``cfg`` is (feat_drop_rate, train) or (feat_drop_rate, train,
    cands_only); with cands_only=True the caller uses only cand_img
    (e.g. the Self-Monitor agent, whose decoder attends over candidates,
    not the panorama) and the backward short-circuits to a zero query
    cotangent without touching the tables.  ``key`` is the decoder's
    fold_in(rng, 1) panorama-dropout key.  Differentiable in ``tv`` only
    (the tables are frozen world data)."""
    impl = _pallas if _BACKEND.startswith("pallas") else _xla_impl
    vis, _alpha, cand = impl(cfg, node, view, c_view, features, loc_embed, tv, key)
    return vis, cand


def _fwd(cfg, node, view, c_view, features, loc_embed, tv, key):
    impl = _pallas if _BACKEND.startswith("pallas") else _xla_impl
    vis, alpha, cand = impl(cfg, node, view, c_view, features, loc_embed, tv, key)
    return (vis, cand), (node, view, c_view, features, loc_embed, alpha, tv, key)


def _bwd(cfg, res, g):
    node, view, c_view, features, loc_embed, alpha, tv, key = res
    g_vis, _g_cand = g  # cand_img depends only on the gradient-free table
    if len(cfg) > 2 and cfg[2]:  # cands_only: vis is unused upstream
        return (None, None, None, None, None, None, None)
    fdrop, train = cfg[0], cfg[1]
    D = features.shape[-1]
    if _BACKEND.startswith("pallas"):
        from .pallas.pano_fused import pano_attend_bwd_pallas

        interpret = jax.default_backend() != "tpu"
        mask = seeds = None
        if train and fdrop > 0.0:
            if _BACKEND.startswith("pallas_prng"):
                seeds = _mask_seeds(key, node.shape[0])
            else:
                mask = make_keep_mask(key, node.shape + (36, D), fdrop)
        di, da, _ = pano_attend_bwd_pallas(
            node, view, c_view, features, loc_embed, alpha,
            g_vis[:, :D], g_vis[:, D:], mask=mask, seeds=seeds,
            keep=1.0 - fdrop, interpret=interpret,
            shared_prng=_BACKEND == "pallas_prng_shared")
        d_tv = jnp.concatenate([di, da], axis=-1)
    else:
        _, vjp = jax.vjp(
            lambda t: _xla_impl(cfg, node, view, c_view, features, loc_embed, t, key)[0],
            tv)
        (d_tv,) = vjp(g_vis)
    return (None, None, None, None, None, d_tv, None)


pano_attend_cands.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused candidate scoring (the decoder tail's candidate path)
# ---------------------------------------------------------------------------

def _cand_xla(cfg, cand_img, cand_angle, cand_valid, q, key):
    """Exact current XLA chain: assemble + drop_feat_img + scorer einsum
    (env/env.py assemble_cand_feat, models/decoders.py drop_feat_img,
    ref: base.py:149-157 + policy.py:226-232,244-246)."""
    from ..env.env import assemble_cand_feat
    from ..models.decoders import drop_feat_img

    fdrop, train = cfg[0], cfg[1]
    A = cand_angle.shape[-1]
    cand = assemble_cand_feat(cand_img, cand_angle, cand_valid)
    cand = drop_feat_img(cand, key, fdrop, train, A)
    return jnp.einsum("bkf,bf->bk", cand, q)


def _cand_pallas(cfg, cand_img, cand_angle, cand_valid, q, key):
    from .pallas.cand_score import cand_score_fwd_pallas

    fdrop, train = cfg[0], cfg[1]
    D = cand_img.shape[-1]
    interpret = jax.default_backend() != "tpu"
    mask = seeds = None
    if train and fdrop > 0.0:
        if _BACKEND.startswith("pallas_prng"):
            seeds = _mask_seeds(key, cand_img.shape[0])
        else:
            # same bits as drop_feat_img's [B, K+1, D] draw, real slots
            mask = make_keep_mask(
                key, (cand_img.shape[0], cand_img.shape[1] + 1, D), fdrop
            )[:, :-1]
    return cand_score_fwd_pallas(cand_img, cand_angle, cand_valid,
                                 q[:, :D], q[:, D:], mask=mask, seeds=seeds,
                                 keep=1.0 - fdrop, interpret=interpret,
                                 shared_prng=_BACKEND == "pallas_prng_shared")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def cand_attend_logits(cfg, cand_img, cand_angle, cand_valid, q, key):
    """Candidate logits [B, MC+1] (STOP slot zero) from raw candidate view
    rows + angle feats and the projected query ``q`` [B, F].  One fused
    kernel replaces the assembled [B, K+1, F] tensor, its same-shaped
    env-dropout mask, the dropped copy, the scorer einsum, AND the scan
    residual of the dropped tensor (the backward regenerates the mask).
    Differentiable in ``q`` only — candidate rows come from the frozen
    world tables.  ``key`` is the decoder's fold_in(rng, 2) cand-dropout
    key."""
    impl = _cand_pallas if _BACKEND.startswith("pallas") else _cand_xla
    return impl(cfg, cand_img, cand_angle, cand_valid, q, key)


def _cand_fwd(cfg, cand_img, cand_angle, cand_valid, q, key):
    out = cand_attend_logits(cfg, cand_img, cand_angle, cand_valid, q, key)
    return out, (cand_img, cand_angle, cand_valid, key)


def _cand_bwd(cfg, res, g):
    cand_img, cand_angle, cand_valid, key = res
    fdrop, train = cfg[0], cfg[1]
    D = cand_img.shape[-1]
    if _BACKEND.startswith("pallas"):
        from .pallas.cand_score import cand_score_bwd_pallas

        interpret = jax.default_backend() != "tpu"
        mask = seeds = None
        if train and fdrop > 0.0:
            if _BACKEND.startswith("pallas_prng"):
                seeds = _mask_seeds(key, cand_img.shape[0])
            else:
                mask = make_keep_mask(
                    key, (cand_img.shape[0], cand_img.shape[1] + 1, D), fdrop
                )[:, :-1]
        dqi, dqa = cand_score_bwd_pallas(cand_img, cand_angle, cand_valid, g,
                                         mask=mask, seeds=seeds,
                                         keep=1.0 - fdrop, interpret=interpret,
                                         shared_prng=_BACKEND == "pallas_prng_shared")
        d_q = jnp.concatenate([dqi, dqa], axis=-1)
    else:
        _, vjp = jax.vjp(
            lambda q_: _cand_xla(cfg, cand_img, cand_angle, cand_valid, q_, key),
            jnp.zeros((cand_img.shape[0], D + cand_angle.shape[-1]), jnp.float32))
        (d_q,) = vjp(g)
    return (None, None, None, d_q, None)


cand_attend_logits.defvjp(_cand_fwd, _cand_bwd)
