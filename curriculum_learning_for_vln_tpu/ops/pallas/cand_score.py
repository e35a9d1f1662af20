"""Pallas TPU kernel: fused candidate scoring for the EnvDrop decoder tail.

The XLA candidate path per rollout step materializes the assembled
[B, K+1, F] candidate tensor (concat img+angle, zero invalid slots,
append the STOP row), a same-shaped env-dropout mask (the two
[64,17,2048] u32->bf16 mask fusions were ~0.47 ms of the round-3 traced
train iteration), applies the dropout copy, runs the scorer einsum, and
saves the dropped tensor as a scan residual for the backward (another
[B,K,F] per step of dynamic-update-slice stacking).

This kernel draws a custom-VJP boundary around exactly that chain
(ref semantics: base.py:149-157 candidate assembly + policy.py:226-232
environmental dropout + policy.py:244-246 scorer dot):

  forward:   logits[b, j] = valid[b,j] * ( drop(img[b,j]) . q_img[b]
                                           + angle[b,j]   . q_ang[b] )
             logits[b, K] = 0                      (STOP slot, zero row)
  backward:  d_q_img[b] = sum_j dlogits[b,j] * drop(img[b,j]) * valid
             d_q_ang[b] = sum_j dlogits[b,j] * angle[b,j] * valid
             (cand rows/angles come from gradient-free world tables)

Dropout masks are never stored: "mask" mode takes the externally drawn
keep-mask (bit-identical to the XLA path's drop_feat_img bits), "seeds"
mode draws from the in-kernel hardware PRNG (pano_fused pattern — one
deterministic draw per grid-step group, regenerated in the backward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 8  # samples per grid step (B padded to a multiple of G)


def _keep_mask(mask_mode, keep, mask_ref, seeds_sp, i, shape):
    if mask_mode == "ext":
        return mask_ref[:]
    if mask_mode.startswith("prng"):
        pltpu.prng_seed(seeds_sp[i * G])
        draw = shape[1:] if mask_mode == "prng_shared" else shape
        bits = pltpu.bitcast(pltpu.prng_random_bits(draw), jnp.uint32)
        thr = min(int(keep * 4294967296.0), 4294967295)
        m = bits < jnp.uint32(thr)
        return m[None] if mask_mode == "prng_shared" else m
    return None


def _dropped(img, mask, keep):
    """bf16-rounded inverted dropout (matches the XLA path's
    dropout(...).astype(bf16) before the f32 einsum upcast)."""
    if mask is None:
        return img.astype(jnp.float32)
    return jnp.where(mask, img / keep, 0.0).astype(img.dtype).astype(jnp.float32)


def _fwd_kernel(keep, mask_mode, seeds_sp, img_ref, ang_ref, valid_ref,
                qi_ref, qa_ref, mask_ref, logits_ref):
    i = pl.program_id(0)
    img = img_ref[:]                                     # [G, MC, D]
    mask = _keep_mask(mask_mode, keep, mask_ref, seeds_sp, i, img.shape)
    di = _dropped(img, mask, keep)                       # [G, MC, D] f32
    ang = ang_ref[:].astype(jnp.float32)                 # [G, MC, A]
    s = (jnp.sum(di * qi_ref[:].astype(jnp.float32)[:, None, :], axis=2)
         + jnp.sum(ang * qa_ref[:].astype(jnp.float32)[:, None, :], axis=2))
    s = jnp.where(valid_ref[:] > 0, s, 0.0)              # [G, MC]
    # STOP slot: zero feature row -> zero logit (base.py:149-157).
    # (concat, not .at[].set — scatter has no Mosaic lowering)
    logits_ref[:] = jnp.concatenate(
        [s, jnp.zeros((s.shape[0], 1), s.dtype)], axis=1)


def _bwd_kernel(keep, mask_mode, seeds_sp, img_ref, ang_ref, valid_ref,
                dlog_ref, mask_ref, dqi_ref, dqa_ref):
    i = pl.program_id(0)
    img = img_ref[:]
    mask = _keep_mask(mask_mode, keep, mask_ref, seeds_sp, i, img.shape)
    di = _dropped(img, mask, keep)
    ang = ang_ref[:].astype(jnp.float32)
    MC = img.shape[1]
    d = dlog_ref[:, :MC].astype(jnp.float32)
    d = jnp.where(valid_ref[:] > 0, d, 0.0)              # [G, MC]
    dqi_ref[:] = jnp.sum(di * d[:, :, None], axis=1)
    dqa_ref[:] = jnp.sum(ang * d[:, :, None], axis=1)


def _pad_b(x, Bp):
    pad = Bp - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _specs(MC, D, A, K1, mask_mode, bwd: bool):
    tile3 = lambda shape: pl.BlockSpec(
        (G,) + shape, lambda i, *_: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    ins = [tile3((MC, D)), tile3((MC, A)), tile3((MC,)),
           ]
    if bwd:
        ins.append(tile3((K1,)))       # dlogits
    else:
        ins += [tile3((D,)), tile3((A,))]  # q_img, q_ang
    ins.append(tile3((MC, D)) if mask_mode == "ext" else
               pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM))
    return ins


@functools.partial(jax.jit, static_argnames=("keep", "interpret", "shared_prng"))
def cand_score_fwd_pallas(cand_img, cand_angle, cand_valid, q_img, q_ang,
                          mask=None, seeds=None, keep: float = 1.0,
                          interpret: bool = False, shared_prng: bool = False):
    B, MC, D = cand_img.shape
    A = cand_angle.shape[-1]
    K1 = MC + 1
    Bp = ((B + G - 1) // G) * G
    mask_mode = "ext" if mask is not None else (
        ("prng_shared" if shared_prng else "prng") if seeds is not None else "none")

    img = _pad_b(cand_img, Bp)
    ang = _pad_b(cand_angle.astype(cand_img.dtype), Bp)
    valid = _pad_b(cand_valid.astype(jnp.int32), Bp)
    qi = _pad_b(q_img.astype(jnp.float32), Bp)
    qa = _pad_b(q_ang.astype(jnp.float32), Bp)
    seeds_in = (seeds if seeds is not None
                else jnp.zeros(B, jnp.int32))
    seeds_in = _pad_b(seeds_in, Bp)
    mask_in = (_pad_b(mask, Bp) if mask_mode == "ext"
               else jnp.zeros((1, 1), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // G,),
        in_specs=_specs(MC, D, A, K1, mask_mode, bwd=False),
        out_specs=pl.BlockSpec((G, K1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    logits = pl.pallas_call(
        functools.partial(_fwd_kernel, keep, mask_mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, K1), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else None,
    )(seeds_in, img, ang, valid, qi, qa, mask_in)
    return logits[:B]


@functools.partial(jax.jit, static_argnames=("keep", "interpret", "shared_prng"))
def cand_score_bwd_pallas(cand_img, cand_angle, cand_valid, d_logits,
                          mask=None, seeds=None, keep: float = 1.0,
                          interpret: bool = False, shared_prng: bool = False):
    B, MC, D = cand_img.shape
    A = cand_angle.shape[-1]
    K1 = MC + 1
    Bp = ((B + G - 1) // G) * G
    mask_mode = "ext" if mask is not None else (
        ("prng_shared" if shared_prng else "prng") if seeds is not None else "none")

    img = _pad_b(cand_img, Bp)
    ang = _pad_b(cand_angle.astype(cand_img.dtype), Bp)
    valid = _pad_b(cand_valid.astype(jnp.int32), Bp)
    dlog = _pad_b(d_logits.astype(jnp.float32), Bp)
    seeds_in = (seeds if seeds is not None else jnp.zeros(B, jnp.int32))
    seeds_in = _pad_b(seeds_in, Bp)
    mask_in = (_pad_b(mask, Bp) if mask_mode == "ext"
               else jnp.zeros((1, 1), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // G,),
        in_specs=_specs(MC, D, A, K1, mask_mode, bwd=True),
        out_specs=[
            pl.BlockSpec((G, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, A), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    dqi, dqa = pl.pallas_call(
        functools.partial(_bwd_kernel, keep, mask_mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, A), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else None,
    )(seeds_in, img, ang, valid, dlog, mask_in)
    return dqi[:B], dqa[:B]
