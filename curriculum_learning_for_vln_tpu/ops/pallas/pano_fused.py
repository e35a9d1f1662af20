"""Pallas TPU kernels: fused panorama gather + env-dropout + visual attention.

The EnvDrop rollout's dominant per-step HBM traffic is the panorama
chain: XLA materializes the [B, 36, D] feature gather, the [B, 36, F]
concat, the post-dropout copy, and then the two attention einsums re-read
it — ~60 MB/step against an irreducible ~14 MB (measured 63 us/step on
v5e, scripts/perf_ablate.py).  These kernels stream each sample's
``features[node]`` rows HBM->VMEM directly (G samples per grid step,
double-buffered manual DMA — the round-1 per-sample-grid kernel lost 4.4x
to DMA latency serialization, ops/pallas/pano_attn.py), apply the
dropout mask, and emit only the attention outputs:

  forward:   s = [feat*m/keep ; loc] . tv ; a = softmax(s)
             vis = a^T [feat*m/keep ; loc],       -> (vis, a)
  backward:  d_a = [feat*m/keep ; loc] . d_vis ; d_s = softmax_vjp(a, d_a)
             d_tv = d_s^T [feat*m/keep ; loc]     -> d_tv

which is exactly the EnvDrop visual SoftDot (context_only) over the
observation panorama (ref: policy.py:235, units.py:100-118) fused with
the observe() gather (env/env.py:99-101) and the environmental dropout
(policy.py:226-229).  The dropout mask is generated *outside* (same
``make_keep_mask`` bits as the XLA path) so fused and unfused paths use
identical masks; the kernel replicates the XLA path's bf16 rounding of
the dropped features before the f32 accumulation.

The world tables carry no gradient, so the backward needs no d(features)
— only d_tv, the [B, F] query cotangent (see ops/bptt.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 8  # samples per grid step (B is padded to a multiple of G)


def _dropped(fg, mask_g, keep: float):
    """bf16-rounded inverted dropout, then f32 — bit-matches the XLA path's
    dropout(...).astype(bf16) followed by the einsum's f32 upcast."""
    if mask_g is None:
        return fg.astype(jnp.float32)
    return jnp.where(mask_g, fg / keep, 0.0).astype(fg.dtype).astype(jnp.float32)


def _wait_group(feat_hbm, nodes_sp, feat_buf, sems, step, slot):
    for g in range(G):
        pltpu.make_async_copy(
            feat_hbm.at[nodes_sp[step * G + g]], feat_buf.at[slot, g], sems.at[slot, g]
        ).wait()


def _start_group(feat_hbm, nodes_sp, feat_buf, sems, step, slot):
    for g in range(G):
        pltpu.make_async_copy(
            feat_hbm.at[nodes_sp[step * G + g]], feat_buf.at[slot, g], sems.at[slot, g]
        ).start()


def _pipeline(i, feat_hbm, nodes_sp, feat_buf, sems):
    """Double-buffered group DMA: returns the VMEM slot holding group i."""
    nsteps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        _start_group(feat_hbm, nodes_sp, feat_buf, sems, 0, 0)

    @pl.when(i + 1 < nsteps)
    def _():
        _start_group(feat_hbm, nodes_sp, feat_buf, sems, i + 1, (i + 1) % 2)

    slot = i % 2
    _wait_group(feat_hbm, nodes_sp, feat_buf, sems, i, slot)
    return slot


def _fwd_kernel(keep, with_mask, nodes_sp, views_sp, feat_hbm, loc_ref,
                tvi_ref, tva_ref, mask_ref, oimg_ref, oang_ref, alpha_ref,
                feat_buf, sems):
    i = pl.program_id(0)
    slot = _pipeline(i, feat_hbm, nodes_sp, feat_buf, sems)

    for g in range(G):
        fg = feat_buf[slot, g]                                   # [36, D]
        mg = mask_ref[g] if with_mask else None
        fgd = _dropped(fg, mg, keep)                             # [36, D] f32
        lg = loc_ref[views_sp[i * G + g]].astype(jnp.float32)    # [36, A]
        tvi = tvi_ref[g:g + 1, :].astype(jnp.float32)            # [1, D]
        tva = tva_ref[g:g + 1, :].astype(jnp.float32)            # [1, A]

        s = (jnp.sum(fgd * tvi, axis=1, keepdims=True)
             + jnp.sum(lg * tva, axis=1, keepdims=True))         # [36, 1]
        s = s - jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s)
        a = e / jnp.sum(e, axis=0, keepdims=True)                # [36, 1]

        oimg_ref[g:g + 1, :] = jnp.sum(fgd * a, axis=0, keepdims=True)
        oang_ref[g:g + 1, :] = jnp.sum(lg * a, axis=0, keepdims=True)
        alpha_ref[:, g:g + 1] = a


def _bwd_kernel(keep, with_mask, nodes_sp, views_sp, feat_hbm, loc_ref,
                alpha_ref, dimg_ref, dang_ref, mask_ref, dtvi_ref, dtva_ref,
                feat_buf, sems):
    i = pl.program_id(0)
    slot = _pipeline(i, feat_hbm, nodes_sp, feat_buf, sems)

    for g in range(G):
        fg = feat_buf[slot, g]
        mg = mask_ref[g] if with_mask else None
        fgd = _dropped(fg, mg, keep)
        lg = loc_ref[views_sp[i * G + g]].astype(jnp.float32)
        a = alpha_ref[:, g:g + 1]                                # [36, 1]
        dvi = dimg_ref[g:g + 1, :].astype(jnp.float32)           # [1, D]
        dva = dang_ref[g:g + 1, :].astype(jnp.float32)           # [1, A]

        d_a = (jnp.sum(fgd * dvi, axis=1, keepdims=True)
               + jnp.sum(lg * dva, axis=1, keepdims=True))       # [36, 1]
        inner = jnp.sum(a * d_a, axis=0, keepdims=True)          # [1, 1]
        d_s = a * (d_a - inner)                                  # [36, 1]

        dtvi_ref[g:g + 1, :] = jnp.sum(fgd * d_s, axis=0, keepdims=True)
        dtva_ref[g:g + 1, :] = jnp.sum(lg * d_s, axis=0, keepdims=True)


def _pad_rows(x, n):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _common_specs(with_mask, V, D, A, n_extra):
    """in_specs shared tail: feat table (HBM), loc table (VMEM-resident),
    then n_extra per-group [G, .] blocks, then the optional mask block."""
    row = lambda i, n, v: (i, 0)
    specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((36, V, A), lambda i, n, v: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    specs += [pl.BlockSpec(None, row, memory_space=pltpu.VMEM)] * n_extra
    if with_mask:
        specs += [pl.BlockSpec((G, V, D), lambda i, n, v: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
    else:
        specs += [pl.BlockSpec((1, 1), lambda i, n, v: (0, 0),
                               memory_space=pltpu.SMEM)]
    return specs


def _sized(shape):
    return pl.BlockSpec(shape, lambda i, n, v: tuple([i] + [0] * (len(shape) - 1)),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("keep", "interpret"))
def pano_attend_fwd_pallas(nodes, views, features, loc_embed, tv_img, tv_ang,
                           mask=None, keep: float = 1.0, interpret: bool = False):
    """Returns (vis_img [B, D] f32, vis_ang [B, A] f32, alpha [B, 36] f32)."""
    B = nodes.shape[0]
    N, V, D = features.shape
    A = loc_embed.shape[-1]
    Bp = ((B + G - 1) // G) * G
    with_mask = mask is not None

    nodes_p = _pad_rows(nodes.astype(jnp.int32), Bp)
    views_p = _pad_rows(views.astype(jnp.int32), Bp)
    tvi_p = _pad_rows(tv_img, Bp)
    tva_p = _pad_rows(tv_ang, Bp)
    mask_p = _pad_rows(mask, Bp) if with_mask else jnp.zeros((1, 1), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((36, V, A), lambda i, n, v: (0, 0, 0), memory_space=pltpu.VMEM),
            _sized((G, D)),
            _sized((G, A)),
            _sized((G, V, D)) if with_mask else pl.BlockSpec(
                (1, 1), lambda i, n, v: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _sized((G, D)),
            _sized((G, A)),
            pl.BlockSpec((V, G), lambda i, n, v: (0, i), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G, V, D), features.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    oimg, oang, alpha_t = pl.pallas_call(
        functools.partial(_fwd_kernel, keep, with_mask),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, A), jnp.float32),
            jax.ShapeDtypeStruct((V, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(nodes_p, views_p, features, loc_embed, tvi_p, tva_p, mask_p)
    return oimg[:B], oang[:B], alpha_t.T[:B]


@functools.partial(jax.jit, static_argnames=("keep", "interpret"))
def pano_attend_bwd_pallas(nodes, views, features, loc_embed, alpha, d_img,
                           d_ang, mask=None, keep: float = 1.0,
                           interpret: bool = False):
    """Returns (d_tv_img [B, D] f32, d_tv_ang [B, A] f32)."""
    B = nodes.shape[0]
    N, V, D = features.shape
    A = loc_embed.shape[-1]
    Bp = ((B + G - 1) // G) * G
    with_mask = mask is not None

    nodes_p = _pad_rows(nodes.astype(jnp.int32), Bp)
    views_p = _pad_rows(views.astype(jnp.int32), Bp)
    alpha_p = _pad_rows(alpha.astype(jnp.float32), Bp).T  # [V, Bp]
    dimg_p = _pad_rows(d_img, Bp)
    dang_p = _pad_rows(d_ang, Bp)
    mask_p = _pad_rows(mask, Bp) if with_mask else jnp.zeros((1, 1), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((36, V, A), lambda i, n, v: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, G), lambda i, n, v: (0, i), memory_space=pltpu.VMEM),
            _sized((G, D)),
            _sized((G, A)),
            _sized((G, V, D)) if with_mask else pl.BlockSpec(
                (1, 1), lambda i, n, v: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _sized((G, D)),
            _sized((G, A)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G, V, D), features.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    dtvi, dtva = pl.pallas_call(
        functools.partial(_bwd_kernel, keep, with_mask),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, A), jnp.float32),
        ],
        interpret=interpret,
    )(nodes_p, views_p, features, loc_embed, alpha_p, dimg_p, dang_p, mask_p)
    return dtvi[:B], dtva[:B]
