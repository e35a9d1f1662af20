"""Pallas TPU kernels: fused panorama gather + env-dropout + visual attention.

The EnvDrop rollout's dominant per-step HBM traffic is the panorama
chain: XLA materializes the [B, 36, D] feature gather, the [B, 36, F]
concat, the post-dropout copy, re-reads it in both attention einsums,
and separately materializes the candidate take_along_axis — ~60 MB/step
against an irreducible ~14 MB (measured 63 us/step forward on v5e,
scripts/perf_ablate.py).  These kernels stream each sample's
``features[node]`` rows HBM->VMEM once (G samples per grid step,
double-buffered manual DMA — the round-1 per-sample-grid kernel lost
4.4x to DMA latency serialization, ops/pallas/pano_attn.py) and emit
only the small results:

  forward:   s = [feat*m/keep ; loc] . tv ; a = softmax(s)
             vis = a^T [feat*m/keep ; loc]         -> (vis, a, cand rows)
  backward:  d_a = [feat*m/keep ; loc] . d_vis ; d_s = softmax_vjp(a, d_a)
             d_tv = d_s^T [feat*m/keep ; loc]      -> (d_tv, cand rows)

which is exactly the EnvDrop visual SoftDot (context_only) over the
observation panorama (ref: policy.py:235, units.py:100-118) fused with
observe()'s gather + candidate extraction (env/env.py) and the
environmental dropout (policy.py:226-229).  The dropout mask is
generated *outside* (same ``make_keep_mask`` bits as the XLA path) so
fused and unfused paths use identical masks; the kernel replicates the
XLA path's bf16 rounding of the dropped features before the f32
accumulation.  Per-sample math is row-oriented `dot_general` (no
transposes/reshapes — Mosaic rejects those; [1, 36]/[G, 36] rows keep
the last block dims (8k, 128k-or-full)-legal).

The world tables carry no gradient, so the backward needs no
d(features) — only d_tv, the [B, F] query cotangent (see
ops/fused_obs.py for the custom-VJP wrapper).
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


def _prng_keep_mask(seed, shape, keep: float):
    """In-kernel keep-mask from the TPU hardware PRNG: deterministic per
    seed, so the backward kernel regenerates the forward's exact bits
    without any mask living in HBM (saves ~20 MB/step of generate + pad +
    read traffic vs an external mask)."""
    pltpu.prng_seed(seed)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thr = min(int(keep * 4294967296.0), 4294967295)
    return bits < jnp.uint32(thr)


def _row_dot(a, b):
    """[1, K] x [V, K] -> [1, V] (contract trailing dims, no transpose op)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _row_mix(a, b):
    """[1, V] x [V, K] -> [1, K]."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


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
    for g in range(G):
        pltpu.make_async_copy(
            feat_hbm.at[nodes_sp[i * G + g]], feat_buf.at[slot, g], sems.at[slot, g]
        ).wait()
    return slot


def _emit_cands(i, g, MC, V, cview_sp, fg, oh_ref, cand_ref):
    """Emit the candidate view rows via a one-hot MXU matmul — replaces
    observe()'s take_along_axis over the materialized gather.  (A direct
    dynamic-sublane vector load is rejected by Mosaic: the row index
    cannot be proven 8-aligned; onehot @ rows is alignment-free and
    bit-exact through f32.)"""
    for j in range(MC):
        cv = cview_sp[(i * G + g) * MC + j]
        oh_ref[j:j + 1, :] = (
            jax.lax.broadcasted_iota(jnp.int32, (1, V), 1) == cv
        ).astype(jnp.float32)
    rows = jax.lax.dot_general(
        oh_ref[:], fg.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cand_ref[g] = rows.astype(cand_ref.dtype)


def _mask_for(mask_mode, keep, mask_ref, seeds_sp, idx, g, shape):
    if mask_mode == "ext":
        return mask_ref[g]
    if mask_mode == "prng":
        return _prng_keep_mask(seeds_sp[idx], shape, keep)
    return None


def _fwd_kernel(keep, mask_mode, MC, V, nodes_sp, views_sp, cview_sp, seeds_sp,
                feat_hbm, loc_ref, tvi_ref, tva_ref, mask_ref, oimg_ref,
                oang_ref, alpha_ref, cand_ref, oh_ref, feat_buf, sems):
    i = pl.program_id(0)
    slot = _pipeline(i, feat_hbm, nodes_sp, feat_buf, sems)
    Vp = feat_buf.shape[2]
    pad_cols = jax.lax.broadcasted_iota(jnp.int32, (1, Vp), 1) >= V

    for g in range(G):
        fg = feat_buf[slot, g]                                   # [Vp, D]
        _emit_cands(i, g, MC, Vp, cview_sp, fg, oh_ref, cand_ref)
        mg = _mask_for(mask_mode, keep, mask_ref, seeds_sp, i * G + g, g, fg.shape)
        fgd = _dropped(fg, mg, keep)                             # [Vp, D] f32
        lg = loc_ref[views_sp[i * G + g]].astype(jnp.float32)    # [Vp, A]
        tvi = tvi_ref[g:g + 1, :].astype(jnp.float32)            # [1, D]
        tva = tva_ref[g:g + 1, :].astype(jnp.float32)            # [1, A]

        s = _row_dot(tvi, fgd) + _row_dot(tva, lg)               # [1, Vp]
        s = jnp.where(pad_cols, -1e30, s)                        # mask pad rows
        s = s - jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s)
        a = e / jnp.sum(e, axis=1, keepdims=True)                # [1, Vp]

        oimg_ref[g:g + 1, :] = _row_mix(a, fgd)
        oang_ref[g:g + 1, :] = _row_mix(a, lg)
        alpha_ref[g:g + 1, :] = a


def _bwd_kernel(keep, mask_mode, MC, V, nodes_sp, views_sp, cview_sp, seeds_sp,
                feat_hbm, loc_ref, alpha_ref, dimg_ref, dang_ref, mask_ref,
                dtvi_ref, dtva_ref, cand_ref, oh_ref, feat_buf, sems):
    i = pl.program_id(0)
    slot = _pipeline(i, feat_hbm, nodes_sp, feat_buf, sems)
    Vp = feat_buf.shape[2]

    for g in range(G):
        fg = feat_buf[slot, g]
        _emit_cands(i, g, MC, Vp, cview_sp, fg, oh_ref, cand_ref)
        mg = _mask_for(mask_mode, keep, mask_ref, seeds_sp, i * G + g, g, fg.shape)
        fgd = _dropped(fg, mg, keep)
        lg = loc_ref[views_sp[i * G + g]].astype(jnp.float32)
        a = alpha_ref[g:g + 1, :]                                # [1, 36]
        dvi = dimg_ref[g:g + 1, :].astype(jnp.float32)           # [1, D]
        dva = dang_ref[g:g + 1, :].astype(jnp.float32)           # [1, A]

        d_a = _row_dot(dvi, fgd) + _row_dot(dva, lg)             # [1, 36]
        inner = jnp.sum(a * d_a, axis=1, keepdims=True)          # [1, 1]
        d_s = a * (d_a - inner)                                  # [1, 36]

        dtvi_ref[g:g + 1, :] = _row_mix(d_s, fgd)
        dtva_ref[g:g + 1, :] = _row_mix(d_s, lg)


def _pad_rows(x, n):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _sized(shape):
    return pl.BlockSpec(shape, lambda i, *_: tuple([i] + [0] * (len(shape) - 1)),
                        memory_space=pltpu.VMEM)


def _interpret_arg(interpret: bool, mask_mode: str):
    """Plain interpret handles everything except the pltpu PRNG primitives;
    the TPU interpreter stubs prng_random_bits to zeros (all-keep mask), so
    CPU tests of the prng mode exercise plumbing + fwd/bwd consistency
    while real randomness stays TPU-only (seed-deterministic by design)."""
    if interpret and mask_mode == "prng":
        return pltpu.InterpretParams()
    return interpret


def _mask_spec(with_mask, V, D):
    if with_mask:
        return _sized((G, V, D))
    return pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=("keep", "interpret"))
def pano_attend_fwd_pallas(nodes, views, cand_view, features, loc_embed,
                           tv_img, tv_ang, mask=None, seeds=None,
                           keep: float = 1.0, interpret: bool = False):
    """Returns (vis_img [B, D] f32, vis_ang [B, A] f32, alpha [B, 36] f32,
    cand_img [B, MC, D] feature-dtype)."""
    B = nodes.shape[0]
    N, Vp, D = features.shape
    V = loc_embed.shape[1]          # logical view count (36)
    assert Vp % 8 == 0, "pad the feature table's view axis (device_tables)"
    A = loc_embed.shape[-1]
    MC = cand_view.shape[1]
    Bp = ((B + G - 1) // G) * G
    assert mask is None or seeds is None
    mask_mode = "ext" if mask is not None else ("prng" if seeds is not None else "none")

    nodes_p = _pad_rows(nodes.astype(jnp.int32), Bp)
    views_p = _pad_rows(views.astype(jnp.int32), Bp)
    cview_p = _pad_rows(cand_view.astype(jnp.int32), Bp).reshape(-1)
    seeds_p = (_pad_rows(seeds.astype(jnp.int32), Bp) if seeds is not None
               else jnp.zeros((Bp,), jnp.int32))
    tvi_p = _pad_rows(tv_img, Bp)
    tva_p = _pad_rows(tv_ang, Bp)
    loc_p = jnp.pad(loc_embed, ((0, 0), (0, Vp - V), (0, 0)))
    if mask_mode == "ext":
        mask_p = _pad_rows(mask, Bp)
        mask_p = jnp.pad(mask_p, ((0, 0), (0, Vp - V), (0, 0)),
                         constant_values=True)
    else:
        mask_p = jnp.zeros((1, 1), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((V, Vp, A), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            _sized((G, D)),
            _sized((G, A)),
            _mask_spec(mask_mode == "ext", Vp, D),
        ],
        out_specs=[
            _sized((G, D)),
            _sized((G, A)),
            _sized((G, Vp)),
            _sized((G, MC, D)),
        ],
        scratch_shapes=[
            pltpu.VMEM((MC, Vp), jnp.float32),
            pltpu.VMEM((2, G, Vp, D), features.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    oimg, oang, alpha, cand = pl.pallas_call(
        functools.partial(_fwd_kernel, keep, mask_mode, MC, V),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, A), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Vp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, MC, D), features.dtype),
        ],
        interpret=_interpret_arg(interpret, mask_mode),
    )(nodes_p, views_p, cview_p, seeds_p, features, loc_p, tvi_p, tva_p, mask_p)
    return oimg[:B], oang[:B], alpha[:B, :V], cand[:B]


@functools.partial(jax.jit, static_argnames=("keep", "interpret"))
def pano_attend_bwd_pallas(nodes, views, cand_view, features, loc_embed,
                           alpha, d_img, d_ang, mask=None, seeds=None,
                           keep: float = 1.0, interpret: bool = False):
    """Returns (d_tv_img [B, D] f32, d_tv_ang [B, A] f32,
    cand_img [B, MC, D] feature-dtype)."""
    B = nodes.shape[0]
    N, Vp, D = features.shape
    V = loc_embed.shape[1]
    assert Vp % 8 == 0, "pad the feature table's view axis (device_tables)"
    A = loc_embed.shape[-1]
    MC = cand_view.shape[1]
    Bp = ((B + G - 1) // G) * G
    assert mask is None or seeds is None
    mask_mode = "ext" if mask is not None else ("prng" if seeds is not None else "none")

    nodes_p = _pad_rows(nodes.astype(jnp.int32), Bp)
    views_p = _pad_rows(views.astype(jnp.int32), Bp)
    cview_p = _pad_rows(cand_view.astype(jnp.int32), Bp).reshape(-1)
    seeds_p = (_pad_rows(seeds.astype(jnp.int32), Bp) if seeds is not None
               else jnp.zeros((Bp,), jnp.int32))
    alpha_p = jnp.pad(_pad_rows(alpha.astype(jnp.float32), Bp),
                      ((0, 0), (0, Vp - V)))
    dimg_p = _pad_rows(d_img, Bp)
    dang_p = _pad_rows(d_ang, Bp)
    loc_p = jnp.pad(loc_embed, ((0, 0), (0, Vp - V), (0, 0)))
    if mask_mode == "ext":
        mask_p = jnp.pad(_pad_rows(mask, Bp), ((0, 0), (0, Vp - V), (0, 0)),
                         constant_values=True)
    else:
        mask_p = jnp.zeros((1, 1), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((V, Vp, A), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            _sized((G, Vp)),
            _sized((G, D)),
            _sized((G, A)),
            _mask_spec(mask_mode == "ext", Vp, D),
        ],
        out_specs=[
            _sized((G, D)),
            _sized((G, A)),
            _sized((G, MC, D)),
        ],
        scratch_shapes=[
            pltpu.VMEM((MC, Vp), jnp.float32),
            pltpu.VMEM((2, G, Vp, D), features.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    dtvi, dtva, cand = pl.pallas_call(
        functools.partial(_bwd_kernel, keep, mask_mode, MC, V),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, A), jnp.float32),
            jax.ShapeDtypeStruct((Bp, MC, D), features.dtype),
        ],
        interpret=_interpret_arg(interpret, mask_mode),
    )(nodes_p, views_p, cview_p, seeds_p, features, loc_p, alpha_p, dimg_p,
      dang_p, mask_p)
    return dtvi[:B], dtva[:B], cand[:B]
