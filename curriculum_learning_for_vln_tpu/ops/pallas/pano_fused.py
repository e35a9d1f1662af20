"""Pallas TPU kernels: fused panorama gather + env-dropout + visual attention.

The EnvDrop rollout's dominant per-step HBM traffic is the panorama
chain: XLA materializes the [B, 36, D] feature gather, the [B, 36, F]
concat, the post-dropout copy, re-reads it in both attention einsums,
and separately materializes the candidate take_along_axis — ~60 MB/step
against an irreducible ~14 MB (measured 63 us/step forward on v5e,
scripts/perf_ablate.py).  These kernels stream each sample's
``features[node]`` rows HBM->VMEM once (G samples per grid step,
double-buffered manual DMA — the round-1 per-sample-grid kernel lost
4.4x to DMA latency serialization; postmortem in BASELINE.md) and emit
only the small results:

  forward:   s = [feat*m/keep ; loc] . tv ; a = softmax(s)
             vis = a^T [feat*m/keep ; loc]         -> (vis, a, cand rows)
  backward:  d_a = [feat*m/keep ; loc] . d_vis ; d_s = softmax_vjp(a, d_a)
             d_tv = d_s^T [feat*m/keep ; loc]      -> (d_tv, cand rows)

which is exactly the EnvDrop visual SoftDot (context_only) over the
observation panorama (ref: policy.py:235, units.py:100-118) fused with
observe()'s gather + candidate extraction (env/env.py) and the
environmental dropout (policy.py:226-229).  Two mask modes: ``mask``
passes externally generated ``make_keep_mask`` bits (bit-identical to
the XLA path, for parity testing), ``seeds`` draws the mask from the
in-kernel hardware PRNG — one deterministic draw per grid-step group, so
nothing mask-sized ever touches HBM and the backward regenerates the
forward's exact bits from the same seed.  The kernel replicates the XLA
path's bf16 rounding of the dropped features before the f32
accumulation, and the whole group's math runs as [G, Vp, .] tensor
passes (a per-sample row-oriented loop serialized ~8 small VPU chains
per grid step — measured 2x slower).

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

import os as _os

G = int(_os.environ.get("VLN_PANO_G", "8"))  # samples per grid step (B is
# padded to a multiple of G).  8 measured best vs 4 in round 2; 16 is the
# next candidate (fewer grid steps, deeper DMA overlap) — env-overridable
# for A/B without a code edit.


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


def _emit_cands(g, fg, oh_ref, cand_ref):
    """Emit the candidate view rows via a one-hot MXU matmul — replaces
    observe()'s take_along_axis over the materialized gather.  (A direct
    dynamic-sublane vector load is rejected by Mosaic: the row index
    cannot be proven 8-aligned; onehot @ rows is alignment-free and
    bit-exact through f32.  The [MC, Vp] one-hot matrices are built
    OUTSIDE the kernel — building them in-kernel from prefetched scalars
    cost ~40 us/step of serialized row writes.)"""
    rows = jax.lax.dot_general(
        oh_ref[g], fg.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cand_ref[g] = rows.astype(cand_ref.dtype)


def _group_inputs(mask_mode, keep, mask_ref, seeds_sp, i, feat_buf, slot,
                  loc_ref, views_sp, loc_scr):
    """Batched per-group tensors: dropped features [G, Vp, D] f32 and the
    per-sample view-location rows [G, Vp, A] f32.  All G samples proceed
    through one set of [G, Vp, .] tensor ops — the per-sample row-oriented
    loop serialized ~8 small VPU chains per grid step (measured ~37
    us/step floor; batched, the same math is a few large VPU passes)."""
    fg_all = feat_buf[slot]                                      # [G, Vp, D]
    if mask_mode == "ext":
        mask = mask_ref[:]
    elif mask_mode == "prng":
        # one draw per grid step (seeded by the group's first sample) —
        # fwd and bwd regenerate identical bits from the same seed
        mask = _prng_keep_mask(seeds_sp[i * G], fg_all.shape, keep)
    elif mask_mode == "prng_shared":
        # ONE [Vp, D] draw shared by the whole group (broadcast over G):
        # 8x less PRNG work — the draw was ~20 us/step of the kernel.
        # Group-correlated masks are the reference's own back-translation
        # semantics (batch-shared drop noise, envdrop.py:105-121); the
        # full-budget A/B (BASELINE.md) showed realization-insensitivity.
        mask = _prng_keep_mask(seeds_sp[i * G], fg_all.shape[1:], keep)[None]
    else:
        mask = None
    fgd_all = _dropped(fg_all, mask, keep)                       # [G, Vp, D] f32
    for g in range(G):
        loc_scr[g] = loc_ref[views_sp[i * G + g]]
    lg_all = loc_scr[:].astype(jnp.float32)                      # [G, Vp, A]
    return fgd_all, lg_all


def _fwd_kernel(keep, mask_mode, MC, V, nodes_sp, views_sp, seeds_sp,
                feat_hbm, loc_ref, oh_ref, tvi_ref, tva_ref, mask_ref,
                oimg_ref, oang_ref, alpha_ref, cand_ref, loc_scr, feat_buf,
                sems):
    i = pl.program_id(0)
    slot = _pipeline(i, feat_hbm, nodes_sp, feat_buf, sems)

    for g in range(G):
        _emit_cands(g, feat_buf[slot, g], oh_ref, cand_ref)

    fgd_all, lg_all = _group_inputs(mask_mode, keep, mask_ref, seeds_sp, i,
                                    feat_buf, slot, loc_ref, views_sp, loc_scr)
    tvi = tvi_ref[:].astype(jnp.float32)[:, None, :]             # [G, 1, D]
    tva = tva_ref[:].astype(jnp.float32)[:, None, :]             # [G, 1, A]

    s = jnp.sum(fgd_all * tvi, axis=2) + jnp.sum(lg_all * tva, axis=2)
    pad_cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= V
    s = jnp.where(pad_cols, -1e30, s)                            # [G, Vp]
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    a = e / jnp.sum(e, axis=1, keepdims=True)                    # [G, Vp]

    oimg_ref[:] = jnp.sum(fgd_all * a[:, :, None], axis=1)
    oang_ref[:] = jnp.sum(lg_all * a[:, :, None], axis=1)
    alpha_ref[:] = a


def _bwd_kernel(keep, mask_mode, MC, V, nodes_sp, views_sp, seeds_sp,
                feat_hbm, loc_ref, oh_ref, alpha_ref, dimg_ref, dang_ref,
                mask_ref, dtvi_ref, dtva_ref, cand_ref, loc_scr, feat_buf,
                sems):
    i = pl.program_id(0)
    slot = _pipeline(i, feat_hbm, nodes_sp, feat_buf, sems)

    for g in range(G):
        _emit_cands(g, feat_buf[slot, g], oh_ref, cand_ref)

    fgd_all, lg_all = _group_inputs(mask_mode, keep, mask_ref, seeds_sp, i,
                                    feat_buf, slot, loc_ref, views_sp, loc_scr)
    a = alpha_ref[:]                                             # [G, Vp]
    dvi = dimg_ref[:].astype(jnp.float32)[:, None, :]            # [G, 1, D]
    dva = dang_ref[:].astype(jnp.float32)[:, None, :]            # [G, 1, A]

    d_a = jnp.sum(fgd_all * dvi, axis=2) + jnp.sum(lg_all * dva, axis=2)
    inner = jnp.sum(a * d_a, axis=1, keepdims=True)              # [G, 1]
    d_s = a * (d_a - inner)                                      # [G, Vp]

    dtvi_ref[:] = jnp.sum(fgd_all * d_s[:, :, None], axis=1)
    dtva_ref[:] = jnp.sum(lg_all * d_s[:, :, None], axis=1)


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
    if interpret and mask_mode.startswith("prng"):
        return pltpu.InterpretParams()
    return interpret


def _mask_spec(with_mask, V, D):
    if with_mask:
        return _sized((G, V, D))
    return pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=("keep", "interpret", "shared_prng"))
def pano_attend_fwd_pallas(nodes, views, cand_view, features, loc_embed,
                           tv_img, tv_ang, mask=None, seeds=None,
                           keep: float = 1.0, interpret: bool = False,
                           shared_prng: bool = False):
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
    mask_mode = "ext" if mask is not None else (
        ("prng_shared" if shared_prng else "prng") if seeds is not None else "none")

    nodes_p = _pad_rows(nodes.astype(jnp.int32), Bp)
    views_p = _pad_rows(views.astype(jnp.int32), Bp)
    oh_p = _pad_rows(jax.nn.one_hot(cand_view, Vp, dtype=jnp.float32), Bp)
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
        num_scalar_prefetch=3,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((V, Vp, A), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            _sized((G, MC, Vp)),
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
            pltpu.VMEM((G, Vp, A), loc_embed.dtype),
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
    )(nodes_p, views_p, seeds_p, features, loc_p, oh_p, tvi_p, tva_p, mask_p)
    return oimg[:B], oang[:B], alpha[:B, :V], cand[:B]


@functools.partial(jax.jit, static_argnames=("keep", "interpret", "shared_prng"))
def pano_attend_bwd_pallas(nodes, views, cand_view, features, loc_embed,
                           alpha, d_img, d_ang, mask=None, seeds=None,
                           keep: float = 1.0, interpret: bool = False,
                           shared_prng: bool = False):
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
    mask_mode = "ext" if mask is not None else (
        ("prng_shared" if shared_prng else "prng") if seeds is not None else "none")

    nodes_p = _pad_rows(nodes.astype(jnp.int32), Bp)
    views_p = _pad_rows(views.astype(jnp.int32), Bp)
    oh_p = _pad_rows(jax.nn.one_hot(cand_view, Vp, dtype=jnp.float32), Bp)
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
        num_scalar_prefetch=3,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((V, Vp, A), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            _sized((G, MC, Vp)),
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
            pltpu.VMEM((G, Vp, A), loc_embed.dtype),
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
    )(nodes_p, views_p, seeds_p, features, loc_p, oh_p, alpha_p, dimg_p,
      dang_p, mask_p)
    return dtvi[:B], dtva[:B], cand[:B]
