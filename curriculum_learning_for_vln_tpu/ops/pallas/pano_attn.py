"""Pallas TPU kernel: fused panorama gather + visual attention.

The rollout's heaviest HBM traffic is the per-step panorama path: XLA
materializes the [B, 36, D] feature gather, then the visual attention
re-reads it (~3x the minimal traffic).  This kernel uses scalar-prefetched
node/view indices so the pipeline DMAs each sample's ``features[node]``
rows HBM->VMEM directly and emits only the attention-weighted
[B, D+128] feature:

    scores_j = feat[node, j] . t_img + loc_embed[view, j] . t_ang
    attn     = softmax(scores)
    out      = concat(attn^T feat[node], attn^T loc_embed[view])

which is exactly the EnvDrop visual SoftDot (context_only) over the
observation's pano_feat (ref: policy.py:235, units.py:100-118) fused with
the observe() gather (env/env.py).  Forward-only at the Pallas level; the
wrapper in ops/fused.py adds a custom VJP whose backward re-runs the XLA
formulation.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nodes_ref, views_ref, feat_ref, loc_ref, t_img_ref, t_ang_ref,
            out_img_ref, out_ang_ref):
    # elementwise-multiply + lane/sublane reductions only: Mosaic rejects
    # reshapes/transposes here ("offset change")
    f = feat_ref[0].astype(jnp.float32)        # [36, D]
    le = loc_ref[0].astype(jnp.float32)        # [36, A]
    t_img = t_img_ref[0].astype(jnp.float32)   # [1, D]
    t_ang = t_ang_ref[0].astype(jnp.float32)   # [1, A]

    scores = (jnp.sum(f * t_img, axis=1, keepdims=True)
              + jnp.sum(le * t_ang, axis=1, keepdims=True))   # [36, 1]
    attn = jax.nn.softmax(scores, axis=0)                     # [36, 1]
    out_img_ref[0] = jnp.sum(f * attn, axis=0, keepdims=True).astype(out_img_ref.dtype)
    out_ang_ref[0] = jnp.sum(le * attn, axis=0, keepdims=True).astype(out_ang_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pano_attend_pallas(
    nodes: jnp.ndarray,      # [B] int32 global node ids
    views: jnp.ndarray,      # [B] int32 view indices (0..35)
    features: jnp.ndarray,   # [N, 36, D] feature table
    loc_embed: jnp.ndarray,  # [36, 36, A] per-view location embeddings
    target: jnp.ndarray,     # [B, D + A] projected attention queries
    interpret: bool = False,
) -> jnp.ndarray:
    B = nodes.shape[0]
    N, V, D = features.shape
    A = loc_embed.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            # per-sample feature rows: block index driven by prefetched ids
            pl.BlockSpec((1, V, D), lambda b, nodes, views: (nodes[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, A), lambda b, nodes, views: (views[b], 0, 0),
                         memory_space=pltpu.VMEM),
            # split query into img/angle parts: no in-kernel offset slicing
            # (Mosaic "offset change" limitation); singleton middle axis so
            # block dims equal the array dims (TPU (8,128) tiling rule)
            pl.BlockSpec((1, 1, D), lambda b, nodes, views: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, A), lambda b, nodes, views: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D), lambda b, nodes, views: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, A), lambda b, nodes, views: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_img, out_ang = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D), target.dtype),
            jax.ShapeDtypeStruct((B, 1, A), target.dtype),
        ],
        interpret=interpret,
    )(nodes.astype(jnp.int32), views.astype(jnp.int32), features, loc_embed,
      target[:, None, :D], target[:, None, D:])
    return jnp.concatenate([out_img[:, 0, :], out_ang[:, 0, :]], axis=-1)
