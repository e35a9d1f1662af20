"""Fused observation ops with XLA fallbacks and training-safe VJPs.

``pano_attend`` computes the EnvDrop-style visual attention over a
sample's panorama *without materializing the [B, 36, D] gather*: under
the "pallas" backend the forward runs the fused DMA kernel
(ops/pallas/pano_attn.py); the backward (and the default backend) use the
plain XLA formulation, which is what the training path differentiates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import rnn as rnn_ops


def pano_attend_xla(nodes, views, features, loc_embed, target):
    """Reference formulation: gather then soft-dot (context_only)."""
    D = features.shape[-1]
    f = features[nodes].astype(target.dtype)          # [B, 36, D]
    le = loc_embed[views].astype(target.dtype)        # [B, 36, A]
    pano = jnp.concatenate([f, le], axis=-1)          # [B, 36, D+A]
    scores = jnp.einsum("bvd,bd->bv", pano, target)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bv,bvd->bd", attn, pano), attn


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _pano_attend_fused(nodes, views, features, loc_embed, target):
    from .pallas.pano_attn import pano_attend_pallas

    return pano_attend_pallas(nodes, views, features, loc_embed, target)


def _fused_fwd(nodes, views, features, loc_embed, target):
    out = _pano_attend_fused(nodes, views, features, loc_embed, target)
    return out, (nodes, views, features, loc_embed, target)


def _fused_bwd(res, g):
    nodes, views, features, loc_embed, target = res
    _, vjp = jax.vjp(lambda t: pano_attend_xla(nodes, views, features, loc_embed, t)[0], target)
    (d_target,) = vjp(g)
    # world tables are constants of the program: zero cotangents
    return (None, None, jnp.zeros_like(features), jnp.zeros_like(loc_embed), d_target)


_pano_attend_fused.defvjp(_fused_fwd, _fused_bwd)


def pano_attend(nodes, views, features, loc_embed, target, with_attn: bool = False):
    """Attention-weighted panorama feature [B, D+A] for each (node, view).

    ``with_attn`` forces the XLA path (the fused kernel does not emit the
    attention matrix)."""
    if with_attn or rnn_ops.get_backend() != "pallas":
        out, attn = pano_attend_xla(nodes, views, features, loc_embed, target)
        return (out, attn) if with_attn else out
    return _pano_attend_fused(nodes, views, features, loc_embed, target)
