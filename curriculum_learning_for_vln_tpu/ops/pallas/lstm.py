"""Pallas TPU kernel: fused LSTM cell.

Fuses the two gate matmuls (MXU) with the gate nonlinearities and state
update (VPU) in one kernel, tiled over the hidden dimension so each grid
step streams one [Din, 4, TH] weight block through VMEM and writes one
[B, TH] tile of (h', c') — no [B, 4H] gates round-trip to HBM.

Weights are viewed as [Din, 4, H] (gate-major split of torch's packed
[Din, 4H] layout, order i/f/g/o) so a single BlockSpec covers all four
gate column groups of a hidden tile.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, h_ref, c_ref, wih_ref, whh_ref, b_ref, h_out_ref, c_out_ref):
    x = x_ref[:]
    h = h_ref[:]
    B = x.shape[0]
    TH = c_ref.shape[-1]

    wih = wih_ref[:].reshape(x.shape[-1], 4 * TH)
    whh = whh_ref[:].reshape(h.shape[-1], 4 * TH)
    gates = (
        jnp.dot(x, wih, preferred_element_type=jnp.float32)
        + jnp.dot(h, whh, preferred_element_type=jnp.float32)
        + b_ref[:].reshape(4 * TH)
    ).reshape(B, 4, TH)

    i = jax.nn.sigmoid(gates[:, 0, :])
    f = jax.nn.sigmoid(gates[:, 1, :])
    g = jnp.tanh(gates[:, 2, :])
    o = jax.nn.sigmoid(gates[:, 3, :])
    c_new = f * c_ref[:].astype(jnp.float32) + i * g
    h_out_ref[:] = (o * jnp.tanh(c_new)).astype(h_out_ref.dtype)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_cell_pallas(
    x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
    w_ih: jnp.ndarray, w_hh: jnp.ndarray, b: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, Din = x.shape
    H = h.shape[-1]
    # choose the hidden tile so the per-step VMEM working set stays under
    # the 16 MB limit: the weight blocks dominate ((Din + H) * 4 * TH * 4B)
    # and Mosaic double-buffers every input block, hence the ~5.5 MB budget
    budget = int(5.5 * 1024 * 1024)
    max_th = max(128, budget // ((Din + H) * 4 * 4))
    TH = min(H, 256)
    while TH > 128 and TH > max_th:
        TH //= 2
    while H % TH != 0 and TH > 8:
        TH //= 2
    assert H % TH == 0, f"hidden {H} not divisible by tile {TH}"
    grid = (H // TH,)

    wih3 = w_ih.reshape(Din, 4, H)
    whh3 = w_hh.reshape(H, 4, H)
    b2 = b.reshape(4, H)

    h_new, c_new = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, Din), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TH), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Din, 4, TH), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4, TH), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TH), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, TH), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TH), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H), h.dtype),
            jax.ShapeDtypeStruct((B, H), c.dtype),
        ],
        interpret=interpret,
    )(x, h, c, wih3, whh3, b2)
    return h_new, c_new
