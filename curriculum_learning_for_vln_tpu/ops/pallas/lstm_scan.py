"""Pallas TPU kernel: full masked LSTM scan with VMEM-resident weights.

The XLA `lax.scan` LSTM refetches the weight matrices from HBM every
timestep.  This kernel runs the whole sequence in one `pallas_call`
whose grid iterates over time: weights sit in VMEM for the entire scan
(constant index map -> fetched once), per-step inputs/outputs stream
through (B, 1, D)/(B, 1, H) blocks, and the recurrent (h, c) state lives
in VMEM scratch, which persists across sequential grid steps on TPU.

Packed-sequence masking matches ``models.core.masked_lstm``: steps at or
beyond a row's length leave the carry unchanged and write zero output;
``reverse=True`` processes t = L-1..0 via the block index maps, so the
backward direction of a BiLSTM reads only real tokens.

Forward/inference only (no custom VJP yet) — training uses the XLA path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(reverse: bool, L: int, lengths_ref, x_ref, wih_ref, whh_ref, b_ref,
            out_ref, hT_ref, cT_ref, h_scr, c_scr):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    x = x_ref[0, :, :]  # time-major blocks: [1, B, D]
    h = h_scr[:]
    c = c_scr[:]
    H = h.shape[-1]

    gates = (
        jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].reshape(4 * H)
    )
    i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    t = (L - 1 - l) if reverse else l
    valid = (t < lengths_ref[:, 0])[:, None]
    h_scr[:] = jnp.where(valid, h_new, h)
    c_scr[:] = jnp.where(valid, c_new, c)
    out_ref[0, :, :] = jnp.where(valid, h_new, 0.0).astype(out_ref.dtype)

    @pl.when(l == L - 1)
    def _():
        hT_ref[:] = h_scr[:]
        cT_ref[:] = c_scr[:]


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_scan_pallas(
    xs: jnp.ndarray,        # [B, L, D]
    lengths: jnp.ndarray,   # [B] int32
    w_ih: jnp.ndarray,      # [D, 4H]
    w_hh: jnp.ndarray,      # [H, 4H]
    b: jnp.ndarray,         # [4H]
    reverse: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    B, L, D = xs.shape
    H = w_hh.shape[0]
    lengths2 = lengths.astype(jnp.int32).reshape(B, 1)
    xs_tm = jnp.swapaxes(xs, 0, 1)  # [L, B, D] time-major (TPU block tiling
    # requires the last two block dims aligned/full; time becomes the grid)

    if reverse:
        x_index = lambda l: (L - 1 - l, 0, 0)
    else:
        x_index = lambda l: (l, 0, 0)

    outs_tm, hT, cT = pl.pallas_call(
        functools.partial(_kernel, reverse, L),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, D), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4 * H), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # f32 like the XLA path: recurrent state/outputs never ride a
            # bf16 accumulation path even when xs/weights are bf16 compute
            # copies (scratch h/c are f32 already)
            jax.ShapeDtypeStruct((L, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(lengths2, xs_tm, w_ih, w_hh, b.reshape(1, 4 * H))
    return jnp.swapaxes(outs_tm, 0, 1), (hT, cT)
