"""RNN compute ops with XLA and Pallas backends.

``lstm_cell`` is the single hot primitive of every agent (the decoder
step inside the rollout scan and all encoder scans route through it).
The default implementation is plain XLA — two MXU matmuls plus fused
elementwise gates.  On TPU a Pallas fused kernel
(`ops/pallas/lstm.py`) can take over via ``set_backend("pallas")``; both
backends are numerically checked against each other in tests.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def lstm_cell_xla(
    x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
    w_ih: jnp.ndarray, w_hh: jnp.ndarray, b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LSTM cell, torch gate order (i, f, g, o)."""
    gates = x @ w_ih + h @ w_hh + b
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H : 4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell(
    x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
    w_ih: jnp.ndarray, w_hh: jnp.ndarray, b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if _BACKEND == "pallas":
        from .pallas.lstm import lstm_cell_pallas

        return lstm_cell_pallas(x, h, c, w_ih, w_hh, b)
    return lstm_cell_xla(x, h, c, w_ih, w_hh, b)
