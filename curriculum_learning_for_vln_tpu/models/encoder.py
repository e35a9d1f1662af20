"""Instruction encoder: (bi)directional multi-layer LSTM.

Functional port of the reference EncoderLSTM
(`tasks/R2R-judy/src/model/units.py:12-74`): embedding -> dropout ->
packed (bi)LSTM stack -> ctx (dropout) plus a decoder init state
tanh(W h_T).  Packed-sequence semantics come from the masked scans in
``models.core`` (padded outputs zero, backward direction reads only real
tokens).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .core import (bilstm_layer, dense, dense_init, dropout, embedding,
                   embedding_init, lstm_cell_init)


def encoder_init(
    key,
    vocab_size: int,
    embed_size: int,
    hidden_size: int,
    padding_idx: int,
    bidirectional: bool = False,
    num_layers: int = 1,
    glove=None,
) -> dict:
    """``glove``: optional [vocab, embed] pretrained table — used frozen, and
    embedding dropout is skipped (ref: units.py:30-37, 55-56)."""
    dirs = 2 if bidirectional else 1
    H = hidden_size // dirs
    keys = jax.random.split(key, 2 + 2 * num_layers)
    if glove is not None:
        embedding = {"w": jnp.asarray(glove)}
    else:
        embedding = embedding_init(keys[0], vocab_size, embed_size, padding_idx)
    p = {
        "embedding": embedding,
        "enc2dec": dense_init(keys[1], H * dirs, H * dirs, bias=True),
        "layers": [],
    }
    in_dim = embed_size
    for layer in range(num_layers):
        fwd = lstm_cell_init(keys[2 + 2 * layer], in_dim, H)
        bwd = lstm_cell_init(keys[3 + 2 * layer], in_dim, H) if bidirectional else None
        p["layers"].append({"fwd": fwd, "bwd": bwd})
        in_dim = H * dirs
    return p


def encoder_apply(
    p: dict,
    tokens: jnp.ndarray,     # [B, L] int32
    lengths: jnp.ndarray,    # [B]
    rng,
    train: bool,
    drop_rate: float = 0.5,
    use_glove: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (ctx [B, L, H*dirs], decoder_init_h [B, H*dirs], c_T)."""
    num_layers = len(p["layers"])
    embeds = embedding(p["embedding"], tokens)
    if use_glove:
        embeds = jax.lax.stop_gradient(embeds)  # frozen pretrained table
    else:
        embeds = dropout(jax.random.fold_in(rng, 0), embeds, drop_rate, deterministic=not train)

    x = embeds
    h_t = c_t = None
    for li, layer in enumerate(p["layers"]):
        x, (h_t, c_t) = bilstm_layer(layer["fwd"], layer["bwd"], x, lengths)
        if li < num_layers - 1 and num_layers > 1:
            # inter-layer dropout (torch LSTM dropout arg; ref units.py:41)
            x = dropout(jax.random.fold_in(rng, 10 + li), x, drop_rate, deterministic=not train)

    decoder_init = jnp.tanh(dense(p["enc2dec"], h_t))
    ctx = dropout(jax.random.fold_in(rng, 1), x, drop_rate, deterministic=not train)
    return ctx, decoder_init, c_t
