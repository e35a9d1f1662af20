"""Tensor-parallel sharding for the ViLBERT scorer.

The navigation agents are DP-only by design (SURVEY §2.3: <10M params),
but the ViLBERT path scorer (~167M params at paper scale) is worth
sharding.  This module produces a NamedSharding pytree for the scorer's
parameters implementing Megatron-style tensor parallelism over the
``model`` mesh axis:

* attention q/k/v projections: column-parallel (heads split over 'model')
* attention output projection: row-parallel
* FFN intermediate: column-parallel; FFN output: row-parallel
* embeddings / LayerNorms / poolers / heads: replicated

With inputs sharded over 'data' and these parameter shardings, XLA's
SPMD partitioner inserts the all-reduces after the row-parallel matmuls —
the standard 2-collective-per-layer TP schedule — without any model-code
changes.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _layer_spec():
    """Sharding specs for one transformer layer's parameter dict."""
    col = {"w": P(None, "model"), "b": P("model")}
    row = {"w": P("model", None), "b": P()}
    rep_ln = {"scale": P(), "bias": P()}
    return {
        "attn": {"query": col, "key": col, "value": col},
        "attn_out": row,
        "attn_ln": rep_ln,
        "inter": col,
        "out": row,
        "out_ln": rep_ln,
    }


def _connection_spec():
    col = {"w": P(None, "model"), "b": P("model")}
    row = {"w": P("model", None), "b": P()}
    rep_ln = {"scale": P(), "bias": P()}
    rep = {"w": P(), "b": P()}
    return {
        # biattention projections: column-parallel (bi-heads split)
        "q1": col, "k1": col, "v1": col,
        "q2": col, "k2": col, "v2": col,
        # biOutput dense: row-parallel back to stream dims
        "dense1": row, "ln1": rep_ln,
        "dense2": row, "ln2": rep_ln,
        "v_inter": col, "v_out": row, "v_ln": rep_ln,
        "t_inter": col, "t_out": row, "t_ln": rep_ln,
    }


def vilbert_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a vlnbert/vilbert parameter tree."""
    def rep_like(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    bert = params["bert"] if "bert" in params else params
    bert_spec = {
        "embeddings": rep_like(bert["embeddings"]),
        "v_embeddings": rep_like(bert["v_embeddings"]),
        "t_layers": [_layer_spec() for _ in bert["t_layers"]],
        "v_layers": [_layer_spec() for _ in bert["v_layers"]],
        "c_layers": [_connection_spec() for _ in bert["c_layers"]],
        "t_pooler": rep_like(bert["t_pooler"]),
        "v_pooler": rep_like(bert["v_pooler"]),
    }
    if "bert" not in params:
        return bert_spec
    spec = {"bert": bert_spec}
    for key in params:
        if key != "bert":
            spec[key] = rep_like(params[key])
    return spec


def shard_vilbert_params(params: dict, mesh: Mesh) -> dict:
    """Place scorer parameters TP-sharded over the mesh's 'model' axis."""
    specs = vilbert_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )
