"""Device mesh and sharding layer.

The reference is single-process single-GPU (SURVEY §2.3: no
torch.distributed anywhere); its only "parallelism" is a Python list of
simulators.  Here data parallelism is first-class: a ('data', 'model')
mesh, episode batches sharded over 'data', parameters replicated, and
gradient reduction left to XLA's SPMD partitioner (psum over ICI) by
jitting the same train step with sharding annotations.  'model' is kept
in the mesh so the ViLBERT scorer can shard activations later without
re-plumbing.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 0, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh; data=0 means "all remaining"."""
    devices = list(devices if devices is not None else jax.devices())
    if data <= 0:
        assert len(devices) % model == 0
        data = len(devices) // model
    use = devices[: data * model]
    arr = np.array(use).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def mesh_from_config(cfg, batch_size: int) -> Mesh:
    """Production mesh from cfg.TPU.MESH_DATA / MESH_MODEL.

    MESH_DATA=0 means "all devices not used by the model axis".  The data
    axis is shrunk to the largest size that divides ``batch_size`` so
    every batch shards evenly (the reference has no equivalent: it is
    single-GPU, ref main.py:44-45).  A 1x1 mesh is returned on a single
    device — the same placement code path then runs degenerate shardings.
    """
    tpu_cfg = getattr(cfg, "TPU", None)
    model = max(1, int(tpu_cfg.MESH_MODEL)) if tpu_cfg is not None else 1
    requested = int(tpu_cfg.MESH_DATA) if tpu_cfg is not None else 0
    avail = max(1, jax.device_count() // model)
    data = requested if requested > 0 else avail
    data = min(data, avail)
    while batch_size % data != 0:
        data -= 1
    return make_mesh(data=data, model=model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place an EpisodeBatch (or any leading-batch pytree) sharded on data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [K, B, ...] stacked iteration batches: batch axis is
    axis 1 (the leading axis is the fused-iteration axis, engine.loop
    build_scanned_train_step)."""
    return NamedSharding(mesh, P(None, "data"))


def shard_stacked_batch(tree, mesh: Mesh):
    sh = stacked_batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def jit_sharded_train_step(step_fn, mesh: Mesh, weighted: bool = False):
    """Jit a train step with explicit DP shardings (the production
    trainers achieve the same via input placement — env.set_sharding +
    replicate — which lets one jitted step serve any mesh; this helper
    pins the shardings in the jit signature for callers that want the
    contract enforced).

    step_fn: (tables, params, opt_state, model_state, ep, rng[, weights])
             -> (params, opt_state, model_state, logs)

    Inputs: tables/params/opt_state/model_state/rng replicated; episode
    batch (and SPCL weights) sharded on 'data'.  XLA inserts the gradient
    psum.
    """
    rep = replicated(mesh)
    dat = batch_sharding(mesh)
    if weighted:
        in_sh = (rep, rep, rep, rep, dat, rep, dat)
    else:
        in_sh = (rep, rep, rep, rep, dat, rep)
    return jax.jit(step_fn, in_shardings=in_sh, donate_argnums=(1, 2))


def pad_batch_to_devices(n: int, mesh: Mesh) -> int:
    """Smallest batch size >= n divisible by the data axis."""
    d = mesh.shape["data"]
    return ((n + d - 1) // d) * d
