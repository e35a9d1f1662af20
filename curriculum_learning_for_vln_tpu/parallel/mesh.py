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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place an EpisodeBatch (or any leading-batch pytree) sharded on data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def jit_sharded_train_step(step_fn, mesh: Mesh, weighted: bool = False):
    """Jit a train step with explicit DP shardings.

    step_fn: (params, opt_state, model_state, ep, rng[, weights]) ->
             (params, opt_state, model_state, logs)

    Inputs: params/opt_state/model_state/rng replicated; episode batch
    (and SPCL weights) sharded on 'data'.  XLA inserts the gradient psum.
    """
    rep = replicated(mesh)
    dat = batch_sharding(mesh)
    if weighted:
        in_sh = (rep, rep, rep, dat, rep, dat)
    else:
        in_sh = (rep, rep, rep, dat, rep)
    return jax.jit(step_fn, in_shardings=in_sh, donate_argnums=(0, 1))


def pad_batch_to_devices(n: int, mesh: Mesh) -> int:
    """Smallest batch size >= n divisible by the data axis."""
    d = mesh.shape["data"]
    return ((n + d - 1) // d) * d
