"""Checkpoint save/load for training state.

Fixes the reference's checkpointing gaps (SURVEY §5): the reference saves
only model state_dicts (`tasks/R2R-judy/src/agent/follower.py:200-213`),
losing optimizer state, RNG, and SPCL curriculum state on resume.  Here a
checkpoint is one pickled bundle of numpy-converted pytrees:

    {"params", "opt_state", "model_state", "rng", "epoch",
     "curriculum" (optional SPCL weights/lambda/per-item losses),
     "cfg" (yaml dump), "meta"}

Pickle is safe here because checkpoints are a trusted local artifact of
this framework (the reference's torch.save is pickle too).
"""
from __future__ import annotations

import os
import pickle
import threading
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# --- async writer (TPU.CKPT_ASYNC) -----------------------------------------
# One background worker serializes+renames while the next epoch trains.  The
# device->host snapshot (_to_numpy) always happens on the CALLER's thread, so
# the written state is exactly the state at call time; ordering between
# rotation deletes and writes is preserved by routing both through the same
# single-worker queue (pre_tasks).
_ASYNC_LOCK = threading.Lock()
_ASYNC_EXEC = None
_PENDING: list = []


def _executor():
    global _ASYNC_EXEC
    with _ASYNC_LOCK:
        if _ASYNC_EXEC is None:
            from concurrent.futures import ThreadPoolExecutor

            _ASYNC_EXEC = ThreadPoolExecutor(max_workers=1,
                                             thread_name_prefix="ckpt-writer")
        return _ASYNC_EXEC


def wait_for_checkpoints() -> None:
    """Block until every async checkpoint write has finished; re-raises the
    first writer exception.  Call at end of training (and before reading a
    checkpoint another thread may still be writing)."""
    with _ASYNC_LOCK:
        pending, _PENDING[:] = _PENDING[:], []
    for fut in pending:
        fut.result()


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    model_state: Any = None,
    rng: Any = None,
    epoch: int = 0,
    curriculum: Any = None,
    cfg_yaml: Optional[str] = None,
    backend: str = "pickle",
    async_write: bool = False,
    pre_tasks: Sequence[Callable[[], None]] = (),
    **extra,
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    bundle = {
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "model_state": _to_numpy(model_state) if model_state is not None else None,
        "rng": np.asarray(rng) if rng is not None else None,
        "epoch": int(epoch),
        "curriculum": _to_numpy(curriculum) if curriculum is not None else None,
        "cfg_yaml": cfg_yaml,
        "extra": _to_numpy(extra) if extra else {},
    }

    def _write():
        for task in pre_tasks:  # e.g. best-SR rotation clean_dir
            task()
        if backend == "orbax":
            _save_orbax(path, bundle)
            return
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(bundle, f, protocol=pickle.HIGHEST_PROTOCOL)
        if os.path.isdir(path):  # a previous run used the orbax (directory) format
            import shutil

            shutil.rmtree(path)
        os.replace(tmp, path)

    if async_write:
        fut = _executor().submit(_write)
        with _ASYNC_LOCK:
            _PENDING.append(fut)
        return
    _write()


def load_checkpoint(path: str) -> dict:
    if os.path.isdir(path):
        return _load_orbax(path)
    if not os.path.exists(path) and os.path.isdir(path + ".orbax_old"):
        # a crash during _save_orbax's swap window left only the set-aside
        # copy; recover it in place
        os.replace(path + ".orbax_old", path)
        return _load_orbax(path)
    with open(path, "rb") as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# Orbax backend (TPU.CKPT_BACKEND = "orbax"): the array payload is written
# through orbax-checkpoint (TensorStore-backed, multi-host-coordinated
# writes), while the exact pytree structure — including optax NamedTuple
# optimizer states — round-trips via a pickled treedef so ``load_checkpoint``
# returns the same bundle either backend produced.  The checkpoint becomes a
# *directory* at ``path``; loading auto-detects by isdir.
# ---------------------------------------------------------------------------

_ARRAY_KEYS = ("params", "opt_state", "model_state", "rng", "curriculum", "extra")


def _save_orbax(path: str, bundle: dict) -> None:
    import base64
    import json
    import shutil

    import orbax.checkpoint as ocp

    arrays = {k: bundle[k] for k in _ARRAY_KEYS}
    leaves, treedef = jax.tree_util.tree_flatten(arrays)
    payload = {f"leaf_{i:05d}": leaf for i, leaf in enumerate(leaves)}
    meta = {
        "epoch": bundle["epoch"],
        "cfg_yaml": bundle["cfg_yaml"],
        "treedef": base64.b64encode(pickle.dumps(treedef)).decode("ascii"),
        "n_leaves": len(leaves),
    }

    path = os.path.abspath(path)
    tmp = path + ".orbax_tmp"
    old = path + ".orbax_old"
    for stale in (tmp, old):  # leftovers from a crashed previous save
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(tmp, payload)
    with open(os.path.join(tmp, "bundle_meta.json"), "w") as f:
        json.dump(meta, f)
    # Crash-safe overwrite: move the existing checkpoint ASIDE (rename is
    # atomic) rather than deleting it before the swap, so a crash between
    # the two steps still leaves a complete checkpoint on disk.
    if os.path.isdir(path):
        os.replace(path, old)
    elif os.path.exists(path):
        os.remove(path)  # cross-format: previous run used the pickle file
    os.replace(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _load_orbax(path: str) -> dict:
    import base64
    import json

    import orbax.checkpoint as ocp

    with open(os.path.join(path, "bundle_meta.json")) as f:
        meta = json.load(f)
    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    leaves = [payload[f"leaf_{i:05d}"] for i in range(meta["n_leaves"])]
    treedef = pickle.loads(base64.b64decode(meta["treedef"]))
    arrays = jax.tree_util.tree_unflatten(treedef, leaves)
    arrays["epoch"] = meta["epoch"]
    arrays["cfg_yaml"] = meta["cfg_yaml"]
    return arrays
