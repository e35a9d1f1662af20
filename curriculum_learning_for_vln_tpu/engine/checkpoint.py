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
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    model_state: Any = None,
    rng: Any = None,
    epoch: int = 0,
    curriculum: Any = None,
    cfg_yaml: Optional[str] = None,
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
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(bundle, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
