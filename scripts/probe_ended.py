"""Probe: rollout utilization — at which scan step do episodes end?

Measures, for RL sample feedback on the grounded 6x48 world (batch 32,
T=15): the first step where ALL episodes in a batch have ended (what
TPU.SCAN_EARLY_EXIT recovers) and the per-sample alive fraction (what
TPU.PACKED_RL recovers), for an untrained init and optionally a trained
checkpoint.  Numbers recorded in BASELINE.md "Rollout utilization".

Usage: python scripts/probe_ended.py [path/to/latest.ckpt]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from curriculum_learning_for_vln_tpu.agents import build_agent
from curriculum_learning_for_vln_tpu.agents.common import FEEDBACK_SAMPLE
from curriculum_learning_for_vln_tpu.engine.checkpoint import load_checkpoint
from curriculum_learning_for_vln_tpu.pipeline import (build_environments,
                                                      build_tokenizer)
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults


def main():
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "envdrop", "envdrop_config.yaml"))
    cfg.merge_from_list([
        "TPU.SYNTHETIC_WORLD", "True", "TPU.SYNTHETIC_SCANS", "6",
        "TPU.SYNTHETIC_NODES", "48", "TRAIN.BATCH_SIZE", "32",
        "AGENT.MAX_EPISODE_LEN", "15", "DATA.MAX_ENC_LEN", "40",
    ])
    tok = build_tokenizer(cfg)
    world, train_env, _, feat_dim = build_environments(cfg, tok, seed=2020)
    agent = build_agent(cfg, tok.vocab_size(), feat_dim)
    tables = world.device_tables()
    T = cfg.AGENT.MAX_EPISODE_LEN

    params0, mstate = agent.init(jax.random.PRNGKey(0))
    arms = [("untrained", params0)]
    if len(sys.argv) > 1:
        bundle = load_checkpoint(sys.argv[1])
        arms.append(("trained", jax.tree_util.tree_map(jnp.asarray,
                                                       bundle["params"])))

    def all_end_steps(params, n_batches=12, seed=0):
        @jax.jit
        def run(ep, rng):
            _, result, _ = agent.rollout(params, mstate, tables, ep, rng,
                                         feedback=FEEDBACK_SAMPLE, train=True,
                                         train_ml=False, train_rl=True)
            return result.steps.alive_before  # [T, B]

        outs = []
        for i in range(n_batches):
            ep = train_env.next_batch()
            alive = np.asarray(run(ep, jax.random.PRNGKey(seed + i)))
            n_alive = alive.sum(axis=1)
            first = int(np.argmax(n_alive == 0)) if (n_alive == 0).any() else T
            outs.append((first, n_alive))
        return outs

    for name, p in arms:
        res = all_end_steps(p)
        firsts = [r[0] for r in res]
        mean_alive = np.stack([r[1] for r in res]).mean(axis=0)
        wasted = np.mean([(T - f) / T for f in firsts])
        util = np.stack([r[1] for r in res]).sum() / (len(res) * T * 32)
        print(f"{name}: first-all-ended per batch = {firsts}  (T={T})")
        print(f"  mean alive per step: {np.array2string(mean_alive, precision=1)}")
        print(f"  batch-level skippable tail: {wasted:.1%};  "
              f"sample-level utilization: {util:.1%}")


if __name__ == "__main__":
    main()
