"""Packed-RL study: quality + wall-clock of TPU.PACKED_RL vs the
fixed-batch baseline (agents/packed.py, continuous batching).

Arms (same grounded 6x48 world, recipe = the dropout-A/B 100-epoch one):

  base     — reference-shaped iteration (IL + RL on one batch)
  packed3  — TPU.PACKED_RL=3: RL arm rolls a 3xB pool with refill; each
             update's RL term sees ~3x the episodes at ~1x rollout cost
  exit     — TPU.SCAN_EARLY_EXIT: semantics-identical baseline that skips
             all-dead scan steps (wall-clock arm for the same updates)

Per arm x seed: total train wall, final val_unseen SR/SPL (deterministic
final-params eval), best-eval SR, episodes completed by the RL term.

Usage: python scripts/packed_study.py [--seeds 2] [--epochs 100]
       [--arms base,packed3,exit] [--out r.jsonl]      (resumable)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = ("base", "packed3", "exit")
SPCL_ARMS = ("spcl", "spcl-packed3")  # flagship curriculum config


def make_cfg(seed: int, epochs: int, tmp: str, arm: str):
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    yaml = "envdrop_cl_config.yaml" if arm.startswith("spcl") else "envdrop_config.yaml"
    cfg.merge_from_file(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "envdrop", yaml))
    if arm.startswith("spcl"):
        cfg.TRAIN.CLMODE = "SELF-PACE"
    cfg.DATA.MAX_ENC_LEN = 40
    cfg.AGENT.MAX_EPISODE_LEN = 15
    cfg.TRAIN.BATCH_SIZE = 32
    cfg.TRAIN.MAX_EPOCH = epochs
    cfg.TRAIN.ITER_PER_EPOCH = 20
    cfg.TRAIN.EVAL_INTERVAL = max(5, epochs // 4)
    cfg.TPU.SYNTHETIC_WORLD = True
    cfg.TPU.SYNTHETIC_SCANS = 6
    cfg.TPU.SYNTHETIC_NODES = 48
    if arm.endswith("packed3"):
        cfg.TPU.PACKED_RL = 3
    if arm == "exit":
        cfg.TPU.SCAN_EARLY_EXIT = True
    cfg.OUTPUT.CKPT_DIR = os.path.join(tmp, f"{arm}_{seed}", "ckpt")
    cfg.OUTPUT.TSBOARD_DIR = os.path.join(tmp, f"{arm}_{seed}", "tb")
    return cfg


def run_one(arm: str, seed: int, epochs: int, tmp: str) -> dict:
    import jax

    from curriculum_learning_for_vln_tpu import engine, pipeline
    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.agents import common as AC
    from curriculum_learning_for_vln_tpu.engine.evaluator import Evaluation
    from curriculum_learning_for_vln_tpu.engine.loop import run_eval
    from curriculum_learning_for_vln_tpu.engine.trainer import dedup_by_path

    cfg = make_cfg(seed, epochs, tmp, arm)
    tok = pipeline.build_tokenizer(cfg)
    world, train_env, valid_env, feat_dim = pipeline.build_environments(
        cfg, tok, seed=2020)
    agent = build_agent(cfg, tok.vocab_size(), feat_dim)
    if arm.startswith("spcl"):
        sp = cfg.TRAIN.SELF_PACE
        trainer = engine.SelfPacedCurriculum(
            train_env, pace_func=sp.FUNC, init_lamb=sp.LAMB,
            init_weight_ctrl=sp.WCTRL, miu=sp.MIU, interval=sp.INTERVAL,
            strategy=sp.STRATEGY, burn_in=sp.BURN_IN)
    else:
        trainer = engine.ClassicTrainer()
    t0 = time.time()
    try:
        params, mstate, best = trainer.train(
            cfg, agent, None, train_env, valid_env, seed=seed)
    finally:
        AC.set_early_exit(False)
    wall = time.time() - t0

    env = valid_env["val_unseen"]
    results = run_eval(agent, params, mstate,
                       world.device_tables(cfg.TPU.PRECISION),
                       env, jax.random.PRNGKey(123))
    summary, _ = Evaluation(world, dedup_by_path(env.data)).score(results)
    return {
        "wall_s": round(wall, 1),
        "sr": float(summary["success_rate"]),
        "spl": float(summary["spl"]),
        "best_sr": float(best.get("val_unseen", {}).get("success_rate", 0.0))
        if isinstance(best, dict) else float("nan"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    done = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                if line.strip() and not line.startswith("#"):
                    r = json.loads(line)
                    done[(r["arm"], r["seed"])] = r

    tmp = tempfile.mkdtemp(prefix="packed_study_")
    arms = [a for a in args.arms.split(",") if a]
    for seed in range(args.seeds):
        for arm in arms:
            if (arm, seed) in done:
                print(f"skip {arm} seed{seed} (done)", flush=True)
                continue
            r = {"arm": arm, "seed": seed}
            r.update(run_one(arm, seed, args.epochs, tmp))
            print(json.dumps(r), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
