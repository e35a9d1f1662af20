"""R4R fidelity-training comparison on a grounded synthetic world.

Three ENVDROP arms, same world/budget, all evaluated on R4R val_unseen
(joined, deliberately non-geodesic routes — data/datasets.py::
make_r4r_items):

  r2r-goal  — trained on R2R with the reference goal-directed teacher
  r4r-goal  — trained on R4R, still goal-directed teacher
  r4r-path  — trained on R4R with AGENT.TEACHER=path (waypoint teacher,
              env/env.py::_teacher_target)

The claim under test (Jain et al. '19, "Stay on the Path"): fidelity
supervision is what moves the path-fidelity metrics (CLS/nDTW/SDTW) on
R4R; goal-directed training shortcuts the routes no matter which data it
saw.  Success rate should stay comparable across arms.

Usage: python scripts/r4r_quality.py [--seeds 2] [--epochs 60] [--out r.jsonl]
(resumable via --out, same contract as parity_matrix.py)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = ("r2r-goal", "r4r-goal", "r4r-path")
METRICS = ("success_rate", "spl", "ndtw", "sdtw", "cls")


def make_cfg(seed: int, epochs: int, tmp: str, arm: str):
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "ENVDROP"
    cfg.MODEL.ENVDROP.WORD_EMB_SIZE = 64
    cfg.MODEL.ENVDROP.ACT_EMB_SIZE = 32
    cfg.MODEL.ENVDROP.HIDDEN_SIZE = 128
    cfg.MODEL.ENVDROP.ML_WEIGHT = 0.2
    cfg.MODEL.ENVDROP.GAMMA = 0.9
    cfg.MODEL.ENVDROP.RL_NORMALIZE = "total"
    cfg.DATA.NAME = "R2R"
    cfg.DATA.MAX_ENC_LEN = 48          # joined instructions are ~2x longer
    cfg.AGENT.MAX_EPISODE_LEN = 16     # joined routes are ~2x longer
    cfg.AGENT.TEACHER = "path" if arm == "r4r-path" else "goal"
    cfg.TRAIN.OPTIM = "rmsprop"
    cfg.TRAIN.LR = 1e-4
    cfg.TRAIN.BATCH_SIZE = 32
    cfg.TRAIN.MAX_EPOCH = epochs
    cfg.TRAIN.ITER_PER_EPOCH = 20
    cfg.TRAIN.EVAL_INTERVAL = max(5, epochs // 6)
    cfg.TPU.SYNTHETIC_WORLD = True
    cfg.TPU.SYNTHETIC_SCANS = 6
    cfg.TPU.SYNTHETIC_NODES = 48
    cfg.TPU.COMPILATION_CACHE = ""
    cfg.OUTPUT.CKPT_DIR = os.path.join(tmp, f"{arm}_{seed}", "ckpt")
    cfg.OUTPUT.TSBOARD_DIR = os.path.join(tmp, f"{arm}_{seed}", "tb")
    return cfg


def run_one(arm: str, seed: int, epochs: int, tmp: str) -> dict:
    import jax

    from curriculum_learning_for_vln_tpu import engine, pipeline
    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.data import datasets as DS
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.utils.tokenizer import Tokenizer, build_vocab

    cfg = make_cfg(seed, epochs, tmp, arm)
    world, splits, _, feat_dim = pipeline.build_synthetic_universe(cfg, seed=7)
    # one shared R4R construction per arm set (same join seed everywhere)
    r4r = {k: DS.make_r4r_items(v, max_joins_per_anchor=2, seed=11)
           for k, v in splits.items()}
    vocab_items = splits["train"] + splits["val_seen"] + splits["val_unseen"]
    tok = Tokenizer(build_vocab(vocab_items, min_count=1),
                    encoding_length=cfg.DATA.MAX_ENC_LEN)
    expand = lambda items: DS.expand_r2r_items(items, tok)

    bs = cfg.TRAIN.BATCH_SIZE
    tm = cfg.AGENT.TEACHER
    train_items = splits["train"] if arm == "r2r-goal" else r4r["train"]
    train_env = R2RBatchEnv(world, expand(train_items), bs, tok, 1000 + seed,
                            "train", teacher_mode=tm)
    # every arm is judged on the SAME R4R validation splits
    valid_env = {
        "val_seen": R2RBatchEnv(world, expand(r4r["val_seen"]), bs, tok,
                                2000 + seed, "val_seen", teacher_mode=tm),
        "val_unseen": R2RBatchEnv(world, expand(r4r["val_unseen"]), bs, tok,
                                  3000 + seed, "val_unseen", teacher_mode=tm),
    }
    agent = build_agent(cfg, tok.vocab_size(), feat_dim)
    trainer = engine.ClassicTrainer()
    params, mstate, best = trainer.train(cfg, agent, None, train_env, valid_env,
                                         seed=1000 + seed)
    # deterministic FINAL evaluation of the trained params on R4R
    # val_unseen (best-SR rows carry no metrics for runs whose SR never
    # left 0, and "best" snapshots differ per arm — final params are the
    # apples-to-apples comparison)
    from curriculum_learning_for_vln_tpu.engine.evaluator import Evaluation
    from curriculum_learning_for_vln_tpu.engine.loop import run_eval
    from curriculum_learning_for_vln_tpu.engine.trainer import dedup_by_path

    env = valid_env["val_unseen"]
    results = run_eval(agent, params, mstate, world.device_tables(),
                       env, jax.random.PRNGKey(123))
    summary, _ = Evaluation(world, dedup_by_path(env.data),
                            data_name="R4R").score(results)
    return {m: float(summary.get(m, float("nan"))) for m in METRICS}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import numpy as np

    done = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                r = json.loads(line)
                done[(r["arm"], r["seed"])] = r["metrics"]

    rows = {}
    with tempfile.TemporaryDirectory() as tmp:
        for arm in ARMS:
            per_seed = []
            for seed in range(args.seeds):
                key = (arm, seed)
                if key in done:
                    m = done[key]
                else:
                    m = run_one(arm, seed, args.epochs, tmp)
                    if args.out:
                        with open(args.out, "a") as f:
                            f.write(json.dumps({"arm": arm, "seed": seed,
                                                "metrics": m}) + "\n")
                print(f"# {arm} seed{seed}: " +
                      " ".join(f"{k}={v:.3f}" for k, v in m.items()),
                      file=sys.stderr, flush=True)
                per_seed.append(m)
            rows[arm] = {k: float(np.mean([m[k] for m in per_seed])) for k in METRICS}

    print("| arm | " + " | ".join(METRICS) + " |")
    print("|---|" + "---|" * len(METRICS))
    for arm in ARMS:
        print(f"| {arm} | " + " | ".join(f"{rows[arm][k]:.3f}" for k in METRICS) + " |")
    fid = lambda a: rows[a]["ndtw"] + rows[a]["cls"]
    print(f"# fidelity ordering: r4r-path {fid('r4r-path'):.3f} vs "
          f"r4r-goal {fid('r4r-goal'):.3f} vs r2r-goal {fid('r2r-goal'):.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
