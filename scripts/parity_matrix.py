"""Statistical training-parity matrix on a synthetic world.

Trains seeds x {follower, monitor, envdrop} x {classic, naive-CL, SPCL}
through the PRODUCTION trainers and reports val_unseen success rates,
checking the orderings the reference paper reports (Table 3):
curriculum >= no-curriculum, EnvDrop >= Follower.

This is the cheapest available proxy for reference parity: real
Matterport assets are not present in this environment, so quality parity
is established on structure-identical synthetic worlds (same splits
contract, same trainers, same budgets-in-miniature).

Usage: python scripts/parity_matrix.py [--seeds 2] [--epochs 12]
Writes a markdown table to stdout (redirect into BASELINE.md).
"""
from __future__ import annotations

import argparse
import os

# honor JAX_PLATFORMS=cpu despite the site hook that pre-registers the
# remote-TPU backend (eval passes are relay-RTT-bound on the remote chip:
# measured ~25 min/run there vs ~4 min on host CPU)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


MODELS = ("FOLLOWER", "SELF-MONITOR", "ENVDROP")
CURRICULA = ("", "NAIVE", "SELF-PACE")


def make_cfg(model: str, clmode: str, seed: int, epochs: int, tmp: str):
    # (naive curriculum switch_epoch is passed to NaiveCurriculum directly
    # in run_one; see --switch-epoch)
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = model
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 64
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 128
    cfg.MODEL.FOLLOWER.ENC_LAYERS = 1
    cfg.MODEL.MONITOR.WORD_EMB_SIZE = 64
    cfg.MODEL.MONITOR.HIDDEN_SIZE = 128
    cfg.MODEL.MONITOR.MLP_HIDDEN = (64, 128)
    cfg.MODEL.ENVDROP.WORD_EMB_SIZE = 64
    cfg.MODEL.ENVDROP.ACT_EMB_SIZE = 32
    cfg.MODEL.ENVDROP.HIDDEN_SIZE = 128
    cfg.MODEL.ENVDROP.ML_WEIGHT = 0.2
    cfg.MODEL.ENVDROP.GAMMA = 0.9
    cfg.MODEL.ENVDROP.RL_NORMALIZE = "total"
    cfg.DATA.NAME = "CLR2R" if clmode else "R2R"
    cfg.DATA.MAX_ENC_LEN = 32
    cfg.AGENT.MAX_EPISODE_LEN = 10
    # reference feedback recipes (runner/run_main.sh): follower/monitor train
    # with sampled feedback; envdrop samples for the RL phase
    cfg.AGENT.FEEDBACK = "sample"
    cfg.TRAIN.OPTIM = "rms" if model == "ENVDROP" else "adam"
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.BATCH_SIZE = 32
    cfg.TRAIN.MAX_EPOCH = epochs
    cfg.TRAIN.ITER_PER_EPOCH = 20
    cfg.TRAIN.EVAL_INTERVAL = max(2, epochs // 5)
    cfg.TRAIN.CLMODE = clmode
    cfg.TRAIN.SELF_PACE.CRATE = 1.0
    cfg.TRAIN.SELF_PACE.LAMB = 2.0
    cfg.TRAIN.SELF_PACE.MIU = 1.0
    cfg.TRAIN.SELF_PACE.FUNC = "linear"
    cfg.TRAIN.SELF_PACE.BURN_IN = max(2, epochs // 4)
    cfg.TRAIN.SELF_PACE.INTERVAL = 2
    cfg.TRAIN.SELF_PACE.STRATEGY = "epoch"
    cfg.TPU.SYNTHETIC_WORLD = True
    cfg.TPU.SYNTHETIC_SCANS = 6
    cfg.TPU.SYNTHETIC_NODES = 48
    cfg.TPU.COMPILATION_CACHE = ""
    cfg.OUTPUT.CKPT_DIR = os.path.join(tmp, f"{model}_{clmode or 'none'}_{seed}", "ckpt")
    cfg.OUTPUT.TSBOARD_DIR = os.path.join(tmp, f"{model}_{clmode or 'none'}_{seed}", "tb")
    # naive curriculum: switch rounds at epochs/5 so all 5 rounds are seen
    return cfg


def run_one(model: str, clmode: str, seed: int, epochs: int, tmp: str,
            switch_epoch: int = 0) -> float:
    """Train one configuration and return final val_unseen SR."""
    import jax

    from curriculum_learning_for_vln_tpu import engine, pipeline
    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.utils.tokenizer import Tokenizer, build_vocab
    from curriculum_learning_for_vln_tpu.data import datasets as DS

    cfg = make_cfg(model, clmode, seed, epochs, tmp)
    world, splits, rounds_raw, feat_dim = pipeline.build_synthetic_universe(cfg, seed=7)
    vocab_items = splits["train"] + splits["val_seen"] + splits["val_unseen"]
    tok = Tokenizer(build_vocab(vocab_items, min_count=1), encoding_length=cfg.DATA.MAX_ENC_LEN)

    from curriculum_learning_for_vln_tpu.env.host_env import CLR2RBatchEnv, R2RBatchEnv

    bs = cfg.TRAIN.BATCH_SIZE
    expand = lambda items: DS.expand_r2r_items(items, tok)
    valid_env = {
        "val_unseen": R2RBatchEnv(world, expand(splits["val_unseen"]), bs, tok, seed + 12, "val_unseen"),
    }
    if clmode == "NAIVE":
        train_env = {}
        acc = []
        for k in range(1, 6):
            acc = acc + rounds_raw[f"round_{k}"]
            train_env[f"round_{k}"] = R2RBatchEnv(world, expand(acc), bs, tok, seed + k, "train")
        trainer = engine.NaiveCurriculum(
            switch_epoch=switch_epoch or max(1, epochs // 5))
    elif clmode == "SELF-PACE":
        rounds = {k: expand(v) for k, v in rounds_raw.items()}
        train_env = CLR2RBatchEnv(world, rounds, bs, cfg.TRAIN.SELF_PACE.CRATE, tok, seed)
        trainer = engine.SelfPacedCurriculum(
            train_env, pace_func=cfg.TRAIN.SELF_PACE.FUNC,
            init_lamb=cfg.TRAIN.SELF_PACE.LAMB, init_weight_ctrl=0.5,
            miu=cfg.TRAIN.SELF_PACE.MIU, interval=cfg.TRAIN.SELF_PACE.INTERVAL,
            strategy="epoch", burn_in=cfg.TRAIN.SELF_PACE.BURN_IN)
    else:
        train_env = R2RBatchEnv(world, expand(splits["train"]), bs, tok, seed, "train")
        trainer = engine.ClassicTrainer()

    agent = build_agent(cfg, tok.vocab_size(), feat_dim)
    params, mstate, best = trainer.train(cfg, agent, None, train_env, valid_env, seed=seed)
    return best["val_unseen"]["success_rate"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--models", default=",".join(MODELS))
    ap.add_argument("--switch-epoch", type=int, default=0,
                    help="naive-CL round length in epochs (0 = epochs//5; "
                         "the reference schedule is 20, curriculum.py:29)")
    ap.add_argument("--out", default="",
                    help="JSONL results file; completed (model, clmode, seed) "
                         "runs found there are skipped, so a killed matrix "
                         "resumes where it left off")
    args = ap.parse_args()

    import json

    import numpy as np

    done = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                r = json.loads(line)
                done[(r["model"], r["clmode"], r["seed"])] = r["sr"]

    # Seed-outer, clmode-inner: every completed seed yields a complete
    # paired (classic, NAIVE, SELF-PACE) triple, so a budget-killed matrix
    # still supports paired statistics on the seeds that finished (the
    # round-4 host recycle ate an unpaired partial exactly this way).
    by_cell = {k: [] for m in args.models.split(",") for k in [(m, c) for c in CURRICULA]}
    with tempfile.TemporaryDirectory() as tmp:
        for model in args.models.split(","):
            for seed in range(args.seeds):
                for clmode in CURRICULA:
                    key = (model, clmode, seed)
                    if key in done:
                        sr = done[key]
                    else:
                        sr = run_one(model, clmode, 1000 + seed, args.epochs,
                                     tmp, switch_epoch=args.switch_epoch)
                        if args.out:
                            with open(args.out, "a") as f:
                                f.write(json.dumps({"model": model, "clmode": clmode,
                                                    "seed": seed, "sr": sr}) + "\n")
                    print(f"# {model} {clmode or 'classic':10s} seed{seed}: "
                          f"val_unseen SR={sr:.3f}", file=sys.stderr, flush=True)
                    by_cell[(model, clmode)].append(sr)
    results = {k: float(np.mean(v)) for k, v in by_cell.items()}

    print("| model | classic | naive-CL | SPCL |")
    print("|---|---|---|---|")
    for model in args.models.split(","):
        row = [f"{results[(model, c)]:.3f}" for c in CURRICULA]
        print(f"| {model} | " + " | ".join(row) + " |")

    for model in args.models.split(","):
        best_cl = max(results[(model, "NAIVE")], results[(model, "SELF-PACE")])
        print(f"# ordering {model}: best-CL {best_cl:.3f} vs classic "
              f"{results[(model, '')]:.3f} -> {'OK' if best_cl >= results[(model, '')] - 0.02 else 'VIOLATED'}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
