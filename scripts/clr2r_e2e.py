"""CLR2R construction loop, end to end (VERDICT r2 item 3).

One pipeline reproducing the paper's curriculum-construction story
(ref: README "CLR2R" + tasks/R2R-judy/src/environ/curriculum_env.py:44-62
consumption format; scorer semantics src/agent/vln_bert.py:24-75):

1. pretrain the ViLBERT scorer on the synthetic grounded world
   (masked LM + masked regions + path-instruction alignment),
2. score every training path's path-instruction compatibility,
3. partition into 5 rounds (easiest first)  ->  scorer curriculum,
4. SPCL-train the agent over those rounds, and over a RANDOM 5-way
   partition of the same data (control),
5. report final val_unseen SR for both arms.

The reference ships none of this (its round files were produced
offline); the pipeline here runs end to end on one command:

    python scripts/clr2r_e2e.py --seeds 2 --epochs 60 \
        --out /tmp/clr2r_e2e.jsonl

Results append to --out as JSONL (resumable, like parity_matrix).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_rounds(cfg, seed: int, pretrain_steps: int, tok, world, splits,
                 rooms, feat: int):
    """Steps 1-3: pretrain scorer -> difficulty scores -> 5 rounds."""
    import jax
    import numpy as np

    from curriculum_learning_for_vln_tpu.agents.vln_bert import VLNBertScorer
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.engine.pretrain import (
        VLNBertPretrainer, make_clr2r_rounds, pretrain_batches,
        score_difficulty)
    from curriculum_learning_for_vln_tpu.models.vilbert import VilBertConfig
    from curriculum_learning_for_vln_tpu.world import synthetic

    max_path = 8
    items = splits["train"]
    data = expand_r2r_items(items, tok)

    vb_cfg = VilBertConfig(
        vocab_size=tok.vocab_size(), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=max(32, tok.encoding_length),
        v_feature_size=feat, v_target_size=len(synthetic.ROOM_TYPES),
        v_hidden_size=64, v_num_hidden_layers=2, v_num_attention_heads=4,
        v_intermediate_size=128, bi_hidden_size=64, bi_num_attention_heads=4,
        v_biattention_id=(0, 1), t_biattention_id=(0, 1),
        # from-scratch tiny-scale pretraining needs mean pooling: the
        # reference-parity position-0 pooling is a measured saddle here
        # (align acc pinned at 0.50; see VilBertConfig.pool_method)
        pool_method="mean")
    trainer = VLNBertPretrainer(vb_cfg, mask_idx=1, lr=3e-4)
    params, opt_state = trainer.init(jax.random.PRNGKey(seed))

    def batches():
        n = 0
        while n < pretrain_steps:
            for b in pretrain_batches(world, data, tok, batch_size=16,
                                      max_path_len=max_path, feat_dim=feat,
                                      region_classes=rooms,
                                      n_region_classes=len(synthetic.ROOM_TYPES),
                                      epochs=1, seed=seed + n):
                yield b
                n += 1
                if n >= pretrain_steps:
                    return

    params, opt_state, logs = trainer.train(
        params, opt_state, batches(), jax.random.PRNGKey(seed + 9))
    print(f"# scorer pretrained {pretrain_steps} steps, loss "
          f"{float(logs['loss']):.4f}", file=sys.stderr, flush=True)

    scorer = VLNBertScorer(vb_cfg)
    scores = score_difficulty(scorer, params, world, data, tok,
                              max_path_len=max_path, feat_dim=feat)
    by_path = {}
    for it, s in zip(data, scores):
        by_path.setdefault(it["path_id"], []).append(float(s))
    path_scores = np.array([np.mean(by_path[it["path_id"]]) for it in items])

    # diagnostics: is there a difficulty signal, and did the scorer find
    # it?  (items carry latent ground truth when the world was generated
    # with heterogeneity > 0 — scorer compat is HIGH for EASY, so the
    # target correlation is negative)
    diag = {"score_std": float(np.std(path_scores))}
    # alignment discrimination: did the scorer learn the pretraining task
    # at all?  Score each path against another item's instruction; a
    # working scorer rates the true pair higher (gap > 0, auc >> 0.5).
    shift = max(1, len(data) // 2)
    swapped = []
    for i, it in enumerate(data):
        src = data[(i + shift) % len(data)]
        s = dict(it)
        for k in ("instructions", "instr_encoding", "instr_length"):
            s[k] = src[k]
        swapped.append(s)
    sw = score_difficulty(scorer, params, world, swapped, tok,
                          max_path_len=max_path, feat_dim=feat)
    diag["align_gap"] = float(np.mean(scores) - np.mean(sw))
    # tie-aware AUC: a collapsed scorer emitting constants must read 0.5
    # (chance), not 0 — ties count half
    diag["align_auc"] = float(np.mean(scores > sw) + 0.5 * np.mean(scores == sw))
    if items and "difficulty" in items[0]:
        truth = np.array([it["difficulty"] for it in items])
        diag["pearson_vs_truth"] = float(np.corrcoef(path_scores, truth)[0, 1])
        r1 = np.argsort(np.argsort(path_scores)).astype(np.float64)
        r2 = np.argsort(np.argsort(truth)).astype(np.float64)
        diag["spearman_vs_truth"] = float(np.corrcoef(r1, r2)[0, 1])
    return make_clr2r_rounds(items, path_scores, n_rounds=5), diag


def random_rounds(items, seed: int):
    """Control arm: same round sizes, random assignment."""
    import numpy as np

    rng = np.random.RandomState(seed)
    order = rng.permutation(len(items))
    per = max(1, len(items) // 5)
    out = {}
    for k in range(1, 6):
        lo, hi = (k - 1) * per, k * per if k < 5 else len(items)
        out[f"round_{k}"] = [items[int(i)] for i in order[lo:hi]]
    return out


def spcl_train(cfg, world, rounds_raw, splits, tok, seed: int,
               feat_dim: int) -> float:
    """Step 4: SPCL over the given rounds through the production trainer;
    returns best val_unseen SR."""
    import jax  # noqa: F401

    from curriculum_learning_for_vln_tpu import engine
    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.data import datasets as DS
    from curriculum_learning_for_vln_tpu.env.host_env import (CLR2RBatchEnv,
                                                              R2RBatchEnv)

    bs = cfg.TRAIN.BATCH_SIZE
    expand = lambda its: DS.expand_r2r_items(its, tok)
    valid_env = {"val_unseen": R2RBatchEnv(world, expand(splits["val_unseen"]),
                                           bs, tok, seed + 12, "val_unseen")}
    rounds = {k: expand(v) for k, v in rounds_raw.items()}
    train_env = CLR2RBatchEnv(world, rounds, bs, cfg.TRAIN.SELF_PACE.CRATE,
                              tok, seed)
    trainer = engine.SelfPacedCurriculum(
        train_env, pace_func=cfg.TRAIN.SELF_PACE.FUNC,
        init_lamb=cfg.TRAIN.SELF_PACE.LAMB, init_weight_ctrl=0.5,
        miu=cfg.TRAIN.SELF_PACE.MIU, interval=cfg.TRAIN.SELF_PACE.INTERVAL,
        strategy="epoch", burn_in=cfg.TRAIN.SELF_PACE.BURN_IN)
    agent = build_agent(cfg, tok.vocab_size(), feat_dim)
    _, _, best = trainer.train(cfg, agent, None, train_env, valid_env, seed=seed)
    return best["val_unseen"]["success_rate"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--pretrain-steps", type=int, default=8000,
                    help="scorer pretraining budget; 8000 is the measured "
                         "knee where the vil_logit head discriminates "
                         "alignment (AUC 0.83) and recovers latent "
                         "difficulty (spearman -0.39) — see BASELINE.md")
    ap.add_argument("--model", default="ENVDROP")
    ap.add_argument("--scans", type=int, default=6)
    ap.add_argument("--nodes", type=int, default=48)
    ap.add_argument("--heterogeneity", type=float, default=1.0,
                    help="train-instruction quality spread (>0 gives paths a "
                         "latent difficulty for the scorer to recover; 0 "
                         "reproduces the round-3 template-uniform negative)")
    ap.add_argument("--out", default="")
    ap.add_argument("--diag-only", action="store_true",
                    help="stop after scorer pretraining + scoring: print the "
                         "scorer-vs-truth diagnostics and skip the (expensive) "
                         "SPCL trainings — for sweeping the pretrain budget")
    args = ap.parse_args()

    import tempfile

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from curriculum_learning_for_vln_tpu import pipeline
    from curriculum_learning_for_vln_tpu.utils.tokenizer import (Tokenizer,
                                                                 build_vocab)
    from curriculum_learning_for_vln_tpu.world import synthetic
    from scripts.parity_matrix import make_cfg

    done = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                r = json.loads(line)
                if r.get("arm") != "diag":
                    done[(r["arm"], r["seed"])] = r["sr"]

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        for seed in range(args.seeds):
            cfg = make_cfg(args.model, "SELF-PACE", 1000 + seed, args.epochs, tmp)
            cfg.TPU.SYNTHETIC_SCANS = args.scans
            cfg.TPU.SYNTHETIC_NODES = args.nodes
            cfg.TPU.SYNTHETIC_HETEROGENEITY = args.heterogeneity
            world, splits, _, feat_dim = pipeline.build_synthetic_universe(cfg, seed=7)
            rooms = synthetic.assign_rooms(world, seed=7)
            vocab_items = (splits["train"] + splits["val_seen"]
                           + splits["val_unseen"])
            tok = Tokenizer(build_vocab(vocab_items, min_count=1),
                            encoding_length=cfg.DATA.MAX_ENC_LEN)

            arm_names = ["scorer", "oracle", "random"] \
                if args.heterogeneity > 0 else ["scorer", "random"]
            if args.diag_only:
                _, diag = build_rounds(cfg, 1000 + seed, args.pretrain_steps,
                                       tok, world, splits, rooms, feat_dim)
                print(json.dumps({"arm": "diag", "seed": seed,
                                  "pretrain_steps": args.pretrain_steps, **diag}))
                continue
            arms = {}
            if any((a, seed) not in done for a in arm_names):
                arms["scorer"], diag = build_rounds(cfg, 1000 + seed,
                                                    args.pretrain_steps, tok, world,
                                                    splits, rooms, feat_dim)
                print(f"# scorer diagnostics seed{seed}: {diag}",
                      file=sys.stderr, flush=True)
                if args.out:
                    with open(args.out, "a") as f:
                        f.write(json.dumps({"arm": "diag", "seed": seed,
                                            **diag}) + "\n")
                arms["random"] = random_rounds(splits["train"], 1000 + seed)
                if args.heterogeneity > 0:
                    # oracle: rounds from the latent ground-truth difficulty
                    # (the curriculum-benefit ceiling; if oracle does not
                    # beat random, the world carries no curriculum signal
                    # and the scorer cannot be blamed)
                    import numpy as _np

                    from curriculum_learning_for_vln_tpu.engine.pretrain import \
                        make_clr2r_rounds
                    truth = _np.array([it["difficulty"]
                                       for it in splits["train"]])
                    arms["oracle"] = make_clr2r_rounds(
                        splits["train"], -truth, n_rounds=5)
            for arm in arm_names:
                key = (arm, seed)
                if key in done:
                    sr = done[key]
                else:
                    sr = spcl_train(cfg, world, arms[arm], splits, tok,
                                    1000 + seed, feat_dim)
                    if args.out:
                        with open(args.out, "a") as f:
                            f.write(json.dumps({"arm": arm, "seed": seed,
                                                "sr": sr}) + "\n")
                print(f"# {arm} seed{seed}: val_unseen SR={sr:.3f}",
                      file=sys.stderr, flush=True)
                results.setdefault(arm, []).append(sr)

    summary = {arm: float(np.mean(v)) for arm, v in results.items()}
    print(json.dumps({"mean_sr": summary, "seeds": args.seeds,
                      "epochs": args.epochs}))


if __name__ == "__main__":
    main()
