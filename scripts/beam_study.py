"""Beam-search value study (VERDICT r4 item 2): does dijkstra beam search
with speaker rescoring (ref: tasks/R2R-judy/src/agent/base.py:399-464,
the latent speaker-follower machinery the reference never wires into its
CLI) actually IMPROVE success rate over the greedy argmax rollout, on a
TRAINED checkpoint?

Protocol (grounded synthetic world, the packed-study EnvDrop recipe):
  1. train an EnvDrop agent (ClassicTrainer, --epochs, default 100);
  2. pretrain a speaker on the same world (--speaker-iters teacher-
     forcing steps, engine/self_train.py::pretrain_speaker);
  3. greedy baseline: argmax run_eval on val_unseen;
  4. for each beam size N in --beams: BeamSearch.beam_search, then select
     one path per instruction at every speaker weight in --weights from
     the SAME scored beam (selection is host-side and free), score each.

Wall-clock per beam_search call is recorded (the host-sequential
dijkstra + per-batch rescoring is the part the relay RTT would dominate
on chip — run this on CPU for quality numbers, on the chip for timing).

Writes one JSONL row per (stage, ...) to --out (resumable on the trained
artifacts only via --ckpt-dir; the study itself is cheap after training).

Usage: python scripts/beam_study.py [--epochs 100] [--speaker-iters 800]
         [--beams 1,5,15,30] [--weights 0,0.3,0.5,0.7,0.95] [--out r.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_artifacts(seed: int, epochs: int, speaker_iters: int, tmp: str,
                    ckpt_dir: str = ""):
    """Train the EnvDrop listener + speaker this study scores with.
    Returns (cfg, world, valid_env, tok, agent, params, mstate,
    speaker, spk_params, greedy_summary).

    With ``ckpt_dir`` set, trained weights + the greedy summary persist
    there and a rerun (e.g. to re-select the beam under a new ranking
    rule) skips the ~25 min training stage entirely — the world/env
    rebuild is deterministic (fixed seed=2020)."""
    import jax

    from curriculum_learning_for_vln_tpu import engine, pipeline
    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.agents.speaker import Speaker
    from curriculum_learning_for_vln_tpu.engine.checkpoint import (
        load_checkpoint, save_checkpoint)
    from curriculum_learning_for_vln_tpu.engine.evaluator import Evaluation
    from curriculum_learning_for_vln_tpu.engine.loop import run_eval
    from curriculum_learning_for_vln_tpu.engine.self_train import \
        pretrain_speaker
    from curriculum_learning_for_vln_tpu.engine.trainer import dedup_by_path
    from scripts.packed_study import make_cfg

    cfg = make_cfg(seed, epochs, tmp, "base")
    tok = pipeline.build_tokenizer(cfg)
    world, train_env, valid_env, feat_dim = pipeline.build_environments(
        cfg, tok, seed=2020)
    agent = build_agent(cfg, tok.vocab_size(), feat_dim)
    speaker = Speaker(cfg.AIDE.SPEAKER, tok.vocab_size(), feat_dim=feat_dim,
                      episode_len=cfg.AGENT.MAX_EPISODE_LEN)

    agent_ckpt = spk_ckpt = meta_path = ""
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)
        agent_ckpt = os.path.join(ckpt_dir, f"agent_s{seed}.ckpt")
        spk_ckpt = os.path.join(ckpt_dir, f"speaker_s{seed}.ckpt")
        meta_path = os.path.join(ckpt_dir, f"meta_s{seed}.json")
    if meta_path and all(os.path.exists(p)
                         for p in (agent_ckpt, spk_ckpt, meta_path)):
        bundle = load_checkpoint(agent_ckpt)
        params, mstate = bundle["params"], bundle["model_state"]
        spk_params, _, _ = speaker.load(spk_ckpt)
        with open(meta_path) as f:
            meta = json.load(f)
        return (cfg, world, valid_env, tok, agent, params, mstate, speaker,
                spk_params, meta["greedy"], meta["spk_loss0"],
                meta["spk_loss1"])

    trainer = engine.ClassicTrainer()
    params, mstate, _ = trainer.train(cfg, agent, None, train_env, valid_env,
                                      seed=seed)

    tables = world.device_tables(cfg.TPU.PRECISION)
    spk_params, spk_opt, spk_losses = pretrain_speaker(
        cfg, speaker, tables, train_env, jax.random.PRNGKey(seed + 7),
        speaker_iters)

    env = valid_env["val_unseen"]
    results = run_eval(agent, params, mstate, tables, env,
                       jax.random.PRNGKey(123))
    greedy, _ = Evaluation(world, dedup_by_path(env.data)).score(results)
    if meta_path:
        save_checkpoint(agent_ckpt, params, model_state=mstate)
        speaker.save(spk_ckpt, spk_params, spk_opt)
        with open(meta_path, "w") as f:
            json.dump({"greedy": {k: float(v) for k, v in greedy.items()},
                       "spk_loss0": float(spk_losses[0]),
                       "spk_loss1": float(spk_losses[-1])}, f)
    return (cfg, world, valid_env, tok, agent, params, mstate, speaker,
            spk_params, greedy, float(spk_losses[0]), float(spk_losses[-1]))


def beam_arm(cfg, world, valid_env, agent, params, mstate, speaker,
             spk_params, beam_size: int, weights):
    """One beam_search over val_unseen; returns (wall_s, {w: summary})."""
    from curriculum_learning_for_vln_tpu.agents.beam import BeamSearch
    from curriculum_learning_for_vln_tpu.engine.beam_eval import _select_path
    from curriculum_learning_for_vln_tpu.engine.evaluator import Evaluation
    from curriculum_learning_for_vln_tpu.engine.trainer import dedup_by_path

    henv = valid_env["val_unseen"]
    tables = world.device_tables(cfg.TPU.PRECISION)
    beam = BeamSearch(agent, world, tables)
    t0 = time.time()
    out = beam.beam_search(params, mstate, henv, henv.data, speaker,
                           spk_params, beam_size)
    wall = time.time() - t0

    evaluator = Evaluation(world, dedup_by_path(henv.data))
    by_weight = {}
    for w in weights:
        for ln in (False, True):
            selected = []
            for instr_id, r in out.items():
                if r["paths"]:
                    best = _select_path(r["paths"], w, length_normalize=ln)
                    traj = [[v, float(h), float(e)]
                            for v, h, e in best["trajectory"]]
                else:
                    traj = [[r["dijk_path"][0], 0.0, 0.0]]
                selected.append({"instr_id": instr_id, "trajectory": traj})
            summary, _ = evaluator.score(selected)
            by_weight[(w, ln)] = summary
    n_paths = [len(r["paths"]) for r in out.values()]
    stats = {"episodes": len(out),
             "mean_paths": float(sum(n_paths)) / max(len(n_paths), 1),
             "no_path": int(sum(1 for n in n_paths if n == 0))}
    return wall, by_weight, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--speaker-iters", type=int, default=800)
    ap.add_argument("--beams", default="1,5,15,30")
    ap.add_argument("--weights", default="0,0.3,0.5,0.7,0.95")
    ap.add_argument("--out", default="")
    ap.add_argument("--ckpt-dir", default="",
                    help="persist/reuse the trained listener+speaker here "
                         "(rerunning a new selection rule skips training)")
    args = ap.parse_args()

    import tempfile

    def emit(row):
        line = json.dumps(row)
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")

    beams = [int(b) for b in args.beams.split(",")]
    weights = [float(w) for w in args.weights.split(",")]
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        (cfg, world, valid_env, tok, agent, params, mstate, speaker,
         spk_params, greedy, l0, l1) = train_artifacts(
            1000 + args.seed, args.epochs, args.speaker_iters, tmp,
            ckpt_dir=args.ckpt_dir)
        emit({"stage": "greedy", "seed": args.seed,
              "sr": float(greedy["success_rate"]),
              "spl": float(greedy["spl"]),
              "osr": float(greedy["oracle_rate"]),
              "train_wall_s": round(time.time() - t0, 1),
              "speaker_loss": [l0, l1]})

        for n in beams:
            wall, by_weight, stats = beam_arm(
                cfg, world, valid_env, agent, params, mstate, speaker,
                spk_params, n, weights)
            row = {"stage": "beam", "seed": args.seed, "beam": n,
                   "wall_s": round(wall, 2), **stats}
            for (w, ln), s in by_weight.items():
                suffix = f"ln_w{w}" if ln else f"_w{w}"
                row["sr" + suffix] = round(float(s["success_rate"]), 4)
                row["spl" + suffix] = round(float(s["spl"]), 4)
            emit(row)


if __name__ == "__main__":
    main()
