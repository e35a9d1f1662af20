"""Beam-search inference/rescoring stage behind ``main.py --beam N``.

The reference exposes ``beam_search(speaker, beam_size=30)`` on every
agent (ref: tasks/R2R-judy/src/agent/base.py:452-464) but never wires it
into its CLI — the collected results are latent.  Here the flag runs the
full host-orchestrated dijkstra expansion + speaker rescoring
(agents/beam.py) over every validation split, selects one path per
instruction by combined listener+speaker log-likelihood (the
speaker-follower pragmatic-rescoring rule, Fried et al. '18 — the paper
behind the reference's beam machinery), writes BOTH

* the reference results-submission format
  ``[{"instr_id", "trajectory": [(viewpoint, heading, elevation), ...]}]``
  (ref: evaluator.py:12-18) to ``beam_<split>.json``, and
* the full scored beam (all candidate paths with listener/speaker score
  arrays) to ``beam_<split>_full.json`` for downstream re-ranking,

then scores the selected trajectories with the standard evaluator.
"""
from __future__ import annotations

import json
import logging
import os
import os.path as osp

import jax
import numpy as np

logger = logging.getLogger("main.beam_eval")


def _select_path(paths, speaker_weight: float, length_normalize: bool = False):
    """Rank candidate paths by (1-w)·Σ listener log-prob + w·Σ speaker
    log-prob.  ``speaker_scores`` are per-word log-probs (the stored
    negative teacher-forcing loss), ``listener_scores`` per-step action
    log-probs.

    ``length_normalize`` divides the listener term by the number of
    actions (mean per-step log-prob).  The raw sum penalizes every extra
    step, so dijkstra's first-found (max-sum) path is the listener-max
    selection at any beam width — selection degenerates to beam=1 and the
    beam's diversity never matters (measured: identical SR across N ∈
    {1,5,15,30} at w ≤ 0.7, BASELINE.md round 5).  The mean removes that
    short-path bias.  The speaker term is left as the sum: every
    candidate scores the SAME instruction, so its word count is a shared
    constant and normalizing it only rescales w."""

    def score(p):
        lst = float(np.sum(p["listener_scores"]))
        if length_normalize:
            lst /= max(len(p["listener_scores"]), 1)
        spk = float(np.sum(p["speaker_scores"]))
        return (1.0 - speaker_weight) * lst + speaker_weight * spk

    return max(paths, key=score)


def run_beam_eval(cfg, agent, world, valid_env, tok, beam_size: int,
                  seed: int = 2020):
    """Returns {split: summary_dict}; writes result files under
    OUTPUT.RESULT_DIR (default: <CKPT_DIR>/../results)."""
    from ..agents.beam import BeamSearch
    from ..agents.speaker import Speaker
    from ..utils.logging_utils import format_score_table
    from .checkpoint import load_checkpoint
    from .evaluator import Evaluation
    from .trainer import dedup_by_path

    tables = world.device_tables(cfg.TPU.PRECISION)
    rng = jax.random.PRNGKey(seed)
    params, model_state = agent.init(rng)

    ckpt_root = cfg.OUTPUT.CKPT_DIR or "snapshots/checkpoints"
    if cfg.OUTPUT.RESUME:
        ckpt_path = osp.join(ckpt_root, f"{cfg.OUTPUT.RESUME}.ckpt")
        logger.info("beam eval: loading agent checkpoint %s", ckpt_path)
        bundle = load_checkpoint(ckpt_path)
        params = bundle["params"]
        if bundle.get("model_state"):
            model_state = bundle["model_state"]
    else:
        logger.warning("beam eval: OUTPUT.RESUME is empty — using freshly "
                       "initialized agent weights")

    import jax.numpy as jnp

    speaker = Speaker(cfg.AIDE.SPEAKER, tok.vocab_size(),
                      feat_dim=tables.feat_dim,
                      episode_len=cfg.AGENT.MAX_EPISODE_LEN,
                      compute_dtype=jnp.bfloat16
                      if cfg.TPU.PRECISION == "bf16" else jnp.float32)
    spk_params, _ = speaker.init(jax.random.fold_in(rng, 1))
    if cfg.AIDE.SPEAKER.RESUME:
        logger.info("beam eval: loading speaker checkpoint %s",
                    cfg.AIDE.SPEAKER.RESUME)
        spk_params, _, _ = speaker.load(cfg.AIDE.SPEAKER.RESUME)
    else:
        logger.warning("beam eval: AIDE.SPEAKER.RESUME is empty — speaker "
                       "rescoring uses freshly initialized weights")

    results_dir = cfg.OUTPUT.RESULT_DIR or osp.join(
        osp.dirname(ckpt_root.rstrip("/")) or ".", "results")
    os.makedirs(results_dir, exist_ok=True)

    beam = BeamSearch(agent, world, tables)
    w = float(cfg.TPU.BEAM_SPEAKER_WEIGHT)
    len_norm = bool(cfg.TPU.BEAM_LEN_NORM)
    summaries = {}
    for split, henv in valid_env.items():
        out = beam.beam_search(params, model_state, henv, henv.data,
                               speaker, spk_params, beam_size)
        selected, full = [], []
        for instr_id, r in out.items():
            if r["paths"]:
                best = _select_path(r["paths"], w, len_norm)
                traj = [[v, float(h), float(e)] for v, h, e in best["trajectory"]]
            else:  # expansion budget exhausted before any <end> state
                traj = [[r["dijk_path"][0], 0.0, 0.0]]
            selected.append({"instr_id": instr_id, "trajectory": traj})
            full.append({
                "instr_id": instr_id,
                "dijk_path": r["dijk_path"],
                "paths": [{
                    "trajectory": [[v, float(h), float(e)] for v, h, e in p["trajectory"]],
                    "listener_scores": [float(s) for s in p["listener_scores"]],
                    "speaker_scores": [float(s) for s in np.asarray(p["speaker_scores"])],
                } for p in r["paths"]],
            })

        sel_path = osp.join(results_dir, f"beam_{split}.json")
        with open(sel_path, "w") as f:
            json.dump(selected, f)
        with open(osp.join(results_dir, f"beam_{split}_full.json"), "w") as f:
            json.dump(full, f)

        evaluator = Evaluation(world, dedup_by_path(henv.data))
        summary, _ = evaluator.score(selected)
        logger.info("beam(%d) %s -> %s\n%s", beam_size, split, sel_path,
                    format_score_table({split: summary}))
        print(f"beam({beam_size}) {split}: SR={summary['success_rate']:.3f} "
              f"SPL={summary['spl']:.3f} -> {sel_path}")
        summaries[split] = summary
    return summaries
