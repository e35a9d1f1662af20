"""Back-translation self-training driver (speaker-augmented EnvDrop).

The reference carries all the plumbing for EnvDrop's back-translation
stage — `rollout(speaker=...)` generating fake instructions with a shared
environmental-drop mask (`tasks/R2R-judy/src/agent/envdrop.py:105-121`)
and a speaker with its own optimizers (`src/agent/speaker.py:75-88`) —
but ships no trainer that invokes it (SURVEY §2: "latent plumbing";
`trainer.py:361-518` never constructs a Speaker).  This module provides
that driver:

1. pretrain the speaker on teacher-forced shortest-path features;
2. alternate EnvDrop iterations between real instructions (IL+RL) and
   speaker-generated instructions over augmentation episodes with the
   shared drop-noise mask applied to both speaker and follower features.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

from ..agents.speaker import Speaker
from .loop import build_train_step, make_optimizer

logger = logging.getLogger("main.self_train")


def pretrain_speaker(cfg, speaker: Speaker, tables, train_env, rng, iters: int):
    params, opt_state = speaker.init(rng)
    params, opt_state, losses = speaker.train_steps(
        params, opt_state, tables, train_env, jax.random.fold_in(rng, 1), iters)
    logger.info("speaker pretrain: %d iters, loss %.4f -> %.4f",
                iters, losses[0], losses[-1])
    return params, opt_state, losses


def build_backtranslation_step(agent, optimizer):
    """Compiled EnvDrop step over speaker-generated instructions: IL+RL on
    the modified batch with the shared feature-noise mask."""
    import optax

    from ..agents.common import FEEDBACK_SAMPLE, FEEDBACK_TEACHER
    from .loop import clip_submodule_grads

    def step(tables, params, opt_state, model_state, ep, rng, feat_mask):
        def loss_fn(p):
            rng_il, rng_rl = jax.random.split(rng)
            il, _, ms = agent.rollout(
                p, model_state, tables, ep, rng_il,
                feedback=FEEDBACK_TEACHER, train=True, train_ml=True, train_rl=False,
                feat_mask=feat_mask)
            rl, _, _ = agent.rollout(
                p, model_state, tables, ep, rng_rl,
                feedback=FEEDBACK_SAMPLE, train=True, train_ml=False, train_rl=True,
                feat_mask=feat_mask)
            total = il.ml_loss + rl.rl_loss
            return total, (total, ms)

        (loss, (total, ms)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = clip_submodule_grads(grads, ("encoder", "decoder"), 40.0)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, ms, {"loss": total}

    return jax.jit(step, donate_argnums=(1, 2))


def self_train(cfg, agent, speaker: Speaker, train_env, aug_env, tables,
               seed: int = 2020, speaker_iters: int = 200, epochs: int = 1,
               iters_per_epoch: Optional[int] = None):
    """Speaker pretraining then alternating real/back-translated EnvDrop
    training.  ``aug_env`` supplies the augmentation episodes whose
    instructions are replaced by speaker generations.  Runs data-parallel
    over the production mesh like the main trainers (batches sharded,
    params/tables replicated)."""
    from ..parallel import mesh as M
    from .trainer import setup_mesh

    rng = jax.random.PRNGKey(seed)
    rng, r_spk, r_agent = jax.random.split(rng, 3)

    mesh = setup_mesh(cfg, cfg.TRAIN.BATCH_SIZE, train_env, aug_env)
    tables = M.replicate(tables, mesh)

    spk_params, spk_opt, _ = pretrain_speaker(cfg, speaker, tables, train_env,
                                              r_spk, speaker_iters)
    spk_params = M.replicate(spk_params, mesh)

    params, model_state = agent.init(r_agent)
    params = M.replicate(params, mesh)
    optimizer = make_optimizer(cfg.TRAIN.OPTIM, cfg.TRAIN.LR)
    opt_state = optimizer.init(params)
    real_step = build_train_step(agent, optimizer, "sample")
    bt_step = build_backtranslation_step(agent, optimizer)

    iters = iters_per_epoch or cfg.TRAIN.ITER_PER_EPOCH
    losses = {"real": [], "bt": []}
    for ep_i in range(epochs):
        for it in range(iters):
            rng, r1, r2, r3 = jax.random.split(rng, 4)
            if it % 2 == 0:  # real instructions
                batch = train_env.next_batch()
                params, opt_state, model_state, logs = real_step(
                    tables, params, opt_state, model_state, batch, r1)
                losses["real"].append(float(logs["loss"]))
            else:  # back-translated
                batch = aug_env.next_batch()
                new_ep, noise = speaker.back_translate(
                    spk_params, tables, aug_env, batch,
                    enc_len=int(batch.instr_tokens.shape[1]), rng=r2,
                    feat_dim=agent.img_feat_size)
                params, opt_state, model_state, logs = bt_step(
                    tables, params, opt_state, model_state, new_ep, r3, noise)
                losses["bt"].append(float(logs["loss"]))
        logger.info("self-train epoch %d: real %.4f bt %.4f", ep_i,
                    np.mean(losses["real"][-iters // 2:]),
                    np.mean(losses["bt"][-iters // 2:]))
    return params, model_state, (spk_params, spk_opt), losses
