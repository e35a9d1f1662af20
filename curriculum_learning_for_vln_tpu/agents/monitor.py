"""Self-Monitoring agent (Ma et al. 2019).

TPU-native rebuild of `tasks/R2R-judy/src/agent/monitor.py:21-258`:
EncoderLSTM + MonitorDecoder with a joint action-CE + progress-MSE loss:
t = 0 contributes only the action loss; t > 0 contributes
``lamb * MSE(progress, target) + (1 - lamb) * CE`` with the progress
target being the normalized distance reduction, clamped to 1 within 3 m
of the goal, and frozen (zero loss) for ended episodes
(ref: monitor.py:148-165).  BatchNorm running statistics are carried
through the rollout scan explicitly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..env import env as E2
from ..env.env import EpisodeBatch
from ..models import decoders as D
from ..models.encoder import encoder_apply, encoder_init
from ..ops import fused_obs
from ..utils.tokenizer import PAD_IDX
from ..world.compiler import WorldTables
from . import common as C


class MonitorLosses(NamedTuple):
    ml_loss: jnp.ndarray             # scalar joint loss (reference reductions)
    ml_loss_per_sample: jnp.ndarray  # [B] joint per-sample (SPCL)
    progress_loss: jnp.ndarray       # scalar (recording only, ref monitor.py:128)


class SelfMonitorAgent:
    name = "SELF-MONITOR"

    def __init__(self, model_cfg, max_enc_len: int, vocab_size: int, feat_dim: int, episode_len: int):
        self.cfg = model_cfg
        self.max_enc_len = max_enc_len
        self.vocab_size = vocab_size
        self.feature_size = feat_dim + 128
        self.action_emb_size = self.feature_size
        self.episode_len = episode_len
        self.compute_dtype = jnp.float32  # set bfloat16 on TPU for feature-path traffic

    def init(self, key) -> Tuple[dict, dict]:
        k1, k2 = jax.random.split(key)
        dec_params, dec_state = D.monitor_decoder_init(
            k2, self.cfg.HIDDEN_SIZE, self.max_enc_len,
            mlp_dims=tuple(self.cfg.MLP_HIDDEN), action_embed_size=self.action_emb_size,
        )
        params = {
            "encoder": encoder_init(
                k1, self.vocab_size, self.cfg.WORD_EMB_SIZE, self.cfg.HIDDEN_SIZE,
                padding_idx=PAD_IDX, bidirectional=self.cfg.ENC_BIDIRECTION,
                num_layers=self.cfg.ENC_LAYERS,
            ),
            "decoder": dec_params,
        }
        return params, {"decoder_bn": dec_state}

    def rollout(
        self,
        params: dict,
        model_state: dict,
        world: WorldTables,
        ep: EpisodeBatch,
        rng,
        feedback: int,
        train: bool,
        avoid_cyclic: bool = False,
        lamb: float = 0.5,
        episode_len: int = None,
    ) -> Tuple[MonitorLosses, C.RolloutResult, dict]:
        params = C.cast_compute_params(params, self.compute_dtype)
        drop = self.cfg.DROP_RATE
        rng, rng_enc = jax.random.split(rng)
        # monitor pads ctx/mask to the full MAX_ENC_LEN (ref: monitor.py:68-87)
        ctx_mask = ep.instr_tokens == PAD_IDX
        ctx, h0, c0 = encoder_apply(
            params["encoder"], ep.instr_tokens, ep.instr_len, rng_enc, train, drop
        )

        B = ep.instr_tokens.shape[0]
        a_prev0 = jnp.zeros((B, self.action_emb_size), self.compute_dtype)

        # the monitor's decoder attends over candidates, not the panorama —
        # with the fused observation op in cands_only mode the [B, 36, D]
        # feature gather never materializes (the op streams rows and emits
        # just the candidate features; its backward is a static zero)
        use_fused_obs = fused_obs.enabled_for(world.features, self.compute_dtype)
        MC = world.cand_view.shape[1]
        cand0 = jnp.zeros((B, MC + 1, self.feature_size), self.compute_dtype)

        def model_step(mc, obs, state, rng_t, t):
            h, c, a_prev, bn, _ = mc
            if use_fused_obs:
                dummy_tv = jnp.zeros((B, self.feature_size), jnp.float32)
                _, cand_img = fused_obs.pano_attend_cands(
                    (0.0, train, True), state.node, state.view_idx, obs.cand_view,
                    world.features, world.loc_embed, dummy_tv, rng_t,
                )
                cand_feat = E2.assemble_cand_feat(cand_img, obs.cand_angle,
                                                  obs.cand_valid)
            else:
                cand_feat = obs.cand_feat
            (logits, progress), (h1, c1), bn2, _ = D.monitor_decoder_step(
                params["decoder"], bn, a_prev, cand_feat, obs.cand_mask,
                h, c, ctx, ctx_mask, rng_t, train, drop,
            )
            return logits, (h1, c1, a_prev, bn2, cand_feat), h1, progress

        def model_post(mc, obs, action):
            h, c, _, bn, cand_feat = mc
            a = jnp.clip(action, 0, cand_feat.shape[1] - 1)
            a_new = jnp.take_along_axis(cand_feat, a[:, None, None], axis=1)[:, 0, :]
            return (h, c, a_new.astype(self.compute_dtype), bn, cand_feat)

        result = C.rollout_scan(
            world, ep, rng, (h0, c0, a_prev0, model_state["decoder_bn"], cand0),
            model_step, episode_len or self.episode_len, feedback,
            model_post=model_post, avoid_cyclic=avoid_cyclic, compute_dtype=self.compute_dtype,
        )
        steps = result.steps

        # progress targets (ref: monitor.py:153-157): based on the distance
        # at the current state = dist_after of the previous step.
        start_dist = jnp.take_along_axis(world.dist[ep.start_node], ep.goal_local[:, None], axis=1)[:, 0]
        dist_before = jnp.concatenate(
            [start_dist[None, :], steps.dist_after[:-1]], axis=0
        )  # [T, B]
        target = (start_dist[None, :] - dist_before) / jnp.maximum(start_dist[None, :], 1e-8)
        target = jnp.where(dist_before <= 3.0, 1.0, target)
        alive = steps.alive_before
        mse_vec = jnp.where(alive, (steps.progress - target) ** 2, 0.0)  # ended: frozen target
        T = mse_vec.shape[0]
        t_gt0 = (jnp.arange(T) > 0)[:, None]

        # scalar (reference reductions): per step t>0:
        #   lamb * mean_B(mse) + (1-lamb) * mean_alive(ce); at t=0 just CE.
        ce_step_mean = jnp.sum(steps.ce, axis=1) / jnp.maximum(steps.ce_count, 1)
        mse_step_mean = jnp.mean(mse_vec, axis=1)
        ml_scalar = jnp.sum(
            jnp.where(jnp.arange(T) > 0,
                      lamb * mse_step_mean + (1 - lamb) * ce_step_mean,
                      ce_step_mean)
        )
        # per-sample (SPCL): joint vector summed over time (ref: monitor.py:151-165)
        joint_vec = jnp.where(t_gt0, lamb * mse_vec + (1 - lamb) * steps.ce, steps.ce)
        ml_vec = jnp.sum(joint_vec, axis=0)

        losses = MonitorLosses(
            ml_loss=ml_scalar,
            ml_loss_per_sample=ml_vec,
            progress_loss=jnp.sum(mse_step_mean[1:]),
        )
        new_model_state = {"decoder_bn": result.model_carry[3]} if train else model_state
        return losses, result, new_model_state

    def loss_fn(self, losses: MonitorLosses, weights=None) -> jnp.ndarray:
        if weights is None:
            return losses.ml_loss
        return jnp.dot(weights, losses.ml_loss_per_sample) / jnp.sum(weights)
