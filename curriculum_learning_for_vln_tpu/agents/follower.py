"""Follower agent (Speaker-Follower, Fried et al. 2018).

TPU-native rebuild of `tasks/R2R-judy/src/agent/follower.py:21-232`:
EncoderLSTM + AttnDecoderLSTM with teacher/argmax/sample feedback and
CE-vs-teacher imitation loss.  The whole rollout (encode -> T decoder
steps -> losses) is a single traced program built on
``common.rollout_scan``; per-sample loss vectors for SPCL come for free.
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


class FollowerLosses(NamedTuple):
    ml_loss: jnp.ndarray          # scalar — mean-over-alive CE summed over t
    ml_loss_per_sample: jnp.ndarray  # [B] — SPCL variant


class FollowerAgent:
    name = "FOLLOWER"

    def __init__(self, model_cfg, vocab_size: int, feat_dim: int, episode_len: int,
                 glove=None):
        self.cfg = model_cfg
        self.vocab_size = vocab_size
        self.feature_size = feat_dim + 128
        self.action_emb_size = self.feature_size
        self.episode_len = episode_len
        self.compute_dtype = jnp.float32  # set bfloat16 on TPU for feature-path traffic
        self.glove = glove  # optional frozen pretrained embeddings (ref: units.py:30-37)

    # -- params -----------------------------------------------------------
    def init(self, key) -> Tuple[dict, dict]:
        k1, k2 = jax.random.split(key)
        params = {
            "encoder": encoder_init(
                k1, self.vocab_size, self.cfg.WORD_EMB_SIZE, self.cfg.HIDDEN_SIZE,
                padding_idx=PAD_IDX, bidirectional=self.cfg.ENC_BIDIRECTION,
                num_layers=self.cfg.ENC_LAYERS, glove=self.glove,
            ),
            "decoder": D.follower_decoder_init(
                k2, self.cfg.HIDDEN_SIZE, self.action_emb_size, self.feature_size
            ),
        }
        return params, {}  # no mutable model state

    # -- rollout ----------------------------------------------------------
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
        episode_len: int = None,
    ) -> Tuple[FollowerLosses, C.RolloutResult, dict]:
        params = C.cast_compute_params(params, self.compute_dtype)
        drop = self.cfg.DROP_RATE
        rng, rng_enc = jax.random.split(rng)
        ctx_mask = ep.instr_tokens == PAD_IDX
        ctx, h0, c0 = encoder_apply(
            params["encoder"], ep.instr_tokens, ep.instr_len, rng_enc, train, drop,
            use_glove=self.glove is not None,
        )

        B = ep.instr_tokens.shape[0]
        # carried a_t_prev is a candidate-feature slice — match the feature
        # path's compute dtype so the scan carry type is stable under bf16
        a_prev0 = jnp.zeros((B, self.action_emb_size), self.compute_dtype)

        # fused observation path: the follower's projected visual attention
        # reparameterizes exactly onto the EnvDrop kernel — scores
        # (pano@Wv + bv).(Wh h + bh) == pano.(Wv^T(Wh h + bh)) up to the
        # softmax-invariant bv constant — so the same Pallas op serves both
        # agents (fdrop=0: the follower has no environmental dropout)
        use_fused_obs = fused_obs.enabled_for(world.features, self.compute_dtype)
        MC = world.cand_view.shape[1]
        cand0 = jnp.zeros((B, MC + 1, self.feature_size), self.compute_dtype)

        def model_step(mc, obs, state, rng_t, t):
            h, c, a_prev, _ = mc
            if use_fused_obs:
                tv = D.follower_visual_query(params["decoder"], h)
                vis, cand_img = fused_obs.pano_attend_cands(
                    (0.0, train), state.node, state.view_idx, obs.cand_view,
                    world.features, world.loc_embed, tv, rng_t,
                )
                cand_feat = E2.assemble_cand_feat(cand_img, obs.cand_angle,
                                                  obs.cand_valid)
                logits, (h1, c1), _ = D.follower_decoder_from_vis(
                    params["decoder"], vis, a_prev, cand_feat,
                    h, c, ctx, ctx_mask, rng_t, train, drop,
                )
            else:
                cand_feat = obs.cand_feat
                logits, (h1, c1), _ = D.follower_decoder_step(
                    params["decoder"], obs.pano_feat, a_prev, cand_feat,
                    h, c, ctx, ctx_mask, rng_t, train, drop,
                )
            return logits, (h1, c1, a_prev, cand_feat), h1, jnp.zeros(B)

        def model_post(mc, obs, action):
            # a_t_prev = chosen candidate's feature, taken from the carried
            # cand_feat so the fused path never touches obs.cand_feat (which
            # would keep the XLA gather alive)
            h, c, _, cand_feat = mc
            a = jnp.clip(action, 0, cand_feat.shape[1] - 1)
            a_new = jnp.take_along_axis(cand_feat, a[:, None, None], axis=1)[:, 0, :]
            return (h, c, a_new.astype(self.compute_dtype), cand_feat)

        result = C.rollout_scan(
            world, ep, rng, (h0, c0, a_prev0, cand0), model_step,
            episode_len or self.episode_len, feedback, model_post=model_post,
            avoid_cyclic=avoid_cyclic, compute_dtype=self.compute_dtype,
        )
        losses = FollowerLosses(
            ml_loss=C.ml_loss_mean_over_alive(result.steps),
            ml_loss_per_sample=C.ml_loss_per_sample(result.steps),
        )
        return losses, result, model_state

    # -- training loss ----------------------------------------------------
    def loss_fn(self, losses: FollowerLosses, weights=None) -> jnp.ndarray:
        """Scalar optimization objective.  With SPCL weights w: weighted
        per-sample loss normalized by sum(w) (ref: curriculum.py:297-301)."""
        if weights is None:
            return losses.ml_loss
        return jnp.dot(weights, losses.ml_loss_per_sample) / jnp.sum(weights)
