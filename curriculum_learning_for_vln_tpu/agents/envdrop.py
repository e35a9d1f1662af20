"""EnvDrop agent (Tan et al. 2019): IL + A2C with environmental dropout.

TPU-native rebuild of `tasks/R2R-judy/src/agent/envdrop.py:22-335`:
EncoderLSTM + EnvDropDecoder + Critic.  The IL path is CE-vs-teacher
summed over batch and time; the RL path is advantage actor-critic over
the sampled rollout — discounted returns bootstrapped from one extra
decoder step's value, 0.5 L2 critic loss, and a -0.01 entropy bonus, all
masked by alive flags (ref: envdrop.py:222-264).  Back-translation
support: a shared feature-noise mask can be applied in place of per-step
environmental dropout (ref: envdrop.py:105-121, 155-157).

The classic trainer runs both phases on the *same* minibatch per
iteration (teacher-forced IL then sampled RL with ``restart=True``,
ref: trainer.py:411-421); both phases here are pure function calls that
the trainer fuses into one jitted update.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..env import env as E2
from ..env.env import EpisodeBatch
from ..models import decoders as D
from ..ops import fused_obs
from ..models.encoder import encoder_apply, encoder_init
from ..utils.angles import make_angle_feat
from ..utils.tokenizer import PAD_IDX
from ..world.compiler import WorldTables
from . import common as C


class EnvDropLosses(NamedTuple):
    ml_loss: jnp.ndarray              # scalar: summed CE * ML_WEIGHT / B (ref: envdrop.py:268)
    ml_loss_per_sample: jnp.ndarray   # [B]: per-sample CE sums (SPCL)
    rl_loss: jnp.ndarray              # scalar A2C loss (normalized per RL_NORMALIZE)
    rl_loss_per_sample: jnp.ndarray   # [B]
    entropy_sum: jnp.ndarray          # scalar log
    critic_loss_sum: jnp.ndarray      # scalar log
    total_actions: jnp.ndarray        # scalar log (sum of alive masks)


class EnvDropAgent:
    name = "ENVDROP"

    def __init__(self, model_cfg, max_enc_len: int, vocab_size: int, feat_dim: int, episode_len: int):
        self.cfg = model_cfg
        self.max_enc_len = max_enc_len
        self.vocab_size = vocab_size
        self.img_feat_size = feat_dim
        self.angle_feat_size = 128
        self.feature_size = feat_dim + 128
        self.episode_len = episode_len
        self.compute_dtype = jnp.float32  # set bfloat16 on TPU for feature-path traffic
        # hand-written rollout backward (ops/bptt.py); build_agent sets this
        # from cfg.TPU.FUSED_BPTT
        self.use_fused_bptt = False

    def init(self, key) -> Tuple[dict, dict]:
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": encoder_init(
                k1, self.vocab_size, self.cfg.WORD_EMB_SIZE, self.cfg.HIDDEN_SIZE,
                padding_idx=PAD_IDX, bidirectional=self.cfg.ENC_BIDIRECTION,
                num_layers=self.cfg.ENC_LAYERS,
            ),
            "decoder": D.envdrop_decoder_init(
                k2, self.cfg.HIDDEN_SIZE, self.cfg.ACT_EMB_SIZE,
                self.angle_feat_size, self.feature_size,
            ),
            "critic": D.critic_init(k3, self.cfg.HIDDEN_SIZE),
        }
        return params, {}

    # ------------------------------------------------------------------
    def _build_decode(self, params, world, train, drop, fdrop, use_fused_obs,
                      feat_mask=None):
        """One decoder step with the text context passed explicitly —
        shared by the per-batch rollout (ctx closed over) and the packed
        rollout (ctx gathered per step from the episode pool)."""
        already_drop = feat_mask is not None

        def apply_feat_mask(feat):
            img, ang = feat[..., : -self.angle_feat_size], feat[..., -self.angle_feat_size:]
            return jnp.concatenate([img * feat_mask, ang], axis=-1)

        def decode(mc, ctx, ctx_mask, obs, state, rng_t):
            h, c, h_tilde = mc
            a_t_angle = make_angle_feat(state.heading, state.elevation)
            if use_fused_obs:
                tv = D.envdrop_visual_query(params["decoder"], h_tilde, rng_t,
                                            train, drop)
                vis, cand_img = fused_obs.pano_attend_cands(
                    (fdrop, train), state.node, state.view_idx, obs.cand_view,
                    world.features, world.loc_embed, tv,
                    jax.random.fold_in(rng_t, 1),
                )
                # fused candidate scoring: assemble + env-dropout + scorer
                # einsum in one kernel; no [B, K, F] tensor or mask is ever
                # materialized (ops/pallas/cand_score.py)
                scorer = lambda q: fused_obs.cand_attend_logits(
                    (fdrop, train), cand_img, obs.cand_angle, obs.cand_valid,
                    q, jax.random.fold_in(rng_t, 2))
                logits, (h1, c1), h_tilde_new = D.envdrop_decoder_from_vis(
                    params["decoder"], a_t_angle, vis, None, h_tilde, c,
                    ctx, ctx_mask, rng_t, train, drop, cand_scorer=scorer,
                )
                return logits, (h1, c1, h_tilde_new), h1
            pano, cand = obs.pano_feat, obs.cand_feat
            if already_drop:
                pano, cand = apply_feat_mask(pano), apply_feat_mask(cand)
            logits, (h1, c1), h_tilde_new = D.envdrop_decoder_step(
                params["decoder"], a_t_angle, pano, cand, h_tilde, h, c,
                ctx, ctx_mask, rng_t, train, drop, fdrop,
                self.angle_feat_size, already_dropfeat=already_drop,
            )
            return logits, (h1, c1, h_tilde_new), h1

        return decode

    # ------------------------------------------------------------------
    def rollout_packed(
        self,
        params: dict,
        model_state: dict,
        world: WorldTables,
        pool: EpisodeBatch,   # N = factor * B episodes, all valid
        rng,
        batch_size: int,
        feat_mask: Optional[jnp.ndarray] = None,
        episode_len: Optional[int] = None,
    ):
        """Packed sampled-RL rollout over an episode pool (continuous
        batching — agents/packed.py).  Returns (PackedLosses, PackedResult).

        With N == B this computes the exact unpacked `rollout(train_rl=True)`
        A2C loss (asserted in tests/test_packed.py); with N > B ended slots
        refill immediately, so one dispatch completes ~N/B x the episodes.
        The rng call structure deliberately mirrors `rollout` line for
        line so the two stay comparable."""
        from .packed import packed_a2c, packed_rollout_scan

        params = C.cast_compute_params(params, self.compute_dtype)
        drop = self.cfg.DROP_RATE
        fdrop = self.cfg.FEAT_DROP_RATE
        rng, rng_enc = jax.random.split(rng)
        ctx_mask_pool = pool.instr_tokens == PAD_IDX
        ctx_pool, h0_pool, c0_pool = encoder_apply(
            params["encoder"], pool.instr_tokens, pool.instr_len, rng_enc, True, drop
        )
        use_fused_obs = (
            feat_mask is None
            and fused_obs.enabled_for(world.features, self.compute_dtype)
        )
        decode = self._build_decode(params, world, True, drop, fdrop,
                                    use_fused_obs, feat_mask)
        result = packed_rollout_scan(
            world, pool, rng, ctx_pool, ctx_mask_pool, h0_pool, c0_pool,
            decode, batch_size, episode_len or self.episode_len,
            compute_dtype=self.compute_dtype,
        )

        # A2C tail, mirroring rollout() (ref: envdrop.py:222-264)
        rng, rng_last, rng_crit = jax.random.split(rng, 3)
        last_obs = E2.observe(world, result.final_state)
        ctx_last = ctx_pool[result.final_slot_ep]
        cmask_last = ctx_mask_pool[result.final_slot_ep]
        _, _, last_h = decode(result.final_carry, ctx_last, cmask_last,
                              last_obs, result.final_state, rng_last)
        last_value = jax.lax.stop_gradient(
            D.critic_apply(params["critic"], last_h, rng_crit, True, drop)
        )
        T = result.steps.reward.shape[0]
        crit_rngs = jax.random.split(jax.random.fold_in(rng, 7), T)
        values = jax.vmap(
            lambda h, r: D.critic_apply(params["critic"], h, r, True, drop)
        )(result.steps.hidden[::-1], crit_rngs)

        losses = packed_a2c(result, values, last_value, self.cfg.GAMMA,
                            self.cfg.RL_NORMALIZE, ctx_pool.shape[0])
        return losses, result

    # ------------------------------------------------------------------
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
        train_ml: bool = True,
        train_rl: bool = False,
        feat_mask: Optional[jnp.ndarray] = None,  # [D] shared noise (back-translation)
        episode_len: Optional[int] = None,
    ) -> Tuple[EnvDropLosses, C.RolloutResult, dict]:
        if feedback != C.FEEDBACK_SAMPLE:
            train_rl = False  # (ref: envdrop.py:100)
        # bf16 compute copies: halves weight HBM traffic in the step chain
        params = C.cast_compute_params(params, self.compute_dtype)
        drop = self.cfg.DROP_RATE
        fdrop = self.cfg.FEAT_DROP_RATE
        rng, rng_enc = jax.random.split(rng)
        ctx_mask = ep.instr_tokens == PAD_IDX
        ctx, h0, c0 = encoder_apply(
            params["encoder"], ep.instr_tokens, ep.instr_len, rng_enc, train, drop
        )
        B = ep.instr_tokens.shape[0]
        already_drop = feat_mask is not None

        # fused observation path (ops/fused_obs.py): the Pallas kernel
        # streams feature rows and emits (vis, cand rows) directly, so the
        # decode below never touches obs.pano_feat/obs.cand_feat and XLA
        # dead-code-eliminates the [B, 36, D] gather+concat entirely
        use_fused_obs = (
            not already_drop
            and fused_obs.enabled_for(world.features, self.compute_dtype)
        )

        decode_cc = self._build_decode(params, world, train, drop, fdrop,
                                       use_fused_obs, feat_mask)

        def decode(mc, obs, state, rng_t):
            return decode_cc(mc, ctx, ctx_mask, obs, state, rng_t)

        def model_step(mc, obs, state, rng_t, t):
            logits, mc2, h1 = decode(mc, obs, state, rng_t)
            return logits, mc2, h1, jnp.zeros(B)

        # h_tilde initialized to the encoder's h (ref: envdrop.py:150)
        if train and self.use_fused_bptt:
            # identical forward, hand-written backward (ops/bptt.py)
            from ..ops.bptt import envdrop_rollout_bptt

            result = envdrop_rollout_bptt(
                params["decoder"], ctx, ctx_mask, h0, c0, world, ep, rng,
                episode_len=episode_len or self.episode_len, feedback=feedback,
                train=train, drop=drop, fdrop=fdrop,
                angle_feat_size=self.angle_feat_size, avoid_cyclic=avoid_cyclic,
                feat_mask=feat_mask, compute_dtype=self.compute_dtype,
            )
        else:
            result = C.rollout_scan(
                world, ep, rng, (h0, c0, h0), model_step,
                episode_len or self.episode_len, feedback,
                avoid_cyclic=avoid_cyclic, compute_dtype=self.compute_dtype,
            )
        steps = result.steps

        ml_sum = C.ml_loss_sum(steps)
        ml_vec = C.ml_loss_per_sample(steps)

        # ---------------- A2C tail (ref: envdrop.py:222-264) ----------------
        if train_rl:
            rng, rng_last, rng_crit = jax.random.split(rng, 3)
            from ..env import env as E

            last_obs = E.observe(world, result.final_state)
            _, _, last_h = decode(result.model_carry, last_obs, result.final_state, rng_last)
            last_value = jax.lax.stop_gradient(
                D.critic_apply(params["critic"], last_h, rng_crit, train, drop)
            )
            not_ended = jnp.logical_not(result.final_state.ended).astype(jnp.float32)
            gamma = self.cfg.GAMMA

            T = steps.reward.shape[0]
            crit_rngs = jax.random.split(jax.random.fold_in(rng, 7), T)
            # critic values for all steps as ONE batched matmul instead of
            # 35 tiny per-step matmuls inside the reverse scan (same
            # per-step dropout keys -> identical values on the threefry
            # path; under the TPU rbg fast-RNG mode vmap is not guaranteed
            # bit-invariant with sequential draws — masks are still valid
            # iid dropout and fwd/bwd stay consistent; the scan below
            # keeps only the elementwise return/advantage recurrence)
            values = jax.vmap(
                lambda h, r: D.critic_apply(params["critic"], h, r, train, drop)
            )(steps.hidden[::-1], crit_rngs)

            def a2c_step(carry, xs):
                discount = carry
                reward, mask_b, v_, log_prob, entropy = xs
                mask = mask_b.astype(jnp.float32)
                discount = discount * gamma + reward
                r_ = jax.lax.stop_gradient(discount)
                a_ = jax.lax.stop_gradient(r_ - v_)
                loss_vec = (-log_prob * a_ * mask) + 0.5 * ((r_ - v_) ** 2) * mask
                if feedback == C.FEEDBACK_SAMPLE:
                    loss_vec = loss_vec - 0.01 * entropy * mask
                critic_l = jnp.sum(((r_ - v_) ** 2) * mask)
                return discount, (loss_vec, critic_l, jnp.sum(mask))

            xs = (
                steps.reward[::-1],
                steps.alive_before[::-1],
                values,
                steps.log_prob[::-1],
                steps.entropy[::-1],
            )
            _, (rl_vecs, critic_ls, mask_sums) = jax.lax.scan(a2c_step, not_ended * last_value, xs)
            rl_vec = jnp.sum(rl_vecs, axis=0)
            total = jnp.maximum(jnp.sum(mask_sums), 1.0)
            if self.cfg.RL_NORMALIZE == "total":
                rl_vec = rl_vec / total
            elif self.cfg.RL_NORMALIZE == "batch":
                rl_vec = rl_vec / B
            rl_scalar = jnp.sum(rl_vec)
            critic_loss_sum = jnp.sum(critic_ls)
        else:
            rl_vec = jnp.zeros(B)
            rl_scalar = jnp.zeros(())
            critic_loss_sum = jnp.zeros(())
            total = jnp.sum(steps.alive_before)

        ml_weight = self.cfg.ML_WEIGHT
        losses = EnvDropLosses(
            ml_loss=(ml_sum * ml_weight / B) if train_ml else jnp.zeros(()),
            ml_loss_per_sample=(ml_vec * ml_weight / B) if train_ml else jnp.zeros(B),
            rl_loss=rl_scalar if train_rl else jnp.zeros(()),
            rl_loss_per_sample=rl_vec if train_rl else jnp.zeros(B),
            entropy_sum=jnp.sum(steps.entropy * steps.alive_before),
            critic_loss_sum=critic_loss_sum,
            total_actions=jnp.asarray(total, jnp.float32),
        )
        return losses, result, model_state

    def loss_fn(self, losses: EnvDropLosses, weights=None) -> jnp.ndarray:
        """IL + RL objective; with SPCL weights, dot(w, per-sample) without
        sum-normalization (ref: curriculum.py:294-296)."""
        if weights is None:
            return losses.ml_loss + losses.rl_loss
        per_sample = losses.ml_loss_per_sample + losses.rl_loss_per_sample
        return jnp.dot(weights, per_sample)
