"""Packed RL rollouts: continuous batching inside one `lax.scan`.

The reference rolls out a fixed minibatch and (like our `rollout_scan`)
pays a full model step for every slot until the horizon, even though most
episodes stop long before it — measured sample-level utilization is
~30-35% (BASELINE.md "rollout utilization"): with a converged policy all
64 episodes of a T=15 batch have ended by step 7-9.  The all-ended early
exit (TPU.SCAN_EARLY_EXIT) recovers the fully-dead *tail*; this module
recovers the per-slot waste as well, the way high-throughput RL systems
(EnvPool / Sample Factory-style continuous batching) do: when a slot's
episode ends, the scan immediately restarts it on the next episode from a
device-resident pool, so every scan step runs at ~full batch utilization
and one rollout dispatch completes ~pool/batch times more episodes.

Everything is static-shape and TPU-friendly:

* the pool (N = factor * B episodes) is encoded ONCE up front; per step
  the [B] active rows of the [N, L, H] context are gathered by the
  slot->episode index carried in the scan (text attention reads all of
  ctx every step anyway, so the gather adds no asymptotic traffic);
* refill is a cumsum slot-assignment plus [B]-row gathers and wheres —
  no host involvement, no dynamic shapes;
* A2C returns segment by episode: the reverse-time discount carry resets
  at each episode's terminal step, and only the final (possibly
  truncated) segment of each slot bootstraps from the critic — with
  N == B the recurrence is value-identical to the unpacked
  `EnvDropAgent.rollout` A2C (asserted in tests/test_packed.py).

This is a deliberate *capability deviation* from the reference (batch
composition changes: one update sees ~factor x more episodes for the RL
term at ~1x rollout cost).  The SCHEMA default is off (TPU.PACKED_RL =
0 — reference semantics, the parity path); the shipped production
envdrop configs set PACKED_RL: 3 (measured +31% episodes/s on chip and
+0.033 final SR over 3 seeds, BASELINE.md packed study).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..env import env as E
from ..env.env import EnvState, EpisodeBatch
from ..world.compiler import WorldTables
from . import common as C


class PackedStep(NamedTuple):
    """Stacked [T, B] outputs of the packed scan (RL-relevant fields)."""

    slot_ep: jnp.ndarray       # [T, B] i32 pool episode active at this step
    alive_before: jnp.ndarray  # [T, B] bool
    ended_now: jnp.ndarray     # [T, B] bool — the episode's terminal step
    reward: jnp.ndarray        # [T, B] f32 shaped reward (alive-masked)
    log_prob: jnp.ndarray      # [T, B]
    entropy: jnp.ndarray       # [T, B]
    hidden: jnp.ndarray        # [T, B, H] decoder hidden (critic input)


class PackedResult(NamedTuple):
    steps: PackedStep
    final_state: EnvState
    final_carry: tuple         # decoder carry (h, c, h_tilde)
    final_slot_ep: jnp.ndarray # [B]
    episodes_started: jnp.ndarray  # scalar i32 (<= N)
    episodes_done: jnp.ndarray     # scalar i32


def _sel(flag: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-row select with trailing-dim broadcast ([B] flag over [B, ...])."""
    return jnp.where(flag.reshape(flag.shape + (1,) * (a.ndim - 1)), a, b)


def _gather_rows(tree, ids: jnp.ndarray):
    return jax.tree_util.tree_map(lambda a: a[ids], tree)


def packed_rollout_scan(
    world: WorldTables,
    pool: EpisodeBatch,            # N episodes, ALL valid — trainers verify
                                   # once via engine.loop.check_pool_valid
                                   # (a padding episode would be refilled
                                   # born-ended and skew utilization)
    rng,
    ctx_pool: jnp.ndarray,         # [N, L, H] encoder outputs
    ctx_mask_pool: jnp.ndarray,    # [N, L] bool padding mask
    h0_pool: jnp.ndarray,          # [N, H]
    c0_pool: jnp.ndarray,          # [N, H]
    decode: Callable,              # (mc, ctx, ctx_mask, obs, state, rng) -> (logits, mc2, h1)
    batch_size: int,
    episode_len: int,
    compute_dtype=jnp.float32,
) -> PackedResult:
    """Run `episode_len` packed scan steps over `batch_size` slots, refilling
    ended slots from the pool until it is exhausted (sample feedback)."""
    N = ctx_pool.shape[0]
    B = batch_size
    ids0 = jnp.arange(B, dtype=jnp.int32)
    state0 = E.reset(world, _gather_rows(pool, ids0))
    mc0 = (h0_pool[:B], c0_pool[:B], h0_pool[:B])  # h_tilde starts at h (ref: envdrop.py:150)

    def step(carry, t):
        state, mc, slot_ep, next_ptr, rng = carry
        rng, rng_model, rng_act = jax.random.split(rng, 3)

        ctx = ctx_pool[slot_ep]
        ctx_mask = ctx_mask_pool[slot_ep]
        obs = E.observe(world, state, compute_dtype=compute_dtype)
        logits, mc2, h1 = decode(mc, ctx, ctx_mask, obs, state, rng_model)
        masked_logits = jnp.where(obs.cand_mask, C.NEG_INF, logits)
        action, log_prob, entropy = C.select_action(
            C.FEEDBACK_SAMPLE, masked_logits, obs.teacher, rng_act)

        alive_before = jnp.logical_not(state.ended)
        is_stop = E.action_is_stop(world, state, action)
        new_state = E.step(world, state, action)
        dist_after = jnp.take_along_axis(
            world.dist[new_state.node], state.goal_local[:, None], axis=1)[:, 0]
        reward = C.shaped_reward(is_stop, obs.dist, dist_after, alive_before)
        ended_now = jnp.logical_and(new_state.ended, alive_before)

        rec = PackedStep(
            slot_ep=slot_ep, alive_before=alive_before, ended_now=ended_now,
            reward=reward, log_prob=log_prob, entropy=entropy, hidden=h1,
        )

        # ---- refill ended slots from the pool (static-shape) ----
        want = new_state.ended
        offs = jnp.cumsum(want.astype(jnp.int32)) - 1
        cand_ids = next_ptr + offs
        can = jnp.logical_and(want, cand_ids < N)
        ids = jnp.where(can, cand_ids, slot_ep).astype(jnp.int32)
        fresh = E.reset(world, _gather_rows(pool, ids))
        state3 = jax.tree_util.tree_map(
            lambda a, b: _sel(can, a, b), fresh, new_state)
        h2, c2, ht2 = mc2
        mc3 = (_sel(can, h0_pool[ids], h2),
               _sel(can, c0_pool[ids], c2),
               _sel(can, h0_pool[ids], ht2))
        next_ptr2 = next_ptr + jnp.sum(can.astype(jnp.int32))
        return (state3, mc3, ids, next_ptr2, rng), rec

    scan_step = step
    if C._EARLY_EXIT:
        # after the pool is exhausted the batch can go fully dead exactly
        # like an unpacked rollout — reuse the TPU.SCAN_EARLY_EXIT frozen
        # branch for that tail (same trick as common.rollout_scan)
        rec_sd = jax.eval_shape(step, (state0, mc0, ids0, jnp.int32(B), rng),
                                jnp.int32(0))[1]

        def frozen_step(carry, t):
            slot_ep = carry[2]
            rec = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), rec_sd
            )._replace(slot_ep=slot_ep)
            return carry, rec

        def scan_step(carry, t):
            any_alive = jnp.logical_not(jnp.all(carry[0].ended))
            return jax.lax.cond(any_alive, step, frozen_step, carry, t)

    (final_state, mc, final_ids, next_ptr, _), steps = jax.lax.scan(
        scan_step, (state0, mc0, ids0, jnp.int32(B), rng), jnp.arange(episode_len))
    return PackedResult(
        steps=steps,
        final_state=final_state,
        final_carry=mc,
        final_slot_ep=final_ids,
        episodes_started=next_ptr,
        episodes_done=jnp.sum(steps.ended_now.astype(jnp.int32)),
    )


class PackedLosses(NamedTuple):
    rl_loss: jnp.ndarray             # scalar (normalized per RL_NORMALIZE)
    rl_loss_per_episode: jnp.ndarray # [N] pool-episode attribution (SPCL-ready)
    entropy_sum: jnp.ndarray
    critic_loss_sum: jnp.ndarray
    total_actions: jnp.ndarray
    episodes_started: jnp.ndarray
    episodes_done: jnp.ndarray


def packed_a2c(
    result: PackedResult,
    values: jnp.ndarray,        # [T, B] critic values in REVERSE time order
    last_value: jnp.ndarray,    # [B] bootstrap for slots still alive at scan end
    gamma: float,
    rl_normalize: str,
    num_episodes: int,
) -> PackedLosses:
    """A2C over packed records with per-episode return segmentation.

    Identical recurrence to `EnvDropAgent.rollout`'s unpacked tail
    (ref: envdrop.py:222-264) except the reverse-time discount carry
    resets to 0 at each episode's terminal step — interior segments are
    terminal by construction (they ended by STOP), so only each slot's
    final truncated segment bootstraps from the critic."""
    steps = result.steps
    not_ended = jnp.logical_not(result.final_state.ended).astype(jnp.float32)

    def a2c_step(discount, xs):
        reward, alive_b, ended_now, v_, log_prob, entropy = xs
        discount = jnp.where(ended_now, 0.0, discount)
        mask = alive_b.astype(jnp.float32)
        discount = discount * gamma + reward
        r_ = jax.lax.stop_gradient(discount)
        a_ = jax.lax.stop_gradient(r_ - v_)
        loss_vec = (-log_prob * a_ * mask) + 0.5 * ((r_ - v_) ** 2) * mask
        loss_vec = loss_vec - 0.01 * entropy * mask  # packed is always sampled
        critic_l = jnp.sum(((r_ - v_) ** 2) * mask)
        return discount, (loss_vec, critic_l, jnp.sum(mask))

    xs = (steps.reward[::-1], steps.alive_before[::-1], steps.ended_now[::-1],
          values, steps.log_prob[::-1], steps.entropy[::-1])
    _, (rl_vecs, critic_ls, mask_sums) = jax.lax.scan(
        a2c_step, not_ended * last_value, xs)

    total = jnp.maximum(jnp.sum(mask_sums), 1.0)
    B = steps.reward.shape[1]
    if rl_normalize == "total":
        rl_vecs = rl_vecs / total
    elif rl_normalize == "batch":
        rl_vecs = rl_vecs / B
    # pool-episode attribution: scatter step losses onto their episode
    per_episode = jax.ops.segment_sum(
        rl_vecs[::-1].reshape(-1), steps.slot_ep.reshape(-1),
        num_segments=num_episodes)
    return PackedLosses(
        rl_loss=jnp.sum(rl_vecs),
        rl_loss_per_episode=per_episode,
        entropy_sum=jnp.sum(steps.entropy * steps.alive_before),
        critic_loss_sum=jnp.sum(critic_ls),
        total_actions=jnp.sum(mask_sums),
        episodes_started=result.episodes_started,
        episodes_done=result.episodes_done,
    )
