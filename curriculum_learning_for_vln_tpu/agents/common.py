"""Shared rollout machinery for all navigation agents.

The reference drives every agent's episode with a host Python loop over
time steps, crossing into C++ per sample per step (e.g.
`tasks/R2R-judy/src/agent/follower.py:107-168`).  Here the whole rollout
is one `lax.scan`: the model-specific decoder step is injected as a
callback and everything else — observation gathers, feedback-mode action
selection, stop conversion, reward shaping, trajectory recording, ended
masking — is shared and traced once.

Per-step records mirror exactly what the reference losses consume:
per-sample CE vectors, log-probs/entropies of sampled actions, reward and
alive masks for A2C, hidden states for the critic, and node ids for
trajectory assembly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..env import env as E
from ..env.env import EnvState, EpisodeBatch, Observation
from ..models.attention import NEG_INF
from ..world.compiler import WorldTables

FEEDBACK_TEACHER = 0
FEEDBACK_ARGMAX = 1
FEEDBACK_SAMPLE = 2

NEG_INF_SAFE = NEG_INF  # re-export for agents

FEEDBACK_IDS = {"teacher": FEEDBACK_TEACHER, "argmax": FEEDBACK_ARGMAX, "sample": FEEDBACK_SAMPLE}

# Rollout-scan unroll factor (TPU.SCAN_UNROLL).  The train iteration is
# op-count-bound (~17k device ops of ~0.6 us, BASELINE.md round 3);
# unrolling the episode scan gives XLA adjacent steps to fuse across and
# fewer while-loop trips, at the cost of a proportionally larger program.
_SCAN_UNROLL = 1


def set_scan_unroll(n: int) -> None:
    global _SCAN_UNROLL
    _SCAN_UNROLL = max(1, int(n))


# All-ended early exit (TPU.SCAN_EARLY_EXIT).  The reference breaks its
# Python rollout loop as soon as every episode has ended
# (ref: follower.py:168 "if ended.all(): break"); a fixed-length scan
# instead burns full model steps on all-dead batches — measured 46.7% of
# RL scan steps with a converged policy at T=15 (and ~70% at the
# production T=35), see BASELINE.md.  With the flag on, each scan step
# branches on a scalar any-alive predicate and replaces the whole model
# step with a frozen record whose loss-visible fields are exactly what
# the live step produces for an all-ended batch (zeros / IGNORE / same
# node); XLA lowers the branch to a runtime conditional so dead steps
# cost ~nothing.  Update-equality (params) with the flag off is asserted
# in tests/test_knobs.py.  One deliberate state difference: SELF-MONITOR's
# BatchNorm running stats stop accumulating on all-dead steps — which is
# what the reference does too (its Python loop breaks at follower.py:168,
# so its BN never sees dead steps); the flag-OFF fixed-length scan is the
# variant that deviates there.
_EARLY_EXIT = False


def set_early_exit(on: bool) -> None:
    global _EARLY_EXIT
    _EARLY_EXIT = bool(on)


class StepRecord(NamedTuple):
    """Stacked [T, ...] outputs of the rollout scan."""

    node_after: jnp.ndarray     # [T, B] node after this step's action
    view_after: jnp.ndarray     # [T, B]
    moved: jnp.ndarray          # [T, B] bool — a real move happened
    alive_before: jnp.ndarray   # [T, B] bool — episode alive when acting (masks_t)
    ce: jnp.ndarray             # [T, B] per-sample CE vs teacher (0 where ignored)
    ce_count: jnp.ndarray       # [T] number of non-ignored samples
    log_prob: jnp.ndarray       # [T, B] log pi(a_t) (sample/argmax feedback)
    entropy: jnp.ndarray        # [T, B] policy entropy
    hidden: jnp.ndarray         # [T, B, H] decoder h_t (critic input)
    reward: jnp.ndarray         # [T, B] shaped reward (EnvDrop formula)
    dist_after: jnp.ndarray     # [T, B] distance-to-goal after the action
    teacher: jnp.ndarray        # [T, B] teacher action index (IGNORE when ended)
    action: jnp.ndarray         # [T, B] chosen action index
    progress: jnp.ndarray       # [T, B] progress-monitor prediction (0 if n/a)


class RolloutResult(NamedTuple):
    final_state: EnvState
    start_node: jnp.ndarray     # [B]
    start_view: jnp.ndarray     # [B]
    steps: StepRecord
    model_carry: tuple          # final model carry (bn state etc.)


def cast_compute_params(params: dict, compute_dtype) -> dict:
    """bf16 compute copies of the float parameter trees.

    The rollout's serial kernel chain is weight-HBM-read bound (34 MB of
    decoder/encoder weights re-fetched per step; measured on v5e, see
    BASELINE.md).  Casting the float params to bf16 once per step call
    halves that traffic; XLA fuses the upcast back to f32 into each dot's
    operand read, so accumulation and recurrent state stay f32 and the
    f32 master copy in the optimizer is untouched (grads flow through the
    cast).  Integer/bool leaves are left alone."""
    if compute_dtype == jnp.float32:
        return params

    def cast(x):
        return x.astype(compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree_util.tree_map(cast, params)


def select_action(
    feedback: int,
    masked_logits: jnp.ndarray,   # [B, K], invalid slots at NEG_INF
    teacher: jnp.ndarray,         # [B]
    rng,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (action, log_prob, entropy) for the configured feedback mode
    (ref: follower.py:131-139, envdrop.py:182-195)."""
    logp = jax.nn.log_softmax(masked_logits, axis=-1)
    probs = jnp.exp(logp)
    entropy = -jnp.sum(probs * jnp.where(probs > 0, logp, 0.0), axis=-1)

    if feedback == FEEDBACK_TEACHER:
        action = teacher
    elif feedback == FEEDBACK_ARGMAX:
        action = jnp.argmax(masked_logits, axis=-1).astype(jnp.int32)
    else:
        action = jax.random.categorical(rng, masked_logits, axis=-1).astype(jnp.int32)

    a_safe = jnp.clip(action, 0, masked_logits.shape[-1] - 1)
    log_prob = jnp.take_along_axis(logp, a_safe[:, None], axis=-1)[:, 0]
    return action, log_prob, entropy


def shaped_reward(
    is_stop: jnp.ndarray, dist_before: jnp.ndarray, dist_after: jnp.ndarray, alive: jnp.ndarray
) -> jnp.ndarray:
    """EnvDrop reward (ref: envdrop.py:209-212): +-2 terminal success bonus
    on stop, sign of distance progress otherwise, masked to alive."""
    stop_term = (2.0 * (dist_after < 3.0) - 1.0) * 2.0
    move_term = jnp.sign(dist_before - dist_after)
    r = jnp.where(is_stop, stop_term, move_term)
    return r * alive.astype(r.dtype)


# Model step callback signature:
#   model_step(model_carry, obs, env_state, rng, t) -> (masked_logits, new_carry, hidden, progress)
# Optional post-action callback (e.g. a_t_prev feature update):
#   model_post(model_carry, obs, action) -> model_carry
ModelStepFn = Callable


def rollout_scan(
    world: WorldTables,
    ep: EpisodeBatch,
    rng,
    model_carry0: tuple,
    model_step: ModelStepFn,
    episode_len: int,
    feedback: int,
    model_post: Callable = None,
    avoid_cyclic: bool = False,
    compute_dtype=jnp.float32,
) -> RolloutResult:
    """Run a full episode rollout as one `lax.scan`.

    The scan always runs ``episode_len`` steps; ended episodes are frozen
    by the env semantics and masked in the records (the reference instead
    breaks out of its Python loop early, follower.py:168).

    ``avoid_cyclic`` masks candidates leading to already-visited
    viewpoints (ref: follower.py:117-122), tracked as a device-side node
    history instead of host Python sets."""
    state0 = E.reset(world, ep)
    B = state0.node.shape[0]
    # visited-node history: slot t holds the node at time t (-1 = unfilled)
    visited0 = jnp.full((B, episode_len + 1), -1, jnp.int32)
    visited0 = visited0.at[:, 0].set(state0.node)

    def live_step(carry, t):
        state, mc, rng, visited = carry
        rng, rng_model, rng_act = jax.random.split(rng, 3)

        obs = E.observe(world, state, compute_dtype=compute_dtype)
        masked_logits, mc, hidden, progress = model_step(mc, obs, state, rng_model, t)
        cand_mask = obs.cand_mask
        if avoid_cyclic:
            c_next = world.cand_next[state.node]                      # [B, MC]
            seen = jnp.any(c_next[:, :, None] == visited[:, None, :], axis=-1)
            # only real candidates: padding slots alias the self node (always
            # "visited") and slot n doubles as STOP, which must stay open
            seen = seen & world.cand_valid[state.node]
            K = cand_mask.shape[1]
            cand_mask = cand_mask | jnp.pad(seen, ((0, 0), (0, K - seen.shape[1])))
        masked_logits = jnp.where(cand_mask, NEG_INF, masked_logits)

        teacher = obs.teacher
        ce = _ce_per_sample(masked_logits, teacher)
        ce_count = jnp.sum((teacher != E.IGNORE_ID).astype(jnp.int32))

        action, log_prob, entropy = select_action(feedback, masked_logits, teacher, rng_act)
        if model_post is not None:
            mc = model_post(mc, obs, action)

        alive_before = jnp.logical_not(state.ended)
        is_stop = E.action_is_stop(world, state, action)
        new_state = E.step(world, state, action)
        dist_before = obs.dist
        dist_after = jnp.take_along_axis(
            world.dist[new_state.node], state.goal_local[:, None], axis=1
        )[:, 0]
        reward = shaped_reward(is_stop, dist_before, dist_after, alive_before)
        moved = jnp.logical_and(alive_before, jnp.logical_not(is_stop))

        if avoid_cyclic:
            visited = visited.at[:, t + 1].set(new_state.node)

        rec = StepRecord(
            node_after=new_state.node,
            view_after=new_state.view_idx,
            moved=moved,
            alive_before=alive_before,
            ce=ce,
            ce_count=ce_count,
            log_prob=log_prob,
            entropy=entropy,
            hidden=hidden,
            reward=reward,
            dist_after=dist_after,
            teacher=teacher,
            action=action,
            progress=progress,
        )
        return (new_state, mc, rng, visited), rec

    carry0 = (state0, model_carry0, rng, visited0)
    if _EARLY_EXIT:
        # abstract record shapes/dtypes so the frozen branch matches the
        # live one exactly across agents and compute dtypes
        rec_sd = jax.eval_shape(live_step, carry0, jnp.int32(0))[1]

        def frozen_step(carry, t):
            state = carry[0]
            dist_now = jnp.take_along_axis(
                world.dist[state.node], state.goal_local[:, None], axis=1
            )[:, 0].astype(rec_sd.dist_after.dtype)
            rec = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), rec_sd
            )._replace(
                # frozen env semantics: the node sticks, nothing moves,
                # teacher is IGNORE, dist_after is the (unchanged) distance
                # to goal — identical to what live_step records for a batch
                # whose episodes have all ended, so even an unmasked
                # consumer reads the same values on dead tails
                node_after=state.node,
                view_after=state.view_idx,
                teacher=jnp.full_like(state.node, E.IGNORE_ID),
                dist_after=dist_now,
            )
            return carry, rec

        def step(carry, t):
            any_alive = jnp.logical_not(jnp.all(carry[0].ended))
            return jax.lax.cond(any_alive, live_step, frozen_step, carry, t)
    else:
        step = live_step

    (final_state, mc, _, _), steps = jax.lax.scan(
        step, carry0, jnp.arange(episode_len),
        unroll=_SCAN_UNROLL,
    )
    return RolloutResult(
        final_state=final_state,
        start_node=state0.node,
        start_view=state0.view_idx,
        steps=steps,
        model_carry=mc,
    )


def _ce_per_sample(masked_logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(masked_logits, axis=-1)
    tgt = jnp.clip(targets, 0, masked_logits.shape[-1] - 1)
    picked = jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    return jnp.where(targets == E.IGNORE_ID, 0.0, -picked)


def ml_loss_mean_over_alive(steps: StepRecord) -> jnp.ndarray:
    """Reference CrossEntropyLoss(reduction='mean', ignore_index) summed
    over time: per step, mean over non-ignored samples (0 when none)."""
    denom = jnp.maximum(steps.ce_count, 1).astype(jnp.float32)
    return jnp.sum(jnp.sum(steps.ce, axis=1) / denom)


def ml_loss_per_sample(steps: StepRecord) -> jnp.ndarray:
    """Per-sample CE summed over time — the SPCL/train_cl loss vector
    (ref: follower.py:104,128)."""
    return jnp.sum(steps.ce, axis=0)


def ml_loss_sum(steps: StepRecord) -> jnp.ndarray:
    """EnvDrop's summed CE (ref: envdrop.py:179)."""
    return jnp.sum(steps.ce)


def gather_prev_action_feature(obs: Observation, action: jnp.ndarray) -> jnp.ndarray:
    """a_t_prev = feature of the chosen candidate (zeros for STOP slot;
    ref: follower.py:164)."""
    a = jnp.clip(action, 0, obs.cand_feat.shape[1] - 1)
    return jnp.take_along_axis(obs.cand_feat, a[:, None, None], axis=1)[:, 0, :]


# ---------------------------------------------------------------------------
# Host-side trajectory assembly
# ---------------------------------------------------------------------------

def assemble_trajectories(world_host, ep: EpisodeBatch, result: RolloutResult, data):
    """Build reference-format result dicts from stacked device outputs.

    Output trajectory format matches Evaluation's expectation
    (ref: evaluator.py:12-18): [(viewpointId, heading_rads, elevation_rads)].
    Only actual moves append entries (ref: common_env.py:108-110)."""
    import numpy as np

    from ..utils.angles import ANGLE_INC

    nodes = np.asarray(result.steps.node_after)       # [T, B]
    views = np.asarray(result.steps.view_after)
    moved = np.asarray(result.steps.moved)
    start_nodes = np.asarray(result.start_node)
    start_views = np.asarray(result.start_view)
    item_idx = np.asarray(ep.item_idx)
    valid = np.asarray(ep.valid)

    T, B = nodes.shape
    results = []
    for b in range(B):
        if not valid[b]:
            continue
        item = data[int(item_idx[b])]
        sv = int(start_views[b])
        path = [(
            world_host.viewpoint_of(int(start_nodes[b])),
            (sv % 12) * ANGLE_INC,
            (sv // 12 - 1) * ANGLE_INC,
        )]
        for t in range(T):
            if moved[t, b]:
                v = int(views[t, b])
                path.append((
                    world_host.viewpoint_of(int(nodes[t, b])),
                    (v % 12) * ANGLE_INC,
                    (v // 12 - 1) * ANGLE_INC,
                ))
        results.append({"instr_id": item["instr_id"], "trajectory": path})
    return results
