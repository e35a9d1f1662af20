"""Pure-functional batched navigation environment (jit/scan/vmap-safe).

The reference environment crosses the Python/C++ boundary per sample per
step (`tasks/R2R-judy/src/environ/common_env.py:91-110`, one MatterSim per
batch slot, `common_env.py:58-61`) and rebuilds candidate features on the
host (`common_env.py:225-297`).  Here the environment is three pure
functions over packed ``WorldTables``:

    reset(world, episodes)        -> EnvState
    observe(world, state)         -> Observation         (pure gathers)
    step(world, state, action)    -> EnvState            (pure gathers)

All arrays carry a leading batch dimension; everything is static-shape
(candidates padded to MC slots + 1 STOP slot) so a full rollout is a
single `lax.scan` and shards over a data-parallel mesh with zero host
traffic.  Semantics parity notes are inline, keyed to reference lines.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.angles import ANGLE_INC, NUM_VIEWS, make_angle_feat
from ..world.compiler import WorldTables

IGNORE_ID = -1  # matches BasicR2RAgent.ignore_id (ref: base.py:92)


class EpisodeBatch(NamedTuple):
    """Static-shape episode specs (one minibatch), device-resident."""

    instr_tokens: jnp.ndarray    # [B, L] i32
    instr_len: jnp.ndarray       # [B] i32
    start_node: jnp.ndarray      # [B] i32 global node id
    start_heading: jnp.ndarray   # [B] f32
    goal: jnp.ndarray            # [B] i32 global node id
    goal_local: jnp.ndarray      # [B] i32 scan-local goal index
    item_idx: jnp.ndarray        # [B] i32 dataset index (curriculum bookkeeping)
    valid: jnp.ndarray           # [B] bool (False = padding slot in tail batches)
    # gt-route waypoints, scan-LOCAL ids padded with the goal (None or P=1
    # selects the goal-directed teacher — see observe_meta).  Host envs
    # pack P=1 for R2R parity and the full route under teacher_mode="path".
    path_local: jnp.ndarray = None  # [B, P] i32
    path_len: jnp.ndarray = None    # [B] i32


class EnvState(NamedTuple):
    node: jnp.ndarray        # [B] i32
    view_idx: jnp.ndarray    # [B] i32 (0..35)
    heading: jnp.ndarray     # [B] f32 discretized
    elevation: jnp.ndarray   # [B] f32 discretized
    goal: jnp.ndarray        # [B] i32
    goal_local: jnp.ndarray  # [B] i32
    ended: jnp.ndarray       # [B] bool
    path_local: jnp.ndarray = None  # [B, P] i32 (see EpisodeBatch)
    path_len: jnp.ndarray = None    # [B] i32
    path_ptr: jnp.ndarray = None    # [B] i32 index of the last reached waypoint


class Observation(NamedTuple):
    pano_feat: jnp.ndarray   # [B, 36, D+128]  view features + loc embedding
    cand_feat: jnp.ndarray   # [B, MC+1, D+128]  candidate features; STOP slot zeros
    cand_mask: jnp.ndarray   # [B, MC+1] bool, True = mask out (beyond stop slot)
    n_cands: jnp.ndarray     # [B] i32  (STOP action index)
    teacher: jnp.ndarray     # [B] i32  teacher action index; IGNORE_ID when ended
    dist: jnp.ndarray        # [B] f32  geodesic distance to goal
    heading: jnp.ndarray     # [B] f32
    elevation: jnp.ndarray   # [B] f32
    # candidate metadata for fused observation kernels (ops/fused_obs.py):
    # agents that consume these instead of pano_feat/cand_feat let XLA
    # dead-code-eliminate the [B, 36, D] gather entirely
    cand_view: jnp.ndarray   # [B, MC] i32 view index of each candidate
    cand_valid: jnp.ndarray  # [B, MC] bool
    cand_angle: jnp.ndarray  # [B, MC, 128] heading-relative angle features


def reset(world: WorldTables, ep: EpisodeBatch) -> EnvState:
    """Start episodes: heading snapped to the 30-degree grid, elevation 0
    (MatterSim discretized-viewing-angles init; ref: common_env.py:66-70)."""
    h_idx = jnp.mod(jnp.round(ep.start_heading / ANGLE_INC).astype(jnp.int32), 12)
    view_idx = 12 + h_idx
    return EnvState(
        node=ep.start_node,
        view_idx=view_idx,
        heading=h_idx.astype(jnp.float32) * ANGLE_INC,
        elevation=jnp.zeros_like(ep.start_heading),
        goal=ep.goal,
        goal_local=ep.goal_local,
        ended=jnp.logical_not(ep.valid),  # padding slots are born ended
        path_local=ep.path_local,
        path_len=ep.path_len,
        path_ptr=None if ep.path_local is None
        else jnp.zeros_like(ep.goal_local),  # episodes start at path[0]
    )


def _cand_meta(world: WorldTables, state: EnvState, compute_dtype=jnp.float32):
    """Candidate-slot metadata gathers shared by ``observe`` and the fused
    Pallas observation path (ops/bptt.py): next nodes, validity, view ids,
    counts, and the heading-relative candidate angle features
    (common_env.py:281-296 semantics)."""
    node = state.node
    c_next = world.cand_next[node]         # [B, MC]
    c_valid = world.cand_valid[node]
    c_view = world.cand_view[node]
    n = world.n_cands[node]                # [B]
    base_heading = (state.view_idx % 12).astype(jnp.float32) * ANGLE_INC
    rel_h = world.cand_heading[node] - base_heading[:, None]
    elev = world.cand_elev[node]
    angle = make_angle_feat(rel_h, elev).astype(compute_dtype)    # [B, MC, 128]
    return c_next, c_valid, c_view, n, angle


def _teacher_target(world: WorldTables, state: EnvState) -> jnp.ndarray:
    """Scan-local node the teacher currently steers toward.

    Waypoint-follower: the next gt-route waypoint after ``path_ptr`` (the
    last reached one; off-route the shortest path back to that waypoint
    is the recovery).  With ``path_local`` absent or P=1 (the goal alone)
    this is exactly the reference's shortest-path-to-goal teacher (ref:
    base.py:159-178 via common_env.py:325-331, whose
    `paths[scan][cur][goal]` is also goal-directed, NOT route-following).
    Packing the full route (R4R fidelity supervision, Jain et al. '19)
    makes the teacher reproduce deliberately non-geodesic gt routes —
    including ones that revisit nodes — as static-shape gathers plus one
    [B] pointer in the scan carry (advanced in ``step``)."""
    if (state.path_local is None or state.path_ptr is None
            or state.path_local.shape[1] == 1):
        return state.goal_local
    tidx = jnp.minimum(state.path_ptr + 1, state.path_len - 1)
    return jnp.take_along_axis(state.path_local, tidx[:, None], axis=1)[:, 0]


def _advance_path_ptr(world: WorldTables, state: EnvState, new_node: jnp.ndarray) -> jnp.ndarray:
    """Move the waypoint pointer to the FIRST route position beyond it
    that the agent just landed on (teacher-following advances one; a
    policy that rejoins the route further ahead skips to there; loops in
    the route are preserved because positions at or before the pointer
    never match)."""
    path, ptr = state.path_local, state.path_ptr
    P = path.shape[1]
    jidx = jnp.arange(P, dtype=jnp.int32)[None, :]
    hit = ((path == world.node_local[new_node][:, None])
           & (jidx > ptr[:, None]) & (jidx < state.path_len[:, None]))
    first = jnp.min(jnp.where(hit, jidx, P), axis=1)
    return jnp.where(first < P, first, ptr).astype(jnp.int32)


def observe_meta(world: WorldTables, state: EnvState, compute_dtype=jnp.float32):
    """The non-feature part of ``observe``: everything a fused
    gather+attention kernel does not produce itself.  Returns
    (c_view, c_valid, n_cands, angle, cand_mask, teacher, dist)."""
    node = state.node
    c_next, c_valid, c_view, n, angle = _cand_meta(world, state, compute_dtype)
    MC = c_view.shape[1]
    slot = jnp.arange(MC + 1, dtype=jnp.int32)[None, :]
    cand_mask = slot > n[:, None]
    target = _teacher_target(world, state)
    teacher_next = jnp.take_along_axis(world.next_hop[node], target[:, None], axis=1)[:, 0]
    match = (c_next == teacher_next[:, None]) & c_valid
    teacher_move = jnp.argmax(match, axis=1).astype(jnp.int32)
    stay = teacher_next == node
    teacher = jnp.where(stay, n, teacher_move)
    teacher = jnp.where(state.ended, IGNORE_ID, teacher)
    dist = jnp.take_along_axis(world.dist[node], state.goal_local[:, None], axis=1)[:, 0]
    return c_view, c_valid, n, angle, cand_mask, teacher, dist


def assemble_cand_feat(cand_img, angle, c_valid):
    """Candidate features from raw per-candidate view rows + angle feats,
    exactly as ``observe`` builds them (zeroed invalid slots, zero STOP
    slot appended)."""
    cand_core = jnp.concatenate([cand_img, angle], axis=-1)
    cand_core = jnp.where(c_valid[:, :, None], cand_core, 0.0)
    B, MC, F = cand_core.shape
    stop_slot = jnp.zeros((B, 1, F), dtype=cand_core.dtype)
    return jnp.concatenate([cand_core, stop_slot], axis=1)


def observe(world: WorldTables, state: EnvState, compute_dtype=jnp.float32) -> Observation:
    """Build the full observation with pure gathers.

    Parity map (all against the reference):
    * pano_feat  = features ++ loc-embedding-for-current-view
                   (common_env.py:309, misc.py:316-317)
    * candidate features = per-candidate view feature ++ angle feature of
      (normalized_heading - base_heading, loc_elevation)
                   (common_env.py:281-296 buffered-reuse path)
    * teacher    = index of the candidate whose next viewpoint is the next
      node on the shortest path, else the STOP index (base.py:159-178)
    * dist       = geodesic distance to goal (common_env.py:329)
    """
    node = state.node
    # the stored table may be view-padded to 40 rows for the fused Pallas
    # kernel's DMA alignment (world/compiler.py); XLA fuses this slice into
    # the gather so only the 36 real rows are read
    feats = world.features[node][:, :NUM_VIEWS].astype(compute_dtype)  # [B, 36, D]
    loc_emb = world.loc_embed[state.view_idx].astype(compute_dtype)  # [B, 36, 128]
    pano = jnp.concatenate([feats, loc_emb], axis=-1)

    # teacher/mask/dist semantics live in observe_meta — the single
    # implementation shared with the fused-observation kernel path
    c_view, c_valid, n, angle, cand_mask, teacher, dist = observe_meta(
        world, state, compute_dtype)

    # NOTE: slicing candidates out of the gathered pano costs an 18.9 MB
    # layout copy per step (copy.248 in the v5e trace, ~4% of the train
    # iteration) — but the "obvious" fix, a direct [B,MC]-pair gather from
    # the features table, measured 2x WORSE end to end (36.9 vs 18.0
    # ms/iter: compound-index gathers lower to slow row-scatter on TPU).
    # Keep the take_along_axis form.
    cand_img = jnp.take_along_axis(feats, c_view[:, :, None], axis=1)  # [B, MC, D]
    cand_feat = assemble_cand_feat(cand_img, angle, c_valid)      # [B, MC+1, F]

    return Observation(
        pano_feat=pano,
        cand_feat=cand_feat,
        cand_mask=cand_mask,
        n_cands=n,
        teacher=teacher,
        dist=dist,
        heading=state.heading,
        elevation=state.elevation,
        cand_view=c_view,
        cand_valid=c_valid,
        cand_angle=angle,
    )


def step(world: WorldTables, state: EnvState, action: jnp.ndarray) -> EnvState:
    """Apply a panoramic action.

    ``action`` in [0, MC] indexes candidate slots; the STOP index
    (== n_cands), IGNORE_ID, or an already-ended episode leaves the agent
    in place and marks it ended — exactly the reference's "-1 means
    <end>" conversion (follower.py:141-146) plus makeActions' skip
    (common_env.py:97-98).  Moving lands the agent at the candidate node
    facing the candidate's view (misc.py:366-390 turn-then-forward)."""
    node = state.node
    n = world.n_cands[node]
    is_stop = (action >= n) | (action < 0) | state.ended
    a = jnp.clip(action, 0, world.max_candidates - 1)

    next_node = jnp.take_along_axis(world.cand_next[node], a[:, None], axis=1)[:, 0]
    next_view = jnp.take_along_axis(world.cand_view[node], a[:, None], axis=1)[:, 0]

    move = jnp.logical_not(is_stop)
    new_node = jnp.where(move, next_node, node)
    new_view = jnp.where(move, next_view, state.view_idx)
    new_heading = (new_view % 12).astype(jnp.float32) * ANGLE_INC
    new_elev = (new_view // 12 - 1).astype(jnp.float32) * ANGLE_INC

    return EnvState(
        node=new_node,
        view_idx=new_view,
        heading=jnp.where(move, new_heading, state.heading),
        elevation=jnp.where(move, new_elev, state.elevation),
        goal=state.goal,
        goal_local=state.goal_local,
        ended=state.ended | is_stop,
        path_local=state.path_local,
        path_len=state.path_len,
        path_ptr=state.path_ptr
        if state.path_ptr is None or state.path_local.shape[1] == 1
        else _advance_path_ptr(world, state, new_node),
    )


def action_is_stop(world: WorldTables, state: EnvState, action: jnp.ndarray) -> jnp.ndarray:
    """Whether an action resolves to STOP for the current state (before step)."""
    n = world.n_cands[state.node]
    return (action >= n) | (action < 0) | state.ended
