"""Beam search ("dijkstra") over navigation states + speaker rescoring.

Rebuild of the reference's best-first state expansion
(`tasks/R2R-judy/src/agent/base.py:183-464`, airsplay-derived): for each
episode, expand (viewpoint, action) states in order of decreasing
listener log-prob until ``beam_size`` <end> states are collected, saving
each state's RNN running-state; physical navigation between expansions is
stitched with an incremental FloydGraph.  ``beam_rollout`` then rescores
every finished path with the speaker's per-word losses
(ref: base.py:399-450).

Architecture: the search is inherently data-dependent and host-sequential
(SURVEY §7.3), so the host drives the frontier while all tensor work
(decoder step over a batch of gathered states) is one jitted call per
iteration.  Parity notes:

* children of an expansion share the parent's post-argmax carry (the
  reference updates a_t_prev from the argmax action before storing
  running states for *all* children, base.py:310-350);
* state scores accumulate log-softmax of masked logits; the <end> action
  index is len(candidates).
"""
from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..env.env import EnvState
from ..env import env as E
from ..models import decoders as D
from ..models.attention import NEG_INF
from ..models.encoder import encoder_apply
from ..utils.angles import ANGLE_INC, make_angle_feat
from ..utils.floyd import FloydGraph
from ..utils.tokenizer import EOS_IDX, PAD_IDX
from ..world.compiler import CompiledWorld, WorldTables

logger = logging.getLogger("main.beam")

START_ACTION = -95  # the reference's start-state marker (base.py:246)
END_ACTION = -1


def _make_state(nodes: jnp.ndarray, views: jnp.ndarray, B: int) -> EnvState:
    views = views.astype(jnp.int32)
    return EnvState(
        node=nodes.astype(jnp.int32),
        view_idx=views,
        heading=(views % 12).astype(jnp.float32) * ANGLE_INC,
        elevation=(views // 12 - 1).astype(jnp.float32) * ANGLE_INC,
        goal=nodes.astype(jnp.int32),
        goal_local=jnp.zeros(B, jnp.int32),
        ended=jnp.zeros(B, bool),
    )


def make_beam_decoder(agent, model_state):
    """Jitted single decode step over a batch of gathered search states.

    Returns fn(tables, params, ctx, ctx_mask, nodes, views, carry) ->
    (log_probs [B,K], new_carry, pano_feat, cand_feat, argmax_action).
    World tables / params / ctx are call-time arguments so they compile
    as parameters, not embedded constants."""
    name = agent.name
    rng = jax.random.PRNGKey(0)  # eval mode: rng unused by dropout

    @jax.jit
    def decode(tables, params, ctx, ctx_mask, nodes, views, carry):
        B = nodes.shape[0]
        state = _make_state(nodes, views, B)
        obs = E.observe(tables, state)
        if name == "FOLLOWER":
            h, c, a_prev = carry
            logits, (h1, c1), _ = D.follower_decoder_step(
                params["decoder"], obs.pano_feat, a_prev, obs.cand_feat,
                h, c, ctx, ctx_mask, rng, train=False, drop_rate=agent.cfg.DROP_RATE)
            masked = jnp.where(obs.cand_mask, NEG_INF, logits)
            a_t = jnp.argmax(masked, axis=-1)
            from .common import gather_prev_action_feature
            new_carry = (h1, c1, gather_prev_action_feature(obs, a_t))
        elif name == "SELF-MONITOR":
            h, c, a_prev = carry
            bn = model_state["decoder_bn"]
            (logits, _), (h1, c1), _, _ = D.monitor_decoder_step(
                params["decoder"], bn, a_prev, obs.cand_feat, obs.cand_mask,
                h, c, ctx, ctx_mask, rng, train=False, drop_rate=agent.cfg.DROP_RATE)
            masked = jnp.where(obs.cand_mask, NEG_INF, logits)
            a_t = jnp.argmax(masked, axis=-1)
            from .common import gather_prev_action_feature
            new_carry = (h1, c1, gather_prev_action_feature(obs, a_t))
        elif name == "ENVDROP":
            h, c, h_tilde = carry
            a_t_angle = make_angle_feat(state.heading, state.elevation)
            logits, (h1, c1), h_tilde_new = D.envdrop_decoder_step(
                params["decoder"], a_t_angle, obs.pano_feat, obs.cand_feat,
                h_tilde, h, c, ctx, ctx_mask, rng, train=False,
                drop_rate=agent.cfg.DROP_RATE, feat_drop_rate=agent.cfg.FEAT_DROP_RATE,
                angle_feat_size=agent.angle_feat_size)
            masked = jnp.where(obs.cand_mask, NEG_INF, logits)
            a_t = jnp.argmax(masked, axis=-1)
            new_carry = (h1, c1, h_tilde_new)
        else:
            raise NotImplementedError(name)
        log_probs = jax.nn.log_softmax(masked, axis=-1)
        return log_probs, new_carry, obs.pano_feat, obs.cand_feat, a_t

    return decode


class BeamSearch:
    """Host-orchestrated best-first search (ref: base.py:183-464)."""

    def __init__(self, agent, world: CompiledWorld, tables: WorldTables, max_iters: int = 500):
        self.agent = agent
        self.world = world
        self.tables = tables
        self.max_iters = max_iters

    # -- carry (numpy) helpers ---------------------------------------------
    def _init_carry(self, h0, c0):
        name = self.agent.name
        if name in ("FOLLOWER", "SELF-MONITOR"):
            a0 = np.zeros((h0.shape[0], self.agent.action_emb_size), np.float32)
            return (np.asarray(h0), np.asarray(c0), a0)
        return (np.asarray(h0), np.asarray(c0), np.asarray(h0))  # envdrop: h_tilde=h0

    def dijkstra(self, params, model_state, ep, data, max_candidates: int):
        """Expand best-first; returns reference-format result dicts
        (ref docstring: base.py:185-203)."""
        agent = self.agent
        world, tables = self.world, self.tables
        B = int(ep.instr_tokens.shape[0])

        ctx_mask = ep.instr_tokens == PAD_IDX
        ctx, h0, c0 = encoder_apply(
            params["encoder"], ep.instr_tokens, ep.instr_len,
            jax.random.PRNGKey(0), train=False, drop_rate=agent.cfg.DROP_RATE)
        decode = make_beam_decoder(agent, model_state)

        item_idx = np.asarray(ep.item_idx)
        start_nodes = np.asarray(ep.start_node)
        start_views = 12 + np.mod(np.round(np.asarray(ep.start_heading) / ANGLE_INC).astype(int), 12)
        carry0 = self._init_carry(h0, c0)

        results = []
        for b in range(B):
            item = data[int(item_idx[b])]
            results.append({
                "scan": item["scan"],
                "instr_id": item["instr_id"],
                "instr_encoding": np.asarray(ep.instr_tokens[b]),
                "dijk_path": [world.viewpoint_of(int(start_nodes[b]))],
                "paths": [],
            })

        def state_id(node: int, action: int) -> Tuple[int, int]:
            return (node, action)

        id2state: List[Dict] = [
            {
                state_id(int(start_nodes[b]), START_ACTION): {
                    "next_node": int(start_nodes[b]),
                    "view": int(start_views[b]),
                    "carry": tuple(np.asarray(x[b]) for x in carry0),
                    "location": (int(start_nodes[b]), int(start_views[b])),
                    "from": None,
                    "feature": None,
                    "score": 0.0,
                    "scores": [],
                    "actions": [],
                }
            }
            for b in range(B)
        ]
        visited = [set() for _ in range(B)]
        finished = [set() for _ in range(B)]
        graphs = [FloydGraph() for _ in range(B)]
        ended = np.zeros(B, bool)

        for _ in range(self.max_iters):
            # (1) pick the best unvisited state per episode
            chosen = []
            for b in range(B):
                if ended[b]:
                    chosen.append(next(iter(id2state[b].items())))
                    continue
                cand = [(sid, st) for sid, st in id2state[b].items() if sid not in visited[b]]
                chosen.append(max(cand, key=lambda kv: kv[1]["score"]))

            # (2) mark visited / terminal bookkeeping
            tmp_ended = []
            for b, (sid, st) in enumerate(chosen):
                if not ended[b]:
                    visited[b].add(sid)
                    if sid[1] == END_ACTION:
                        tmp_ended.append(True)
                        finished[b].add(sid)
                        if len(finished[b]) >= max_candidates:
                            ended[b] = True
                    else:
                        tmp_ended.append(False)
                else:
                    tmp_ended.append(True)

            # (3) gather carries + teleport; (4) Floyd stitch
            nodes = np.array([st["next_node"] for _, st in chosen], np.int32)
            views = np.array([st["view"] for _, st in chosen], np.int32)
            n_parts = len(carry0)
            carry = tuple(
                np.stack([np.asarray(st["carry"][i]) for _, st in chosen]) for i in range(n_parts)
            )
            for b in range(B):
                node = int(nodes[b])
                vp = world.viewpoint_of(node)
                if not graphs[b].visited(vp):
                    g = node
                    for j in range(int(world.n_cands[g])):
                        nxt = int(world.cand_next[g, j])
                        dis = float(world.dist[g, world.node_local[nxt]])
                        graphs[b].add_edge(vp, world.viewpoint_of(nxt), dis)
                    graphs[b].update(vp)
                results[b]["dijk_path"].extend(
                    graphs[b].path(results[b]["dijk_path"][-1], vp))

            # (5) one decode step for the whole frontier
            logp, new_carry, pano, cand_feat, _ = decode(
                tables, params, ctx, ctx_mask,
                jnp.asarray(nodes), jnp.asarray(views), tuple(jnp.asarray(x) for x in carry))
            logp = np.asarray(logp)
            pano = np.asarray(pano)
            cand_feat_np = np.asarray(cand_feat)
            new_carry = tuple(np.asarray(x) for x in new_carry)

            # (6) expand children
            for b, (sid, st) in enumerate(chosen):
                if sid[1] == END_ACTION or ended[b]:
                    continue
                g = int(nodes[b])
                n = int(self.world.n_cands[g])
                child_carry = tuple(new_carry[i][b] for i in range(n_parts))
                for j in range(n + 1):
                    new_score = st["score"] + float(logp[b, j])
                    if j < n:
                        nid = state_id(g, j)
                        nxt = int(self.world.cand_next[g, j])
                        view = int(self.world.cand_view[g, j])
                    else:
                        nid = state_id(g, END_ACTION)
                        nxt = g
                        view = int(views[b])
                    if nid not in id2state[b] or new_score > id2state[b][nid]["score"]:
                        id2state[b][nid] = {
                            "next_node": nxt,
                            "view": view,
                            "carry": child_carry,
                            "location": (nxt, view),
                            "from": sid,
                            "feature": (pano[b], cand_feat_np[b, min(j, cand_feat_np.shape[1] - 1)]),
                            "score": new_score,
                            "scores": st["scores"] + [float(logp[b, j])],
                            "actions": st["actions"] + [n + 1],
                        }
                if len(visited[b]) == len(id2state[b]):
                    ended[b] = True

            if ended.all():
                break
        else:
            # expansion budget exhausted — surface which episodes did not
            # collect max_candidates finished states (the reference breaks
            # out silently, base.py:183-397 has no iteration cap at all)
            short = [(results[b]["instr_id"], len(finished[b]))
                     for b in range(B) if not ended[b]]
            if short:
                logger.warning(
                    "beam search truncated at max_iters=%d: %d/%d episodes "
                    "short of %d finished paths: %s",
                    self.max_iters, len(short), B, max_candidates, short[:8])

        # (7) close the dijk path back to the start
        for b in range(B):
            results[b]["dijk_path"].extend(
                graphs[b].path(results[b]["dijk_path"][-1], results[b]["dijk_path"][0]))

        # (8) backtrack finished paths
        for b, result in enumerate(results):
            for sid in finished[b]:
                info = {"trajectory": [], "action": [], "visual_feature": [],
                        "listener_scores": id2state[b][sid]["scores"],
                        "listener_actions": id2state[b][sid]["actions"]}
                cur = sid
                while cur[1] != START_ACTION:
                    st = id2state[b][cur]
                    node, view = st["location"]
                    info["trajectory"].append((
                        self.world.viewpoint_of(node),
                        (view % 12) * ANGLE_INC, (view // 12 - 1) * ANGLE_INC))
                    info["action"].append(cur[1])
                    info["visual_feature"].append(st["feature"])
                    cur = st["from"]
                st = id2state[b][cur]
                node, view = st["location"]
                info["trajectory"].append((
                    self.world.viewpoint_of(node),
                    (view % 12) * ANGLE_INC, (view // 12 - 1) * ANGLE_INC))
                for key in ("trajectory", "action", "visual_feature"):
                    info[key] = info[key][::-1]
                result["paths"].append(info)
        return results

    def beam_rollout(self, params, model_state, ep, data, speaker, spk_params,
                     beam_size: int = 30):
        """Dijkstra + speaker rescoring (ref: base.py:399-450)."""
        from .speaker import SpeakerFeatures

        results = self.dijkstra(params, model_state, ep, data, beam_size)
        for result in results:
            lengths = [len(p["visual_feature"]) for p in result["paths"]]
            if not lengths:
                continue
            max_len = max(max(lengths), 1)
            num = len(result["paths"])
            # Pad (paths, time) to static buckets so the rescoring program
            # compiles ONCE per beam run instead of once per data-dependent
            # (num, max_len) pair — through the relay every fresh shape is
            # a server-side compile, and the per-episode shapes are almost
            # all distinct.  Padded rows get length 1 (an all-masked ctx
            # row NaNs the attention softmax) and are never read back;
            # padded timesteps are masked by `lengths` inside the encoder.
            P = max(beam_size, num)
            T = -8 * (-max_len // 8)
            F = self.tables.feat_dim + 128
            img = np.zeros((P, T, 36, F), np.float32)
            can = np.zeros((P, T, F), np.float32)
            for j, p in enumerate(result["paths"]):
                for k, (f_t, c_t) in enumerate(p["visual_feature"]):
                    img[j, k] = f_t
                    can[j, k] = c_t
            feats = SpeakerFeatures(
                jnp.asarray(img), jnp.asarray(can),
                jnp.asarray(np.array(lengths + [1] * (P - num), np.int32)))
            insts = np.tile(result["instr_encoding"], (P, 1))
            seq_lengths = np.argmax(insts == EOS_IDX, axis=1)
            per_word = np.asarray(self._rescore(speaker)(
                spk_params, feats, jnp.asarray(insts)))
            for j, p in enumerate(result["paths"]):
                p.pop("visual_feature")
                p["speaker_scores"] = (-per_word[j])[: seq_lengths[j]]
        return results

    def _rescore(self, speaker):
        """Jitted teacher-forcing rescorer (shared across episodes; the
        bucketed shapes above keep its compile count to a handful)."""
        if not hasattr(self, "_rescore_fn"):
            import functools

            @functools.partial(jax.jit)
            def fn(spk_params, feats, insts):
                return speaker.teacher_forcing_loss(
                    spk_params, feats, insts, jax.random.PRNGKey(0),
                    train=False, for_listener=True)

            self._rescore_fn = fn
        return self._rescore_fn

    def beam_search(self, params, model_state, henv, data, speaker, spk_params,
                    beam_size: int = 30):
        """Full-split beam search with exact coverage."""
        out = {}
        for ep in henv.eval_batches():
            valid = np.asarray(ep.valid)
            results = self.beam_rollout(params, model_state, ep, data, speaker,
                                        spk_params, beam_size)
            for b, r in enumerate(results):
                if valid[b] and r["instr_id"] not in out:
                    out[r["instr_id"]] = r
        return out
