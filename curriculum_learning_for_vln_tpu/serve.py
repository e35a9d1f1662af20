"""Inference/serving API: instruction -> trajectory.

The reference has no serving path (results only flow through training
eval).  ``Navigator`` packages the deployment story: a compiled world,
a trained agent checkpoint, and one jitted argmax rollout reused across
requests.  Requests are micro-batched up to ``max_batch`` (static shape:
single compilation, padding slots masked out).

    nav = Navigator.from_checkpoint(world, agent, "ckpt/best_val_unseen.ckpt")
    result = nav.navigate("walk past the kitchen and stop by the stairs",
                          scan="17DRP5sb8fy", start_viewpoint="0e92a69a50414253a23043758f111cec",
                          heading=3.75)
    result["trajectory"]  # [(viewpoint, heading, elevation), ...]
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .agents.common import FEEDBACK_ARGMAX, assemble_trajectories
from .engine.checkpoint import load_checkpoint
from .env.env import EpisodeBatch
from .utils.tokenizer import Tokenizer
from .world.compiler import CompiledWorld


class Navigator:
    """Request-level navigation over a trained agent."""

    def __init__(self, world: CompiledWorld, agent, params, model_state,
                 tokenizer: Tokenizer, max_batch: int = 8, precision: str = "f32",
                 use_pallas: Optional[bool] = None):
        self.world = world
        self.agent = agent
        self.params = params
        self.model_state = model_state
        self.tok = tokenizer
        self.max_batch = max_batch
        self.tables = world.device_tables(precision)

        # serving gets the production kernels too (fused observation +
        # Pallas encoder; eval rollout 3.31 -> 1.36 ms on v5e).  Default:
        # on for real TPU, off elsewhere (interpret mode is slow).
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        # Both backends are process-global knobs: set them explicitly in
        # BOTH directions so constructing a Navigator(use_pallas=False)
        # restores the XLA path even after a pallas Navigator existed in
        # the same process (advisor round-2 finding).
        from .ops import fused_obs, rnn

        if use_pallas:
            rnn.set_backend("pallas")
            fused_obs.set_backend("pallas_prng")
        else:
            rnn.set_backend("xla")
            fused_obs.set_backend("xla")

        def roll(tables, params, model_state, ep, rng):
            _, result, _ = agent.rollout(params, model_state, tables, ep, rng,
                                         feedback=FEEDBACK_ARGMAX, train=False)
            return result

        self._rollout = jax.jit(roll)

    @classmethod
    def from_checkpoint(cls, world: CompiledWorld, agent, ckpt_path: str,
                        tokenizer: Tokenizer, **kwargs) -> "Navigator":
        bundle = load_checkpoint(ckpt_path)
        return cls(world, agent, bundle["params"], bundle.get("model_state") or {},
                   tokenizer, **kwargs)

    def navigate_batch(self, requests: Sequence[dict], rng=None) -> List[dict]:
        """Each request: {"instruction", "scan", "start_viewpoint",
        "heading" (optional), "goal_viewpoint" (optional, metrics only)}.
        Returns per-request {"trajectory", "instruction"} dicts."""
        assert len(requests) <= self.max_batch, f"micro-batch limit {self.max_batch}"
        if rng is None:
            rng = jax.random.PRNGKey(0)
        B = self.max_batch
        L = self.tok.encoding_length

        tokens = np.zeros((B, L), np.int32)
        lengths = np.ones(B, np.int32)
        start = np.zeros(B, np.int32)
        heading = np.zeros(B, np.float32)
        goal = np.zeros(B, np.int32)
        goal_local = np.zeros(B, np.int32)
        valid = np.zeros(B, bool)
        for i, req in enumerate(requests):
            enc = self.tok.encode_sentence(req["instruction"])
            if enc is None:
                raise ValueError(f"un-encodable instruction: {req['instruction']!r}")
            tokens[i], lengths[i] = enc
            g = self.world.global_id(req["scan"], req["start_viewpoint"])
            start[i] = g
            heading[i] = float(req.get("heading", 0.0))
            tgt = self.world.global_id(req["scan"], req["goal_viewpoint"]) \
                if "goal_viewpoint" in req else g
            goal[i] = tgt
            goal_local[i] = self.world.node_local[tgt]
            valid[i] = True

        ep = EpisodeBatch(
            instr_tokens=jnp.asarray(tokens), instr_len=jnp.asarray(lengths),
            start_node=jnp.asarray(start), start_heading=jnp.asarray(heading),
            goal=jnp.asarray(goal), goal_local=jnp.asarray(goal_local),
            item_idx=jnp.arange(B, dtype=jnp.int32), valid=jnp.asarray(valid),
        )
        result = self._rollout(self.tables, self.params, self.model_state, ep, rng)
        data = [{"instr_id": i} for i in range(B)]
        outs = assemble_trajectories(self.world, ep, result, data)
        by_idx = {o["instr_id"]: o["trajectory"] for o in outs}
        return [
            {"instruction": req["instruction"], "trajectory": by_idx[i]}
            for i, req in enumerate(requests)
        ]

    def navigate(self, instruction: str, scan: str, start_viewpoint: str,
                 heading: float = 0.0, rng=None) -> dict:
        return self.navigate_batch([{
            "instruction": instruction, "scan": scan,
            "start_viewpoint": start_viewpoint, "heading": heading,
        }], rng=rng)[0]
