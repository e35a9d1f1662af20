"""Model-free teacher-following agent — the env/reward plumbing sanity check.

Rebuild of the reference's TestAgent (`tasks/R2R-judy/src/agent/
base.py:484-571`) used by ``check_the_code`` (trainer.py:27-39): follows
the shortest-path teacher every step; expected to score SR ~= 1.0, which
validates env stepping, teacher actions, trajectory recording and the
metric pipeline end to end with no learned weights.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..env.env import EpisodeBatch
from ..world.compiler import WorldTables
from . import common as C


class TestAgent:
    name = "TEST"
    __test__ = False  # not a pytest class

    def __init__(self, episode_len: int = 20):
        self.episode_len = episode_len

    def init(self, key) -> Tuple[dict, dict]:
        return {}, {}

    def rollout(
        self,
        params: dict,
        model_state: dict,
        world: WorldTables,
        ep: EpisodeBatch,
        rng,
        feedback: int = C.FEEDBACK_TEACHER,
        train: bool = False,
    ):
        B = ep.instr_tokens.shape[0]
        K = world.max_candidates + 1

        def model_step(mc, obs, state, rng_t, t):
            # logits = one-hot(teacher): argmax/sample/teacher all follow it
            tgt = jnp.clip(obs.teacher, 0, K - 1)
            logits = jnp.where(
                jnp.arange(K)[None, :] == tgt[:, None], 0.0, C.NEG_INF_SAFE
            )
            return logits, mc, jnp.zeros((B, 1)), jnp.zeros(B)

        result = C.rollout_scan(
            world, ep, rng, (), model_step, self.episode_len, C.FEEDBACK_TEACHER
        )
        return None, result, model_state
