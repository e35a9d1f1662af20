"""Agent factory (ref: tasks/R2R-judy/src/agent/__init__.py:11-54)."""
from __future__ import annotations

from .common import (FEEDBACK_ARGMAX, FEEDBACK_IDS, FEEDBACK_SAMPLE,
                     FEEDBACK_TEACHER, RolloutResult, StepRecord,
                     assemble_trajectories, rollout_scan)
from .envdrop import EnvDropAgent
from .follower import FollowerAgent
from .monitor import SelfMonitorAgent
from .test_agent import TestAgent


def build_agent(cfg, vocab_size: int, feat_dim: int = 2048):
    """Instantiate the agent selected by cfg.MODEL.NAME."""
    name = cfg.MODEL.NAME
    episode_len = cfg.AGENT.MAX_EPISODE_LEN
    if name == "FOLLOWER":
        return FollowerAgent(cfg.MODEL.FOLLOWER, vocab_size, feat_dim, episode_len)
    if name == "SELF-MONITOR":
        return SelfMonitorAgent(cfg.MODEL.MONITOR, cfg.DATA.MAX_ENC_LEN, vocab_size, feat_dim, episode_len)
    if name == "ENVDROP":
        return EnvDropAgent(cfg.MODEL.ENVDROP, cfg.DATA.MAX_ENC_LEN, vocab_size, feat_dim, episode_len)
    if name == "TEST":
        return TestAgent(episode_len)
    raise NotImplementedError(name)


__all__ = [
    "FollowerAgent", "SelfMonitorAgent", "EnvDropAgent", "TestAgent",
    "build_agent", "FEEDBACK_IDS", "FEEDBACK_TEACHER", "FEEDBACK_ARGMAX",
    "FEEDBACK_SAMPLE", "RolloutResult", "StepRecord", "assemble_trajectories",
    "rollout_scan",
]
