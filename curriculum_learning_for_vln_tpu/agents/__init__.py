"""Agent factory (ref: tasks/R2R-judy/src/agent/__init__.py:11-54)."""
from __future__ import annotations

from .common import (FEEDBACK_ARGMAX, FEEDBACK_IDS, FEEDBACK_SAMPLE,
                     FEEDBACK_TEACHER, RolloutResult, StepRecord,
                     assemble_trajectories, rollout_scan)
from .envdrop import EnvDropAgent
from .follower import FollowerAgent
from .monitor import SelfMonitorAgent
from .test_agent import TestAgent


def build_agent(cfg, vocab_size: int, feat_dim: int = 2048, vocab=None):
    """Instantiate the agent selected by cfg.MODEL.NAME.

    ``vocab`` (word list) enables text-format GloVe alignment; .npy GloVe
    tables are already vocab-aligned and need only the path.
    """
    name = cfg.MODEL.NAME
    episode_len = cfg.AGENT.MAX_EPISODE_LEN
    if name == "FOLLOWER":
        glove = None
        if cfg.MODEL.FOLLOWER.GLOVE_PATH:
            # frozen pretrained embeddings (ref: units.py:30-37, config.py:70)
            import jax.numpy as jnp

            from ..utils.glove import load_glove

            glove = jnp.asarray(load_glove(
                cfg.MODEL.FOLLOWER.GLOVE_PATH, vocab,
                dim=cfg.MODEL.FOLLOWER.WORD_EMB_SIZE))
        agent = FollowerAgent(cfg.MODEL.FOLLOWER, vocab_size, feat_dim, episode_len,
                              glove=glove)
    elif name == "SELF-MONITOR":
        agent = SelfMonitorAgent(cfg.MODEL.MONITOR, cfg.DATA.MAX_ENC_LEN, vocab_size,
                                 feat_dim, episode_len)
    elif name == "ENVDROP":
        agent = EnvDropAgent(cfg.MODEL.ENVDROP, cfg.DATA.MAX_ENC_LEN, vocab_size,
                             feat_dim, episode_len)
    elif name == "TEST":
        agent = TestAgent(episode_len)
    else:
        raise NotImplementedError(name)

    # feature-path precision follows TPU.PRECISION: with bf16 the observation
    # gathers/concats (the dominant per-step HBM traffic) stay in bf16 until
    # they hit an f32 matmul (jnp promotion), halving feature bandwidth
    if getattr(cfg, "TPU", None) is not None and hasattr(agent, "compute_dtype"):
        import jax.numpy as jnp

        agent.compute_dtype = jnp.bfloat16 if cfg.TPU.PRECISION == "bf16" else jnp.float32
    if getattr(cfg, "TPU", None) is not None and hasattr(agent, "use_fused_bptt"):
        agent.use_fused_bptt = bool(getattr(cfg.TPU, "FUSED_BPTT", True))
    return agent


__all__ = [
    "FollowerAgent", "SelfMonitorAgent", "EnvDropAgent", "TestAgent",
    "build_agent", "FEEDBACK_IDS", "FEEDBACK_TEACHER", "FEEDBACK_ARGMAX",
    "FEEDBACK_SAMPLE", "RolloutResult", "StepRecord", "assemble_trajectories",
    "rollout_scan",
]
