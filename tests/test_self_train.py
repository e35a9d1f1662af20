"""Back-translation self-training driver."""
import jax
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import EnvDropAgent
from curriculum_learning_for_vln_tpu.agents.speaker import Speaker
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine.self_train import self_train
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def test_self_train_runs(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    train_env = R2RBatchEnv(synth_world, data[:60], batch_size=4, tokenizer=tokenizer, seed=1)
    aug_env = R2RBatchEnv(synth_world, data[60:], batch_size=4, tokenizer=tokenizer, seed=2)
    tables = synth_world.device_tables()

    cfg = get_cfg_defaults()
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE = 32
    m.ACT_EMB_SIZE = 16
    m.HIDDEN_SIZE = 64
    m.ML_WEIGHT = 0.2
    m.GAMMA = 0.9
    m.RL_NORMALIZE = "total"
    cfg.TRAIN.OPTIM = "rms"
    cfg.TRAIN.LR = 1e-4

    s = cfg.AIDE.SPEAKER
    s.RNN_DIM = 64
    s.WEMB = 32
    s.MAX_DECODE = 16
    s.LR = 1e-3

    agent = EnvDropAgent(m, 24, tokenizer.vocab_size(), FEAT_DIM, episode_len=6)
    speaker = Speaker(s, tokenizer.vocab_size(), feat_dim=FEAT_DIM, episode_len=6)

    params, mstate, (spk_params, _), losses = self_train(
        cfg, agent, speaker, train_env, aug_env, tables,
        seed=0, speaker_iters=3, epochs=1, iters_per_epoch=4)

    assert len(losses["real"]) == 2 and len(losses["bt"]) == 2
    assert all(np.isfinite(v) for v in losses["real"] + losses["bt"])
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
