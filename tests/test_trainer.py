"""End-to-end training engine tests on the synthetic world."""
import os

import jax
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import FollowerAgent, build_agent
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine import (ClassicTrainer, check_the_code,
                                                    load_checkpoint, save_checkpoint)
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def tiny_cfg(tmp_path, model="FOLLOWER"):
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = model
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
    cfg.MODEL.FOLLOWER.ENC_LAYERS = 1
    cfg.MODEL.ENVDROP.WORD_EMB_SIZE = 32
    cfg.MODEL.ENVDROP.ACT_EMB_SIZE = 16
    cfg.MODEL.ENVDROP.HIDDEN_SIZE = 64
    cfg.MODEL.ENVDROP.ML_WEIGHT = 0.2
    cfg.MODEL.ENVDROP.GAMMA = 0.9
    cfg.MODEL.ENVDROP.RL_NORMALIZE = "total"
    cfg.DATA.MAX_ENC_LEN = 24
    cfg.AGENT.MAX_EPISODE_LEN = 8
    cfg.AGENT.FEEDBACK = "teacher"
    cfg.TRAIN.OPTIM = "adam"
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.BATCH_SIZE = 6
    cfg.TRAIN.MAX_EPOCH = 3
    cfg.TRAIN.EVAL_INTERVAL = 3
    cfg.OUTPUT.CKPT_DIR = str(tmp_path / "ckpt")
    cfg.OUTPUT.TSBOARD_DIR = str(tmp_path / "tb")
    return cfg


@pytest.fixture(scope="module")
def envs(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    train = R2RBatchEnv(synth_world, data, batch_size=6, tokenizer=tokenizer, seed=1)
    valid = {
        "val_seen": R2RBatchEnv(synth_world, data[:18], batch_size=6, tokenizer=tokenizer, seed=2),
        "val_unseen": R2RBatchEnv(synth_world, data[18:36], batch_size=6, tokenizer=tokenizer, seed=3),
    }
    return train, valid


def test_check_the_code(envs, synth_world, tmp_path):
    cfg = tiny_cfg(tmp_path)
    _, valid = envs
    summary = check_the_code(cfg, synth_world.device_tables(), valid)
    assert summary["success_rate"] == 1.0


def test_classic_trainer_loss_decreases(envs, tokenizer, tmp_path):
    cfg = tiny_cfg(tmp_path)
    train_env, valid_env = envs
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    trainer = ClassicTrainer()
    params, mstate, best = trainer.train(
        cfg, agent, cfg.OUTPUT.TSBOARD_DIR, train_env, valid_env,
        seed=0, max_iters_override=6,
    )
    # loss decreased epoch over epoch (training works)
    import json
    events = []
    tb_dirs = os.listdir(cfg.OUTPUT.TSBOARD_DIR)
    with open(os.path.join(cfg.OUTPUT.TSBOARD_DIR, tb_dirs[0], "events.jsonl")) as f:
        for line in f:
            events.append(json.loads(line))
    epoch_losses = [e["value"] for e in events if e["tag"] == "train/ml_epoch"]
    assert len(epoch_losses) == 3
    assert epoch_losses[-1] < epoch_losses[0]
    # eval ran and produced best-SR bookkeeping
    assert "val_unseen" in best
    # checkpoints exist
    assert os.path.exists(os.path.join(cfg.OUTPUT.CKPT_DIR, "latest.ckpt"))


def test_checkpoint_roundtrip_and_resume(envs, tokenizer, tmp_path):
    cfg = tiny_cfg(tmp_path)
    agent = FollowerAgent(cfg.MODEL.FOLLOWER, tokenizer.vocab_size(), FEAT_DIM, episode_len=6)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "test.ckpt")
    save_checkpoint(path, params, opt_state=None, model_state=mstate,
                    rng=jax.random.PRNGKey(7), epoch=5, cfg_yaml=cfg.dump())
    bundle = load_checkpoint(path)
    assert bundle["epoch"] == 5
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(bundle["params"])
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))


def test_envdrop_trainer_runs(envs, tokenizer, tmp_path):
    cfg = tiny_cfg(tmp_path, model="ENVDROP")
    cfg.AGENT.FEEDBACK = "sample"  # triggers the IL+RL dual-rollout path
    cfg.TRAIN.OPTIM = "rms"
    cfg.TRAIN.MAX_EPOCH = 1
    cfg.TRAIN.EVAL_INTERVAL = 5  # skip eval
    train_env, valid_env = envs
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    trainer = ClassicTrainer()
    params, mstate, _ = trainer.train(
        cfg, agent, None, train_env, valid_env, seed=0, max_iters_override=3,
    )
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_write_results_and_score_from_file(envs, synth_world, synth_dataset, tmp_path):
    """Results JSON roundtrip: write trajectories, score the file
    (the reference's write_results + Evaluation.score(file) path)."""
    import jax

    from curriculum_learning_for_vln_tpu.agents import TestAgent
    from curriculum_learning_for_vln_tpu.engine import Evaluation, run_eval
    from curriculum_learning_for_vln_tpu.engine.loop import write_results

    _, valid = envs
    henv = valid["val_seen"]
    agent = TestAgent(episode_len=10)
    results = run_eval(agent, {}, {}, synth_world.device_tables(), henv, jax.random.PRNGKey(0))
    path = write_results(results, str(tmp_path), split="val_seen")
    ev = Evaluation(synth_world, [it for it in synth_dataset
                                  if it["path_id"] in {d["path_id"] for d in henv.data}])
    summary, _ = ev.score(path)
    assert summary["success_rate"] == 1.0


def test_trainer_resume_continues(envs, tokenizer, tmp_path):
    """OUTPUT.RESUME=latest restores params/optimizer/RNG/epoch and
    continues — the reference loses optimizer+RNG state (SURVEY §5 gap)."""
    cfg = tiny_cfg(tmp_path)
    cfg.TRAIN.MAX_EPOCH = 2
    cfg.TRAIN.EVAL_INTERVAL = 10
    train_env, valid_env = envs
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    trainer = ClassicTrainer()
    trainer.train(cfg, agent, None, train_env, valid_env, seed=0, max_iters_override=3)

    bundle = load_checkpoint(os.path.join(cfg.OUTPUT.CKPT_DIR, "latest.ckpt"))
    assert bundle["epoch"] == 2
    assert bundle["opt_state"] is not None  # optimizer state captured
    assert bundle["rng"] is not None        # RNG captured

    cfg2 = tiny_cfg(tmp_path)
    cfg2.TRAIN.MAX_EPOCH = 3
    cfg2.TRAIN.EVAL_INTERVAL = 10
    cfg2.OUTPUT.RESUME = "latest"
    agent2 = build_agent(cfg2, tokenizer.vocab_size(), FEAT_DIM)
    params2, _, _ = ClassicTrainer().train(
        cfg2, agent2, None, train_env, valid_env, seed=0, max_iters_override=3)
    # resumed run trained exactly one more epoch (3) and saved it
    bundle2 = load_checkpoint(os.path.join(cfg2.OUTPUT.CKPT_DIR, "latest.ckpt"))
    assert bundle2["epoch"] == 3


def test_scanned_train_step_matches_sequential(envs, tokenizer):
    """K iterations fused in one dispatch produce the same parameters as K
    sequential train-step dispatches (same batches/rngs)."""
    import jax.numpy as jnp

    from curriculum_learning_for_vln_tpu.engine.loop import (build_scanned_train_step,
                                                             build_train_step,
                                                             make_optimizer, stack_batches)

    cfg = get_cfg_defaults()
    m = cfg.MODEL.FOLLOWER
    m.WORD_EMB_SIZE = 32
    m.HIDDEN_SIZE = 64
    m.ENC_LAYERS = 1
    train_env, _ = envs
    agent = FollowerAgent(m, tokenizer.vocab_size(), FEAT_DIM, episode_len=6)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)
    tables = train_env.world.device_tables()

    batches = [train_env.next_batch() for _ in range(3)]
    rngs = jax.random.split(jax.random.PRNGKey(7), 3)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    seq = build_train_step(agent, opt, "teacher")
    p_seq, o_seq, ms_seq = copy(params), copy(opt_state), mstate
    for b, r in zip(batches, rngs):
        p_seq, o_seq, ms_seq, _ = seq(tables, p_seq, o_seq, ms_seq, b, r)

    scan = build_scanned_train_step(agent, opt, "teacher")
    p_scan, o_scan, ms_scan, slogs = scan(
        tables, copy(params), copy(opt_state), mstate, stack_batches(batches), rngs)

    assert slogs["loss"].shape == (3,)
    for a, b in zip(jax.tree_util.tree_leaves(p_seq), jax.tree_util.tree_leaves(p_scan)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
