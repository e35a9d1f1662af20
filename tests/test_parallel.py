"""Multi-chip data parallelism on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import EnvDropAgent, FollowerAgent
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine.loop import build_train_step, make_optimizer
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.parallel import mesh as M
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def make_agent(tokenizer):
    cfg = get_cfg_defaults()
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
    cfg.MODEL.FOLLOWER.ENC_LAYERS = 1
    return FollowerAgent(cfg.MODEL.FOLLOWER, tokenizer.vocab_size(), FEAT_DIM, episode_len=6)


def test_mesh_construction():
    mesh = M.make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = M.make_mesh(data=4, model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_dp_train_step_matches_single_device(synth_world, synth_dataset, tokenizer):
    """The sharded 8-device train step computes the same update as the
    single-device one (same batch, same rng): DP correctness."""
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=16, tokenizer=tokenizer, seed=1)
    tables = synth_world.device_tables()
    agent = make_agent(tokenizer)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    # SGD: the update is linear in the gradient, so cross-device reduction
    # order only perturbs params at float32 epsilon (adam's rsqrt would
    # amplify noise on near-zero gradients to full +-lr)
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(42)

    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    # single device
    step1 = build_train_step(agent, opt, "teacher")
    p1, o1, _, logs1 = step1(tables, copy(params), copy(opt_state), mstate, ep, rng)

    # 8-device data-parallel
    mesh = M.make_mesh()
    step8_raw = build_train_step(agent, opt, "teacher")
    # re-jit with shardings: build unjitted closure via the same builder
    from curriculum_learning_for_vln_tpu.engine.loop import build_train_step as bts
    step8 = step8_raw  # the jitted fn accepts sharded inputs transparently
    ep_sharded = M.shard_batch(ep, mesh)
    params_r = M.replicate(params, mesh)
    opt_r = M.replicate(opt_state, mesh)
    p8, o8, _, logs8 = step8(M.replicate(tables, mesh), params_r, opt_r, mstate, ep_sharded, rng)

    assert np.allclose(float(logs1["loss"]), float(logs8["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_jit_sharded_train_step_runs(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=16, tokenizer=tokenizer, seed=1)
    tables = synth_world.device_tables()
    agent = make_agent(tokenizer)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    mesh = M.make_mesh()

    # build an explicitly sharded step from the unjitted closure; tables are
    # a real argument (closing over them embeds the packed world as an XLA
    # constant — the compile-time trap CLAUDE.md documents)
    import functools
    from curriculum_learning_for_vln_tpu.agents.common import FEEDBACK_IDS

    def raw_step(params, opt_state, model_state, ep, rng, tables):
        def loss_fn(p):
            losses, _, ms = agent.rollout(p, model_state, tables, ep, rng,
                                          feedback=FEEDBACK_IDS["teacher"], train=True)
            return agent.loss_fn(losses), ms
        (loss, ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, ms, {"loss": loss}

    with mesh:
        step = jax.jit(raw_step)
        ep = M.shard_batch(henv.next_batch(), mesh)
        p, o, ms, logs = step(M.replicate(params, mesh), M.replicate(opt_state, mesh),
                              mstate, ep, jax.random.PRNGKey(1), M.replicate(tables, mesh))
    assert np.isfinite(float(logs["loss"]))
    # outputs stay replicated
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(p))


def test_pad_batch_to_devices():
    mesh = M.make_mesh()
    assert M.pad_batch_to_devices(13, mesh) == 16
    assert M.pad_batch_to_devices(16, mesh) == 16


# ---------------------------------------------------------------------------
# Production-path DP: the real trainers over the real mesh
# ---------------------------------------------------------------------------

def _epoch_losses(tsboard_dir):
    import json
    import os

    sub = os.listdir(tsboard_dir)[0]
    losses = []
    with open(os.path.join(tsboard_dir, sub, "events.jsonl")) as f:
        for line in f:
            e = json.loads(line)
            if e["tag"] == "train/ml_epoch":
                losses.append(e["value"])
    return losses


def _envdrop_cfg(tmp_path, tag, mesh_data):
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "ENVDROP"
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE = 32
    m.ACT_EMB_SIZE = 16
    m.HIDDEN_SIZE = 64
    m.ML_WEIGHT = 0.2
    m.GAMMA = 0.9
    m.RL_NORMALIZE = "total"
    cfg.DATA.MAX_ENC_LEN = 24
    cfg.AGENT.MAX_EPISODE_LEN = 6
    cfg.AGENT.FEEDBACK = "sample"   # IL+RL dual rollout
    # sgd: linear in the gradient, so the cross-device reduction order only
    # perturbs at float epsilon (see test_dp_train_step_matches_single_device)
    cfg.TRAIN.OPTIM = "sgd"
    cfg.TRAIN.LR = 1e-2
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.TRAIN.MAX_EPOCH = 2
    cfg.TRAIN.EVAL_INTERVAL = 5     # no eval inside the loop
    cfg.TPU.MESH_DATA = mesh_data
    cfg.OUTPUT.CKPT_DIR = str(tmp_path / f"ckpt_{tag}")
    cfg.OUTPUT.TSBOARD_DIR = str(tmp_path / f"tb_{tag}")
    return cfg


def _fresh_envs(synth_world, synth_dataset, tokenizer, batch):
    data = expand_r2r_items(synth_dataset, tokenizer)
    train = R2RBatchEnv(synth_world, data, batch_size=batch, tokenizer=tokenizer, seed=1)
    valid = {"val_seen": R2RBatchEnv(synth_world, data[:16], batch_size=batch,
                                     tokenizer=tokenizer, seed=2)}
    return train, valid


def test_classic_trainer_dp_matches_single_device(synth_world, synth_dataset, tokenizer, tmp_path):
    """ClassicTrainer.train over the 8-device mesh (EnvDrop IL+RL) produces
    the same per-epoch losses as over a 1-device mesh — the production DP
    path is numerically equivalent, not just finite."""
    from curriculum_learning_for_vln_tpu.agents import build_agent
    from curriculum_learning_for_vln_tpu.engine import ClassicTrainer

    losses = {}
    for tag, mesh_data in (("dp1", 1), ("dp8", 8)):
        cfg = _envdrop_cfg(tmp_path, tag, mesh_data)
        train_env, valid_env = _fresh_envs(synth_world, synth_dataset, tokenizer,
                                           cfg.TRAIN.BATCH_SIZE)
        agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
        ClassicTrainer().train(cfg, agent, cfg.OUTPUT.TSBOARD_DIR, train_env, valid_env,
                               seed=0, max_iters_override=3)
        losses[tag] = _epoch_losses(cfg.OUTPUT.TSBOARD_DIR)

    assert len(losses["dp1"]) == 2 and len(losses["dp8"]) == 2
    assert np.allclose(losses["dp1"], losses["dp8"], rtol=1e-4, atol=1e-4), losses


def test_spcl_trainer_dp_matches_single_device(synth_world, synth_dataset, tokenizer, tmp_path):
    """SelfPacedCurriculum.train (weighted per-sample losses + device SPCL
    solver) is DP-equivalent across mesh sizes."""
    from curriculum_learning_for_vln_tpu.engine import SelfPacedCurriculum
    from curriculum_learning_for_vln_tpu.env.host_env import CLR2RBatchEnv

    data = expand_r2r_items(synth_dataset, tokenizer)
    per = max(1, len(data) // 5)
    rounds = {f"round_{k}": data[(k - 1) * per: k * per if k < 5 else len(data)]
              for k in range(1, 6)}

    losses = {}
    for tag, mesh_data in (("sp1", 1), ("sp8", 8)):
        cfg = _envdrop_cfg(tmp_path, tag, mesh_data)
        cfg.MODEL.NAME = "FOLLOWER"
        cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
        cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
        cfg.AGENT.FEEDBACK = "teacher"
        cfg.DATA.NAME = "CLR2R"
        cfg.TRAIN.CLMODE = "SELF-PACE"
        train_env = CLR2RBatchEnv(synth_world, rounds, batch_size=cfg.TRAIN.BATCH_SIZE,
                                  c_rate=1.0, tokenizer=tokenizer, seed=1)
        _, valid_env = _fresh_envs(synth_world, synth_dataset, tokenizer, cfg.TRAIN.BATCH_SIZE)
        from curriculum_learning_for_vln_tpu.agents import build_agent

        agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
        trainer = SelfPacedCurriculum(train_env, pace_func="linear", init_lamb=2.0,
                                      init_weight_ctrl=0.5, miu=1.0, interval=1,
                                      strategy="epoch", burn_in=1)
        trainer.train(cfg, agent, cfg.OUTPUT.TSBOARD_DIR, train_env, valid_env,
                      seed=0, max_iters_override=3)
        losses[tag] = _epoch_losses(cfg.OUTPUT.TSBOARD_DIR)

    assert len(losses["sp1"]) == 2 and len(losses["sp8"]) == 2
    assert np.allclose(losses["sp1"], losses["sp8"], rtol=1e-4, atol=1e-4), losses


@pytest.mark.parametrize("optim", ["adam", "rms"])
def test_dp_step_optimizer_variants(synth_world, synth_dataset, tokenizer, optim):
    """Adam/RMSprop under 8-way sharding: same loss as 1-device (loss is
    computed before the update, so reduction-order noise in the rsqrt
    path does not affect it) and finite, close parameters."""
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=16, tokenizer=tokenizer, seed=1)
    tables = synth_world.device_tables()
    agent = make_agent(tokenizer)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer(optim, 1e-3)
    opt_state = opt.init(params)
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(42)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    step = build_train_step(agent, opt, "teacher")
    p1, _, _, logs1 = step(tables, copy(params), copy(opt_state), mstate, ep, rng)

    mesh = M.make_mesh()
    p8, _, _, logs8 = step(M.replicate(tables, mesh), M.replicate(copy(params), mesh),
                           M.replicate(copy(opt_state), mesh), mstate,
                           M.shard_batch(ep, mesh), rng)
    assert np.allclose(float(logs1["loss"]), float(logs8["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        # rsqrt amplifies reduction-order noise on near-zero grads: compare
        # with a loose but meaningful bound scaled by the lr
        assert np.max(np.abs(a - b)) < 2e-3, np.max(np.abs(a - b))
