"""Packed RL rollouts (agents/packed.py, TPU.PACKED_RL).

Three layers of evidence:
* with pool == batch the packed A2C is value- and gradient-identical to
  the unpacked `EnvDropAgent.rollout(train_rl=True)` (the refill
  machinery degenerates to a no-op);
* refill bookkeeping invariants hold on a real packed run (episodes
  assigned at most once, contiguous slot segments, counters consistent);
* the packed trainer path runs end-to-end through the CLI (smoke).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import build_agent
from curriculum_learning_for_vln_tpu.agents.common import FEEDBACK_SAMPLE
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine.loop import concat_batches
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def envdrop_cfg():
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "ENVDROP"
    cfg.MODEL.ENVDROP.WORD_EMB_SIZE = 32
    cfg.MODEL.ENVDROP.ACT_EMB_SIZE = 16
    cfg.MODEL.ENVDROP.HIDDEN_SIZE = 64
    cfg.MODEL.ENVDROP.ML_WEIGHT = 0.2
    cfg.MODEL.ENVDROP.GAMMA = 0.9
    cfg.DATA.MAX_ENC_LEN = 24
    # 9, not 12: sampled episodes under this env/seed are all dead by
    # step 9 (see tests/test_knobs.py alive counts), truncation of the
    # stragglers still exercises the packed truncation path, and scan
    # length dominates the single-core XLA-CPU compile bill
    cfg.AGENT.MAX_EPISODE_LEN = 9
    cfg.TPU.PRECISION = "f32"
    return cfg


@pytest.fixture(scope="module")
def setup(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=3)
    tables = synth_world.device_tables()
    cfg = envdrop_cfg()
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    return henv, tables, agent, params, mstate


def test_packed_equals_unpacked_at_factor_one(setup):
    """N == B: same rl loss and gradients as the unpacked RL rollout."""
    henv, tables, agent, params, mstate = setup
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(7)

    def loss_unpacked(p):
        rl, _, _ = agent.rollout(p, mstate, tables, ep, rng,
                                 feedback=FEEDBACK_SAMPLE, train=True,
                                 train_ml=False, train_rl=True)
        return rl.rl_loss, (rl.entropy_sum, rl.critic_loss_sum, rl.total_actions)

    def loss_packed(p):
        rl, _ = agent.rollout_packed(p, mstate, tables, ep, rng, batch_size=8)
        return rl.rl_loss, (rl.entropy_sum, rl.critic_loss_sum, rl.total_actions)

    (l0, aux0), g0 = jax.jit(jax.value_and_grad(loss_unpacked, has_aux=True))(params)
    (l1, aux1), g1 = jax.jit(jax.value_and_grad(loss_packed, has_aux=True))(params)
    assert np.allclose(float(l0), float(l1), atol=1e-5)
    for a, b in zip(aux0, aux1):
        assert np.allclose(float(a), float(b), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4), \
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_packed_refill_invariants(setup):
    """Factor-3 pool: every pool episode runs in at most one contiguous
    slot segment, counters match the records, and utilization beats the
    unpacked rollout's."""
    henv, tables, agent, params, mstate = setup
    raws = [henv.next_batch() for _ in range(3)]
    pool = concat_batches(raws)
    N = int(pool.valid.shape[0])
    rng = jax.random.PRNGKey(11)

    @jax.jit
    def run(p):
        return agent.rollout_packed(p, mstate, tables, pool, rng, batch_size=8)[1]

    result = run(params)
    slot_ep = np.asarray(result.steps.slot_ep)            # [T, B]
    alive = np.asarray(result.steps.alive_before)
    ended_now = np.asarray(result.steps.ended_now)
    started = int(result.episodes_started)
    done = int(result.episodes_done)
    T, B = slot_ep.shape

    assert 8 <= started <= N
    assert done <= started
    # each episode id appears in exactly one slot, as one contiguous run
    for eid in range(N):
        hits = [(t, b) for t in range(T) for b in range(B) if slot_ep[t, b] == eid]
        if not hits:
            # never started, or legitimately assigned on the final scan
            # step (refill happens after the record is emitted, so such an
            # episode records zero steps); the initial B ids always appear
            assert eid >= 8, eid
            continue
        slots = {b for _, b in hits}
        assert len(slots) == 1, f"episode {eid} ran in slots {slots}"
        ts = sorted(t for t, _ in hits)
        assert ts == list(range(ts[0], ts[-1] + 1)), f"episode {eid} not contiguous"
    # ids of episodes that were never started must not appear
    assert slot_ep.max() < started
    # ended_now only on alive steps, at most once per episode
    assert not np.any(ended_now & ~alive)
    flat = slot_ep[ended_now]
    assert len(flat) == len(set(flat.tolist())) == done
    # packing keeps utilization above what the same policy manages unpacked
    @jax.jit
    def run_unpacked(p):
        _, r, _ = agent.rollout(p, mstate, tables, raws[0], rng,
                                feedback=FEEDBACK_SAMPLE, train=True,
                                train_ml=False, train_rl=True)
        return r.steps.alive_before

    alive_un = np.asarray(run_unpacked(params))
    assert alive.mean() > alive_un.mean()


def test_packed_episode_attribution(setup):
    """Per-episode loss vector: only started episodes carry loss mass."""
    henv, tables, agent, params, mstate = setup
    raws = [henv.next_batch() for _ in range(3)]
    pool = concat_batches(raws)
    rng = jax.random.PRNGKey(13)

    @jax.jit
    def run(p):
        return agent.rollout_packed(p, mstate, tables, pool, rng, batch_size=8)

    losses, result = run(params)
    vec = np.asarray(losses.rl_loss_per_episode)
    started = int(result.episodes_started)
    assert vec.shape == (int(pool.valid.shape[0]),)
    assert np.allclose(vec[started:], 0.0)
    assert np.allclose(vec.sum(), float(losses.rl_loss), rtol=1e-4, atol=1e-5)


def test_packed_early_exit_identical(setup):
    """TPU.SCAN_EARLY_EXIT composes with the packed scan: once the pool is
    exhausted and every slot is dead, steps are skipped — loss and grads
    must match the no-exit packed run."""
    from curriculum_learning_for_vln_tpu.agents import common as AC

    henv, tables, agent, params, mstate = setup
    # small pool (factor 2) + enough horizon that the exhausted-pool tail
    # goes all-dead within the scan (asserted below — 22 steps suffice:
    # 16 sampled episodes through 8 slots are drained well before that)
    raws = [henv.next_batch() for _ in range(2)]
    pool = concat_batches(raws)
    rng = jax.random.PRNGKey(17)
    T = 22

    def loss_fn(p):
        rl, res = agent.rollout_packed(p, mstate, tables, pool, rng,
                                       batch_size=8, episode_len=T)
        return rl.rl_loss, res.steps.alive_before

    try:
        # two distinct jit objects: the early-exit flag is read at trace
        # time, so one shared callable would silently reuse the first trace
        AC.set_early_exit(False)
        (l0, alive), g0 = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
        AC.set_early_exit(True)
        (l1, _), g1 = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    finally:
        AC.set_early_exit(False)
    # the skipped-step equality only bites if some steps ARE all-dead
    assert not np.asarray(alive)[-1].any(), "no all-dead tail: raise episode_len"
    assert np.allclose(float(l0), float(l1), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_packed_weighted_ones_matches_unweighted(setup):
    """SPCL-weighted packed step with all-ones weights reproduces the
    unweighted total: dot(1, ml_vec) == ml_loss and
    dot(1, rl_per_episode) == rl_loss."""
    from curriculum_learning_for_vln_tpu.engine.loop import (
        build_packed_train_step, make_optimizer)

    henv, tables, agent, params, mstate = setup
    raws = [henv.next_batch() for _ in range(2)]
    pool = concat_batches(raws)
    N = int(pool.valid.shape[0])
    opt = make_optimizer("sgd", 1e-2)
    rng = jax.random.PRNGKey(19)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    step_u = build_packed_train_step(agent, opt)
    step_w = build_packed_train_step(agent, opt, weighted=True)
    p0, _, _, logs0 = step_u(tables, copy(params), opt.init(params), mstate,
                             raws[0], pool, rng)
    p1, _, _, logs1 = step_w(tables, copy(params), opt.init(params), mstate,
                             raws[0], pool, rng,
                             jnp.ones(8), jnp.ones(N))
    assert np.allclose(float(logs0["loss"]), float(logs1["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # zero weights kill the update entirely (grads of a 0 objective)
    p2, _, _, logs2 = step_w(tables, copy(params), opt.init(params), mstate,
                             raws[0], pool, rng,
                             jnp.zeros(8), jnp.zeros(N))
    assert float(logs2["loss"]) == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_packed_spcl_trainer_smoke(synth_world, synth_dataset, tokenizer, tmp_path):
    """TPU.PACKED_RL=2 drives the SPCL trainer (CLR2R rounds, weighted
    packed objective) end-to-end."""
    from curriculum_learning_for_vln_tpu import engine
    from curriculum_learning_for_vln_tpu.env.host_env import CLR2RBatchEnv

    data = expand_r2r_items(synth_dataset, tokenizer)
    cfg = envdrop_cfg()
    cfg.DATA.NAME = "CLR2R"
    cfg.TRAIN.CLMODE = "SELF-PACE"
    cfg.TPU.PACKED_RL = 2
    cfg.TRAIN.MAX_EPOCH = 2
    cfg.TRAIN.ITER_PER_EPOCH = 2
    cfg.TRAIN.BATCH_SIZE = 8
    # no eval inside the smoke: the epoch-boundary SPCL weight update is
    # what this test exercises; eval compiles are covered by test_trainer
    cfg.TRAIN.EVAL_INTERVAL = 5
    cfg.AGENT.FEEDBACK = "sample"
    cfg.OUTPUT.CKPT_DIR = str(tmp_path / "ckpt")
    # 5 synthetic rounds: slice the expanded data
    rounds = {f"round_{k}": data[(k - 1) * 12: k * 12] for k in range(1, 6)}
    train_env = CLR2RBatchEnv(synth_world, rounds, 8, 1.0, tokenizer, seed=3)
    valid_env = {
        "val_unseen": R2RBatchEnv(synth_world, data[18:36], batch_size=6,
                                  tokenizer=tokenizer, seed=4),
    }
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    trainer = engine.SelfPacedCurriculum(train_env, interval=1, burn_in=1)
    trainer.train(cfg, agent, None, train_env, valid_env, seed=5)


def test_packed_trainer_smoke(synth_world, synth_dataset, tokenizer, tmp_path):
    """TPU.PACKED_RL=3 drives ClassicTrainer end-to-end (2 epochs)."""
    from curriculum_learning_for_vln_tpu.engine.trainer import ClassicTrainer

    data = expand_r2r_items(synth_dataset, tokenizer)
    cfg = envdrop_cfg()
    cfg.TPU.PACKED_RL = 3
    cfg.TRAIN.MAX_EPOCH = 2
    cfg.TRAIN.ITER_PER_EPOCH = 2
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.EVAL_INTERVAL = 2
    cfg.AGENT.FEEDBACK = "sample"
    cfg.OUTPUT.CKPT_DIR = str(tmp_path / "ckpt")
    train_env = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=3)
    valid_env = {
        "val_unseen": R2RBatchEnv(synth_world, data[18:36], batch_size=6,
                                  tokenizer=tokenizer, seed=4),
    }
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    ClassicTrainer().train(cfg, agent, None, train_env, valid_env, seed=5)


def test_check_pool_valid_rejects_padding(setup):
    """Trainers verify the packed pool once at setup: a padding episode
    would be refilled born-ended (agents/packed.py contract)."""
    from curriculum_learning_for_vln_tpu.engine.loop import check_pool_valid

    henv, tables, agent, params, mstate = setup
    pool = concat_batches([henv.next_batch(), henv.next_batch()])
    check_pool_valid(pool)  # full-valid wraparound batches pass

    bad = pool._replace(valid=pool.valid.at[3].set(False))
    with pytest.raises(ValueError, match="padding"):
        check_pool_valid(bad)
