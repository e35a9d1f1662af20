"""Shared harness for the knob-sweep perf scripts (perf_unroll.py,
perf_early_exit.py): synthetic world + EnvDrop agent at the bench shapes,
the production-kernel backends, and the relay-RTT-cancelling two-scan-
length differencing from scripts/perf_probe.py / bench.py (CLAUDE.md
"Benchmark timing" — `block_until_ready` is not trustworthy through the
axon relay).  Run these scripts ALONE: concurrent CPU-heavy jobs corrupt
the host wall-clock between fetches, and relay baselines drift between
sessions, so only compare numbers from one run."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
EPISODE_LEN = 35
IL_LEN = 8
ENC_LEN = 80
FEAT_DIM = 2048
HIDDEN = 512


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_setup():
    """Returns (agent, tables, henv, ep, params, opt, opt_state) at bench
    shapes with the production kernel backends selected per platform."""
    import jax
    import jax.numpy as jnp

    from curriculum_learning_for_vln_tpu.agents import EnvDropAgent
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.engine.loop import make_optimizer
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.ops import fused_obs, rnn
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults
    from curriculum_learning_for_vln_tpu.utils.tokenizer import Tokenizer, build_vocab
    from curriculum_learning_for_vln_tpu.world import compiler, synthetic

    graphs = synthetic.make_world_graphs(12, 64, seed=0)
    world = compiler.compile_world(graphs, max_candidates=16)
    compiler.attach_synthetic_features(world, feature_dim=FEAT_DIM)
    items = synthetic.make_r2r_dataset(graphs, num_paths=512, seed=1,
                                       min_hops=4, max_hops=7)
    tok = Tokenizer(build_vocab(items, min_count=1), encoding_length=ENC_LEN)
    data = expand_r2r_items(items, tok)
    henv = R2RBatchEnv(world, data, batch_size=BATCH, tokenizer=tok, seed=0)

    platform = jax.devices()[0].platform
    log(f"platform: {platform} ({jax.devices()[0]})")
    tables = world.device_tables("bf16" if platform != "cpu" else "f32")

    cfg = get_cfg_defaults()
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE = 256
    m.ACT_EMB_SIZE = 64
    m.HIDDEN_SIZE = HIDDEN
    m.ENC_BIDIRECTION = True
    m.ENC_LAYERS = 1
    m.ML_WEIGHT = 0.2
    m.GAMMA = 0.9
    m.RL_NORMALIZE = "total"
    agent = EnvDropAgent(m, max_enc_len=ENC_LEN, vocab_size=tok.vocab_size(),
                         feat_dim=FEAT_DIM, episode_len=EPISODE_LEN)
    if platform != "cpu":
        agent.compute_dtype = jnp.bfloat16
        rnn.set_backend("pallas")
    fused_obs.set_backend("pallas_prng" if platform != "cpu" else "xla")
    params, _ = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    opt = make_optimizer("rms", 1e-4)
    opt_state = opt.init(params)
    return agent, tables, henv, ep, params, opt, opt_state


def make_train_iter(agent, tables, ep, opt, train_ml: bool, train_rl: bool,
                    il_len):
    """One (carry, rng) -> (carry, loss) training iteration matching the
    production EnvDrop step (IL teacher-forced at il_len + sampled RL)."""
    import jax
    import optax

    from curriculum_learning_for_vln_tpu.agents.common import (
        FEEDBACK_SAMPLE, FEEDBACK_TEACHER)
    from curriculum_learning_for_vln_tpu.engine.loop import clip_submodule_grads

    def train_iter(carry, rng):
        p, o = carry

        def loss_fn(pp):
            total = 0.0
            if train_ml:
                il, _, _ = agent.rollout(pp, {}, tables, ep, rng,
                                         feedback=FEEDBACK_TEACHER, train=True,
                                         train_ml=True, train_rl=False,
                                         episode_len=il_len)
                total = total + il.ml_loss
            if train_rl:
                rl, _, _ = agent.rollout(pp, {}, tables, ep,
                                         jax.random.fold_in(rng, 1),
                                         feedback=FEEDBACK_SAMPLE, train=True,
                                         train_ml=False, train_rl=True)
                total = total + rl.rl_loss
            return total

        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = clip_submodule_grads(grads, ("encoder", "decoder"), 40.0)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    return train_iter


def timed(fn, *args, reps=3):
    """Best-of-reps wall time of one fetch, with transient-relay retries."""
    for attempt in range(3):
        try:
            float(fn(*args))
            break
        except Exception as e:
            if attempt == 2:
                raise
            log(f"retry after {e}")
            time.sleep(5)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best


def measure_iter(name, train_iter, params, opt_state, n1=2, n2=8):
    """Relay-cancelled per-iteration time: scan n data-chained iterations
    inside ONE jitted call, fetch a scalar, difference two scan lengths."""
    import jax

    def make_many(n):
        @jax.jit
        def many(params_, opt_state_, rng):
            (_, _), losses = jax.lax.scan(train_iter, (params_, opt_state_),
                                          jax.random.split(rng, n))
            return losses[-1]
        return many

    t0 = time.time()
    t_small = timed(make_many(n1), params, opt_state, jax.random.PRNGKey(2))
    t_big = timed(make_many(n2), params, opt_state, jax.random.PRNGKey(2))
    per = max((t_big - t_small) / (n2 - n1), 1e-9)
    log(f"{name:30s}: {per*1000:8.2f} ms/iter   (compile+warm {time.time()-t0:.0f}s)")
    return per
