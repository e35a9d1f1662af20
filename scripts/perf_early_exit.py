"""Measure TPU.SCAN_EARLY_EXIT on real TPU: all-ended rollout steps are
skipped via a per-step lax.cond (the reference breaks its Python loop
there, follower.py:168 — a fixed-length scan burns full model steps on
all-dead batches instead).

Two policy regimes matter:
* untrained (bench harness, B=64 T=35): sampling stops geometrically, so
  batches still fully end around step ~20 — the tail is skippable;
* converged (probe on the 100-epoch checkpoint): all episodes end by
  step 7-9 of 15 -> ~47% of the scan is dead at T=15, ~70% at T=35.

This measures the untrained bench shapes (rl-only T35, full IL8+RL35)
exit-off vs exit-on, relay-RTT-cancelled like scripts/perf_probe.py.
Run alone (CPU-heavy jobs corrupt relay timing):
    python scripts/perf_early_exit.py
"""
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


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from curriculum_learning_for_vln_tpu.agents import EnvDropAgent
    from curriculum_learning_for_vln_tpu.agents import common as AC
    from curriculum_learning_for_vln_tpu.agents.common import FEEDBACK_SAMPLE, FEEDBACK_TEACHER
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.engine.loop import clip_submodule_grads, make_optimizer
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.ops import fused_obs, rnn
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults
    from curriculum_learning_for_vln_tpu.utils.tokenizer import Tokenizer, build_vocab
    from curriculum_learning_for_vln_tpu.world import compiler, synthetic

    graphs = synthetic.make_world_graphs(12, 64, seed=0)
    world = compiler.compile_world(graphs, max_candidates=16)
    compiler.attach_synthetic_features(world, feature_dim=FEAT_DIM)
    items = synthetic.make_r2r_dataset(graphs, num_paths=512, seed=1, min_hops=4, max_hops=7)
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

    def make_iter(train_ml: bool, train_rl: bool, il_len):
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
                    rl, _, _ = agent.rollout(pp, {}, tables, ep, jax.random.fold_in(rng, 1),
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

    def measure(name, train_ml, train_rl, il_len, n1=2, n2=8):
        it = make_iter(train_ml, train_rl, il_len)

        def make_many(n):
            @jax.jit
            def many(params_, opt_state_, rng):
                (_, _), losses = jax.lax.scan(it, (params_, opt_state_),
                                              jax.random.split(rng, n))
                return losses[-1]
            return many

        t0 = time.time()
        t_small = timed(make_many(n1), params, opt_state, jax.random.PRNGKey(2))
        t_big = timed(make_many(n2), params, opt_state, jax.random.PRNGKey(2))
        per = max((t_big - t_small) / (n2 - n1), 1e-9)
        log(f"{name:30s}: {per*1000:8.2f} ms/iter   (compile+warm {time.time()-t0:.0f}s)")
        return per

    results = {}
    for exit_on in (False, True):
        AC.set_early_exit(exit_on)
        tag = "exit" if exit_on else "base"
        results[f"rl-only T35 {tag}"] = measure(f"rl-only T35 {tag}", False, True, None)
        results[f"full IL8+RL35 {tag}"] = measure(f"full IL8+RL35 {tag}", True, True, IL_LEN)
    AC.set_early_exit(False)
    for k, v in results.items():
        print(f"{k}: {v*1000:.2f} ms")


if __name__ == "__main__":
    main()
