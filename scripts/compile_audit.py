"""Cold-compile audit: AOT-compile each production jitted variant against
a fresh compilation-cache dir and report per-variant compile seconds
(VERDICT r2 item 8 — which of the several jitted programs dominates the
cold start, and what the floor is).

IMPORTANT caveat, measured on the axon relay (round 3): through the
remote-TPU relay, ``.lower().compile()`` is effectively a CLIENT-side
stub (~8 s for the full train step) — the real Mosaic/XLA compile runs
SERVER-side at first execution (~153 s for the same program, measured by
timing first-execution fetch).  Two consequences: (1) the numbers this
script prints are client-side lowering costs only — pass --execute for
true end-to-end first-run costs (slow: ~150 s per big variant); (2) the
client persistent compilation cache cannot help cold starts through the
relay, so the only real cold-start lever is compiling FEWER distinct big
programs — which is why bench.py now times with one full program per
phase (trivial-dispatch RTT baseline) instead of two scan lengths:
setup went 784 s (round 2) -> ~380 s.

Run on the real chip:  python scripts/compile_audit.py [--cache /tmp/cc]
Pass --warm to reuse the repo's .jax_cache instead (warm-start check).
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--execute", action="store_true",
                    help="run each variant once and include the (server-side) "
                         "first-execution compile in the timing")
    ap.add_argument("--overlap", action="store_true",
                    help="client-compile all variants sequentially, then fire "
                         "every first execution from concurrent host threads — "
                         "measures whether the relay's server-side compiles "
                         "overlap (NEXT.md item 3)")
    ap.add_argument("--enqueue", action="store_true",
                    help="like --overlap but dispatch every first execution "
                         "sequentially from ONE thread (async dispatch, no "
                         "fetch) before fetching any — if server compiles "
                         "still overlap, warmup can run in deterministic "
                         "order and is multihost-safe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.warm:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    else:
        cache = args.cache or tempfile.mkdtemp(prefix="cc_audit_")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"cache dir: {cache} ({'warm' if args.warm else 'fresh'})",
          file=sys.stderr)

    from curriculum_learning_for_vln_tpu.agents import EnvDropAgent
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.engine.loop import (
        build_eval_rollout, build_scanned_train_step, build_train_step,
        make_optimizer, stack_batches)
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults
    from curriculum_learning_for_vln_tpu.utils.tokenizer import (Tokenizer,
                                                                 build_vocab)
    from curriculum_learning_for_vln_tpu.world import compiler, synthetic

    graphs = synthetic.make_world_graphs(12, 64, seed=0)
    world = compiler.compile_world(graphs, max_candidates=16)
    compiler.attach_synthetic_features(world, feature_dim=2048)
    items = synthetic.make_r2r_dataset(graphs, num_paths=256, seed=1,
                                       min_hops=4, max_hops=7)
    tok = Tokenizer(build_vocab(items, min_count=1), encoding_length=80)
    data = expand_r2r_items(items, tok)
    henv = R2RBatchEnv(world, data, batch_size=64, tokenizer=tok, seed=0)

    platform = jax.devices()[0].platform
    if platform == "tpu":
        from curriculum_learning_for_vln_tpu.ops import fused_obs, rnn
        rnn.set_backend("pallas")
        fused_obs.set_backend("pallas_prng")
    tables = world.device_tables("bf16" if platform != "cpu" else "f32")

    cfg = get_cfg_defaults()
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE, m.ACT_EMB_SIZE, m.HIDDEN_SIZE = 256, 64, 512
    agent = EnvDropAgent(m, max_enc_len=80, vocab_size=tok.vocab_size(),
                         feat_dim=2048, episode_len=35)
    if platform != "cpu":
        agent.compute_dtype = jnp.bfloat16
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("rms", 1e-4)
    opt_state = opt.init(params)
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(1)
    w = jnp.ones((64,), jnp.float32)

    total = 0.0
    pending = []  # (name, compiled, args) for --overlap phase 2

    def audit(name, jit_fn, *a, **kw):
        nonlocal total
        t0 = time.time()
        compiled = jit_fn.lower(*a, **kw).compile()
        if args.overlap or args.enqueue:
            pending.append((name, compiled, a))
        elif args.execute:
            out = compiled(*a)  # static argnames are baked into the lowering
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
            # force completion through the relay with a real fetch
            _ = jax.device_get(jax.tree_util.tree_leaves(out)[-1])
        dt = time.time() - t0
        total += dt
        print(f"{dt:8.1f} s  {name}", flush=True)

    eval_roll = build_eval_rollout(agent)
    audit("eval_rollout", eval_roll, tables, params, mstate, ep, rng)

    step = build_train_step(agent, opt, "sample")
    for il in (8, 16, None):
        audit(f"train_step il_len={il}", step, tables, params, opt_state,
              mstate, ep, rng, il_len=il)

    wstep = build_train_step(agent, opt, "sample", weighted=True)
    audit("train_step weighted il=8", wstep, tables, params, opt_state,
          mstate, ep, rng, w, il_len=8)

    K = 4
    eps = stack_batches([henv.next_batch() for _ in range(K)])
    rngs = jax.random.split(rng, K)
    sstep = build_scanned_train_step(agent, opt, "sample")
    audit(f"scanned_train_step K={K} il=8", sstep, tables, params, opt_state,
          mstate, eps, rngs, il_len=8)

    print(f"{total:8.1f} s  TOTAL", flush=True)

    if args.overlap:
        import threading

        times = {}

        def fire(name, compiled, a):
            # the train steps donate params/opt_state (loop.py) — give each
            # variant private copies so concurrent executions don't consume
            # each other's inputs
            a = jax.tree_util.tree_map(jnp.array, a)
            t0 = time.time()
            out = compiled(*a)
            _ = jax.device_get(jax.tree_util.tree_leaves(out)[-1])
            times[name] = time.time() - t0

        t0 = time.time()
        threads = [threading.Thread(target=fire, args=p) for p in pending]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        for name, dt in times.items():
            print(f"{dt:8.1f} s  first-exec {name}", flush=True)
        print(f"{wall:8.1f} s  OVERLAPPED first-exec wall "
              f"(sum {sum(times.values()):.1f} s)", flush=True)

    if args.enqueue:
        t0 = time.time()
        outs = []
        for name, compiled, a in pending:
            a = jax.tree_util.tree_map(jnp.array, a)  # private donated copies
            outs.append((name, compiled(*a)))
        t_disp = time.time() - t0
        for name, out in outs:
            td = time.time()
            _ = jax.device_get(jax.tree_util.tree_leaves(out)[-1])
            print(f"{time.time() - td:8.1f} s  fetch {name}", flush=True)
        wall = time.time() - t0
        print(f"{wall:8.1f} s  ENQUEUED first-exec wall "
              f"(async dispatch took {t_disp:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
