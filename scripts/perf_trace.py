"""Capture a jax.profiler device trace of the bench train iteration and
rank HLO ops by device time.

The roofline model (utils/roofline.py) says the round-2 train iteration
runs ~4.4x over its minimum-HBM floor; this script shows WHERE.  Device
op durations come from the TPU's own clocks inside the trace, so the
ranking is valid even when the host is busy (unlike the wall-clock
differencing in bench.py, which needs a quiet host).

Run on the real chip:   python scripts/perf_trace.py [--out /tmp/vln_trace]
Add --eval to trace the pure eval rollout (the bench.py headline program)
instead of the train iteration.
Then inspect the printed top-k table (also saved to <out>/summary.txt).
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args):
    import jax
    import jax.numpy as jnp
    import optax

    from curriculum_learning_for_vln_tpu.agents import EnvDropAgent
    from curriculum_learning_for_vln_tpu.agents.common import (FEEDBACK_ARGMAX,
                                                               FEEDBACK_SAMPLE,
                                                               FEEDBACK_TEACHER)
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.engine.loop import (
        clip_submodule_grads, make_optimizer)
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults
    from curriculum_learning_for_vln_tpu.utils.tokenizer import (Tokenizer,
                                                                 build_vocab)
    from curriculum_learning_for_vln_tpu.world import compiler, synthetic

    graphs = synthetic.make_world_graphs(12, 64, seed=0)
    world = compiler.compile_world(graphs, max_candidates=16)
    compiler.attach_synthetic_features(world, feature_dim=2048)
    items = synthetic.make_r2r_dataset(graphs, num_paths=512, seed=1,
                                       min_hops=4, max_hops=7)
    tok = Tokenizer(build_vocab(items, min_count=1), encoding_length=80)
    data = expand_r2r_items(items, tok)
    henv = R2RBatchEnv(world, data, batch_size=64, tokenizer=tok, seed=0)

    platform = jax.devices()[0].platform
    if platform == "tpu" and not args.no_pallas:
        from curriculum_learning_for_vln_tpu.ops import fused_obs, rnn

        rnn.set_backend("pallas")
        fused_obs.set_backend("pallas_prng_shared" if args.shared_masks
                              else "pallas_prng")
    tables = world.device_tables("bf16" if platform != "cpu" else "f32")

    cfg = get_cfg_defaults()
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE, m.ACT_EMB_SIZE, m.HIDDEN_SIZE = 256, 64, 512
    m.ML_WEIGHT, m.GAMMA, m.RL_NORMALIZE = 0.2, 0.9, "total"
    agent = EnvDropAgent(m, max_enc_len=80, vocab_size=tok.vocab_size(),
                         feat_dim=2048, episode_len=35)
    if platform != "cpu":
        agent.compute_dtype = jnp.bfloat16
    params, _ = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()

    if args.speaker:
        # Trace the speaker teacher-forcing train step (the 25 ms program —
        # 2.7x the EnvDrop train iteration, VERDICT r4 weak #3): collect
        # [B,T,36,F] shortest-path features + encoder + decoder + grads +
        # Adam, at the perf_selftrain.py production shapes.
        from curriculum_learning_for_vln_tpu.agents.speaker import (
            Speaker, collect_shortest_path_features)

        s = cfg.AIDE.SPEAKER
        s.RNN_DIM, s.WEMB, s.MAX_DECODE = 512, 256, 80
        cdt = jnp.bfloat16 if args.bf16 else jnp.float32
        spk = Speaker(s, tok.vocab_size(), feat_dim=2048,
                      episode_len=agent.episode_len, compute_dtype=cdt)
        spk_params, spk_opt = spk.init(jax.random.PRNGKey(0))

        def spk_iter(carry, rng):
            p, o = carry
            feats = collect_shortest_path_features(tables, ep, spk.episode_len,
                                                   spk.compute_dtype)

            def loss_fn(pp):
                return spk.teacher_forcing_loss(pp, feats, ep.instr_tokens,
                                                rng, train=True)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = spk.optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        @jax.jit
        def many_spk(params_, opt_state_, rng):
            (_, _), losses = jax.lax.scan(spk_iter, (params_, opt_state_),
                                          jax.random.split(rng, args.iters))
            return losses[-1]

        return many_spk, spk_params, spk_opt

    if args.eval:
        # Trace the bench headline instead: the pure eval rollout (argmax
        # feedback, no grads) — same program bench.py times (bench.py
        # one_rollout / make_many_rollouts), same data-dependent chain so
        # iterations cannot be elided.
        @jax.jit
        def many_eval(params_, _unused, rng):
            def eval_iter(carry, r):
                ep2 = ep._replace(
                    start_heading=ep.start_heading + 1e-9 * carry)
                _, ro, _ = agent.rollout(params_, {}, tables, ep2, r,
                                         feedback=FEEDBACK_ARGMAX,
                                         train=False)
                return jnp.sum(ro.final_state.node).astype(jnp.float32), None

            out, _ = jax.lax.scan(eval_iter, jnp.float32(0.0),
                                  jax.random.split(rng, args.iters))
            return out

        return many_eval, params, jnp.float32(0.0)

    opt = make_optimizer("rms", 1e-4)
    opt_state = opt.init(params)

    def train_iter(carry, rng):
        p, o = carry

        def loss_fn(pp):
            il, _, _ = agent.rollout(pp, {}, tables, ep, rng,
                                     feedback=FEEDBACK_TEACHER, train=True,
                                     train_ml=True, train_rl=False,
                                     episode_len=8)
            rl, _, _ = agent.rollout(pp, {}, tables, ep,
                                     jax.random.fold_in(rng, 1),
                                     feedback=FEEDBACK_SAMPLE, train=True,
                                     train_ml=False, train_rl=True)
            return il.ml_loss + rl.rl_loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = clip_submodule_grads(grads, ("encoder", "decoder"), 40.0)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    @jax.jit
    def many(params_, opt_state_, rng):
        (_, _), losses = jax.lax.scan(train_iter, (params_, opt_state_),
                                      jax.random.split(rng, args.iters))
        return losses[-1]

    return many, params, opt_state


def summarize_trace(trace_dir: str, top: int = 40) -> str:
    """Aggregate device-op durations from the chrome trace(s)."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        return "no trace files found under " + trace_dir
    by_op = defaultdict(float)
    total = 0.0
    for f in files[-1:]:
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        pid_names, tid_names = {}, {}
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    pid_names[ev["pid"]] = ev["args"].get("name", "")
                elif ev.get("name") == "thread_name":
                    tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if "TPU" not in pname:
                continue
            # leaf device ops only — "XLA Modules"/"Steps" rows are
            # containers that would double-count everything
            if tid_names.get((ev.get("pid"), ev.get("tid")), "") != "XLA Ops":
                continue
            dur = float(ev.get("dur", 0.0))
            name = ev.get("name", "?")
            # collapse numbered HLO instances: fusion.123 -> fusion
            base = name.split(".")[0]
            args_ = ev.get("args") or {}
            longname = args_.get("long_name", "") or args_.get("tf_op", "")
            key = base
            if base in ("fusion", "loop_fusion", "copy", "custom-call",
                        "dynamic-update-slice", "dynamic-slice"):
                key = f"{base}|{name}"
                if longname:
                    key += "|" + longname[:90]
            by_op[key] += dur
            total += dur
    lines = [f"total device op time: {total/1e3:.2f} ms (all iterations)"]
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        lines.append(f"{v/1e3:9.3f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vln_trace")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--bf16", action="store_true",
                    help="with --speaker: trace the bf16 compute path "
                         "(cfg.TPU.PRECISION contract) instead of f32")
    ap.add_argument("--speaker", action="store_true",
                    help="trace the speaker teacher-forcing train step "
                         "(pretrain_speaker's hot program) instead of the "
                         "EnvDrop train iteration")
    ap.add_argument("--eval", action="store_true",
                    help="trace the pure eval rollout (bench.py's headline "
                         "program: argmax feedback, no grads) instead of "
                         "the train iteration")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--shared-masks", action="store_true",
                    help="use the pallas_prng_shared group-mask mode")
    ap.add_argument("--summarize-only", default="",
                    help="skip capture; summarize this existing trace dir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if args.summarize_only:
        print(summarize_trace(args.summarize_only, args.top))
        return

    import jax

    # No persistent compile cache: relay compiles are server-side at first
    # execution (client cache can't shorten them) and the round-3 suite
    # segfault was in the cache read path (CLAUDE.md).

    many, params, opt_state = build(args)
    t0 = time.time()
    float(many(params, opt_state, jax.random.PRNGKey(0)))  # compile+warm
    print(f"compile+warm {time.time()-t0:.1f}s", file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        float(many(params, opt_state, jax.random.PRNGKey(1)))
    print("trace captured", file=sys.stderr)
    time.sleep(2)
    summary = summarize_trace(args.out, args.top)
    with open(os.path.join(args.out, "summary.txt"), "w") as f:
        f.write(summary)
    print(summary)


if __name__ == "__main__":
    main()
