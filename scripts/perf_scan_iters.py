"""Measure TPU.SCAN_ITERS (K training iterations fused into one dispatch)
on the real chip — VERDICT r3 item 5.

What SCAN_ITERS can and cannot buy: the per-iteration DEVICE time is
unchanged (round-3's unroll study showed XLA does not fuse across rollout
steps, and the iteration is throughput-bound, BASELINE.md), so the win is
host/dispatch amortization — fewer dispatches per epoch, less Python
between them.  The relay-cancelled inner-scan differencing used by
bench.py can NOT see that win (it already fuses iterations by
construction), so this script measures the honest production quantity:
wall-clock of M pipelined iterations, params/opt chained call-to-call,
one scalar fetch at the end (CLAUDE.md: wall-clock training loops are
honest through the relay because dispatches pipeline).

Arms: K in {1,2,4,8} on the full IL8+RL35 step, plus K in {1,4} with
TPU.SCAN_EARLY_EXIT and with the packed-RL iteration, so the default
decision sees the interactions.  Run ALONE (perf_common.py caveats).

Usage: python scripts/perf_scan_iters.py [--iters 64]
"""
from __future__ import annotations

import argparse
import time

from perf_common import (BATCH, IL_LEN, build_setup, log, make_train_iter,
                         timed)


def make_stepper(train_iter, K: int):
    """One dispatch = K data-chained iterations (K=1: plain step)."""
    import jax

    @jax.jit
    def stepK(params, opt_state, rng):
        (p, o), losses = jax.lax.scan(train_iter, (params, opt_state),
                                      jax.random.split(rng, K))
        return p, o, losses[-1]

    return stepK


def run_epoch(stepK, K: int, iters: int, params, opt_state):
    """Pipelined mini-epoch: iters/K dispatches, fetch once at the end."""
    import jax

    p, o = params, opt_state
    t0 = time.time()
    loss = None
    for i in range(iters // K):
        p, o, loss = stepK(p, o, jax.random.PRNGKey(100 + i))
    float(loss)  # force completion of the whole chain
    return time.time() - t0


def make_packed_iter(agent, tables, pool, ep, opt):
    import jax
    import optax

    from curriculum_learning_for_vln_tpu.agents.common import FEEDBACK_TEACHER
    from curriculum_learning_for_vln_tpu.engine.loop import clip_submodule_grads

    def train_iter(carry, rng):
        p, o = carry

        def loss_fn(pp):
            il, _, _ = agent.rollout(pp, {}, tables, ep, rng,
                                     feedback=FEEDBACK_TEACHER, train=True,
                                     train_ml=True, train_rl=False,
                                     episode_len=IL_LEN)
            rl, _ = agent.rollout_packed(pp, {}, tables, pool,
                                         jax.random.fold_in(rng, 1),
                                         batch_size=BATCH)
            return il.ml_loss + rl.rl_loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = clip_submodule_grads(grads, ("encoder", "decoder"), 40.0)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    return train_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64,
                    help="iterations per mini-epoch (divisible by 8)")
    args = ap.parse_args()

    import jax

    from curriculum_learning_for_vln_tpu.agents import common as AC
    from curriculum_learning_for_vln_tpu.engine.loop import (concat_batches,
                                                             parallel_warmup)

    agent, tables, henv, ep, params, opt, opt_state = build_setup()
    pool = concat_batches([ep, henv.next_batch(), henv.next_batch()])

    arms = []  # (name, exit_on, packed, K)
    for K in (1, 2, 4, 8):
        arms.append((f"base K={K}", False, False, K))
    for K in (1, 4):
        arms.append((f"exit K={K}", True, False, K))
        arms.append((f"packed3 K={K}", False, True, K))

    # trace each program EAGERLY (client-side .lower().compile() is a fast
    # stub through the relay) so the early-exit flag is captured at trace
    # time, then fire all first executions from one thread so the relay
    # overlaps the server-side compiles (engine.loop.parallel_warmup)
    steppers = {}
    thunks = []
    for name, exit_on, packed, K in arms:
        AC.set_early_exit(exit_on)
        it = (make_packed_iter(agent, tables, pool, ep, opt) if packed
              else make_train_iter(agent, tables, ep, opt, True, True, IL_LEN))
        compiled = make_stepper(it, K).lower(
            params, opt_state, jax.random.PRNGKey(1)).compile()
        steppers[name] = compiled
        thunks.append(lambda s=compiled: s(params, opt_state,
                                           jax.random.PRNGKey(1))[2])
    AC.set_early_exit(False)
    t0 = time.time()
    _, errs = parallel_warmup(thunks)
    log(f"warmup: {len(thunks)} programs in {time.time()-t0:.0f}s "
        f"({len(errs)} failures)")

    results = {}
    for name, exit_on, packed, K in arms:
        AC.set_early_exit(exit_on)  # no-op post-trace; kept for clarity
        wall = min(run_epoch(steppers[name], K, args.iters, params, opt_state)
                   for _ in range(2))
        results[name] = wall / args.iters
        log(f"{name:14s}: {wall:6.2f} s / {args.iters} iters "
            f"-> {wall/args.iters*1000:7.2f} ms/iter")
    AC.set_early_exit(False)

    for k, v in results.items():
        print(f"{k}: {v*1000:.2f} ms/iter")


if __name__ == "__main__":
    main()
