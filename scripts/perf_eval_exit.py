"""No-grad (eval/inference) cost of TPU.SCAN_EARLY_EXIT on the real chip.

Follow-up to scripts/perf_early_exit.py, which measured the TRAINING
early-exit arm at 61.6 vs 7.3 ms/iter (8.4x REGRESSION): wrapping every
scan step in `lax.cond` forces XLA to materialize the branch
computation's operands each step (defeating the loop-invariant VMEM
residency of the ~17 MB bf16 weights across the scan) and its transpose
does the same to the backward accumulators.  This script asks whether the
*forward-only* conditional is cheap enough that eval — where the
reference's `if ended.all(): break` (follower.py:168) also applies and
there is no transpose — should enable it.

Two policy regimes, both no-grad at T=35, B=64:
* argmax/untrained — episodes essentially never all-end: measures the
  pure per-step cond overhead (worst case, no skip benefit);
* teacher — every episode STOPs at its goal by step ~7 of 35: ~80% of
  the scan is all-dead, the best case for the skip.

Timing: relay-RTT-cancelled two-scan-length differencing over
data-chained rollouts (perf_common caveats).  Run ALONE.

Usage: python scripts/perf_eval_exit.py
"""
from __future__ import annotations

import time

from perf_common import build_setup, log, timed


def main():
    import jax
    import jax.numpy as jnp

    from curriculum_learning_for_vln_tpu.agents import common as AC
    from curriculum_learning_for_vln_tpu.agents.common import (
        FEEDBACK_ARGMAX, FEEDBACK_TEACHER)
    from curriculum_learning_for_vln_tpu.engine.loop import parallel_warmup

    agent, tables, henv, ep, params, *_ = build_setup()

    def make_many(n, fb):
        @jax.jit
        def many(p, rng):
            def one(carry, r):
                # data-chain successive rollouts THROUGH THE PARAMS: a
                # no-grad argmax/teacher rollout consumes neither the rng
                # nor the carry, so chaining via fold_in(r, carry) leaves
                # the rollout loop-invariant and XLA hoists it clean out
                # of the measuring scan (the first version of this script
                # measured 0.00 ms).  Adding carry*1e-30 to every float
                # leaf is numerically invisible but forces each
                # iteration to wait for the previous one's result.
                eps = carry * jnp.float32(1e-30)
                p2 = jax.tree_util.tree_map(
                    lambda w: w + eps.astype(w.dtype)
                    if jnp.issubdtype(w.dtype, jnp.floating) else w, p)
                _, res, _ = agent.rollout(p2, {}, tables, ep, r,
                                          feedback=fb, train=False)
                # sum log_prob as well as reward: under TEACHER feedback
                # the actions (and hence rewards) never read the model's
                # logits, so a reward-only output lets XLA dead-code the
                # entire encoder/decoder (measured 0.08 ms, 20x too fast)
                out = jnp.sum(res.steps.reward) + jnp.sum(
                    res.steps.log_prob.astype(jnp.float32))
                return carry + out.astype(jnp.float32), None

            out, _ = jax.lax.scan(one, jnp.float32(0.0),
                                  jax.random.split(rng, n))
            return out

        return many

    N1, N2 = 2, 8
    arms = [("argmax", FEEDBACK_ARGMAX, False), ("argmax", FEEDBACK_ARGMAX, True),
            ("teacher", FEEDBACK_TEACHER, False), ("teacher", FEEDBACK_TEACHER, True)]
    programs = {}
    for nm, fb, exit_on in arms:
        AC.set_early_exit(exit_on)
        for n in (N1, N2):
            programs[(nm, exit_on, n)] = make_many(n, fb).lower(
                params, jax.random.PRNGKey(3)).compile()
    AC.set_early_exit(False)

    t0 = time.time()
    _, errs = parallel_warmup([
        lambda c=c: c(params, jax.random.PRNGKey(3)) for c in programs.values()])
    log(f"warmup: {len(programs)} programs in {time.time()-t0:.0f}s "
        f"({len(errs)} failures)")

    for nm, fb, exit_on in arms:
        t1 = timed(programs[(nm, exit_on, N1)], params, jax.random.PRNGKey(3))
        t2 = timed(programs[(nm, exit_on, N2)], params, jax.random.PRNGKey(3))
        per = max((t2 - t1) / (N2 - N1), 1e-9)
        tag = "exit" if exit_on else "base"
        print(f"eval rollout T35 [{nm:7s} {tag}]: {per*1000:7.2f} ms")


if __name__ == "__main__":
    main()
