"""Measure TPU.SCAN_EARLY_EXIT and TPU.PACKED_RL on real TPU.

All-ended rollout steps are skipped via a per-step lax.cond (the
reference breaks its Python loop there, follower.py:168 — a fixed-length
scan burns full model steps on all-dead batches instead).  Two policy
regimes matter:

* untrained (this harness, B=64 T=35): sampling stops geometrically, so
  batches still fully end around step ~20 — the tail is skippable;
* converged (probe on the 100-epoch checkpoint): all episodes end by
  step 7-9 of 15 -> ~47% of the scan is dead at T=15, ~70% at T=35.

Measures rl-only T35 and full IL8+RL35 exit-off vs exit-on, plus the
packed-RL iteration (pool=3xB continuous batching, agents/packed.py)
with episodes-per-dispatch accounting.  Harness/caveats in
scripts/perf_common.py.  Run ALONE: python scripts/perf_early_exit.py
"""
from __future__ import annotations

from perf_common import (BATCH, IL_LEN, build_setup, log, make_train_iter,
                         measure_iter)


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
            return il.ml_loss + rl.rl_loss, rl.episodes_done

        (loss, done), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        grads = clip_submodule_grads(grads, ("encoder", "decoder"), 40.0)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    return train_iter


def main():
    import jax

    from curriculum_learning_for_vln_tpu.agents import common as AC
    from curriculum_learning_for_vln_tpu.engine.loop import concat_batches

    agent, tables, henv, ep, params, opt, opt_state = build_setup()

    results = {}
    for exit_on in (False, True):
        AC.set_early_exit(exit_on)
        tag = "exit" if exit_on else "base"
        it = make_train_iter(agent, tables, ep, opt, False, True, None)
        results[f"rl-only T35 {tag}"] = measure_iter(
            f"rl-only T35 {tag}", it, params, opt_state)
        it = make_train_iter(agent, tables, ep, opt, True, True, IL_LEN)
        results[f"full IL8+RL35 {tag}"] = measure_iter(
            f"full IL8+RL35 {tag}", it, params, opt_state)
    AC.set_early_exit(False)

    # packed RL: same IL arm, RL over a 3xB pool with continuous refill
    pool = concat_batches([ep, henv.next_batch(), henv.next_batch()])
    it = make_packed_iter(agent, tables, pool, ep, opt)
    results["full IL8+packedRL3 T35"] = measure_iter(
        "full IL8+packedRL3 T35", it, params, opt_state)

    # episode accounting for the packed arm (one un-timed dispatch)
    rl, _ = jax.jit(lambda p, r: agent.rollout_packed(
        p, {}, tables, pool, r, batch_size=BATCH))(params, jax.random.PRNGKey(5))
    log(f"packed episodes started/done per dispatch: "
        f"{int(rl.episodes_started)}/{int(rl.episodes_done)} of {3*BATCH} "
        f"(unpacked completes <= {BATCH})")
    for k, v in results.items():
        print(f"{k}: {v*1000:.2f} ms")


if __name__ == "__main__":
    main()
