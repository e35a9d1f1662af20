"""Measure rollout-scan unroll factors on real TPU (TPU.SCAN_UNROLL).

The train iteration is op-count-bound (~17k device ops of ~0.6 us,
BASELINE.md round 3); unrolling the episode scan lets XLA fuse across
adjacent steps and cuts while-loop trips.  Measures rl-only T35 and full
IL8+RL35 (production pallas_prng observation kernels) at unroll factors
given on the command line; harness/caveats in scripts/perf_common.py.
Measured round 3: NULL — u2 within relay noise, u4 worse (BASELINE.md).

Run from the repo root, ALONE: python scripts/perf_unroll.py [1 2 4]
"""
from __future__ import annotations

import sys

from perf_common import IL_LEN, build_setup, make_train_iter, measure_iter


def main():
    from curriculum_learning_for_vln_tpu.agents import common as AC

    factors = [int(x) for x in (sys.argv[1:] or ["1", "2", "4"])]
    agent, tables, _henv, ep, params, opt, opt_state = build_setup()

    results = {}
    for u in factors:
        AC.set_scan_unroll(u)
        it = make_train_iter(agent, tables, ep, opt, False, True, None)
        results[f"rl-only T35 u{u}"] = measure_iter(
            f"rl-only T35 u{u}", it, params, opt_state)
    for u in factors:
        AC.set_scan_unroll(u)
        it = make_train_iter(agent, tables, ep, opt, True, True, IL_LEN)
        results[f"full IL8+RL35 u{u}"] = measure_iter(
            f"full IL8+RL35 u{u}", it, params, opt_state)
    AC.set_scan_unroll(1)
    for k, v in results.items():
        print(f"{k}: {v*1000:.2f} ms")


if __name__ == "__main__":
    main()
