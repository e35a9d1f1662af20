"""TPU check: rbg-backed keep-masks are deterministic per key.

The fused observation op (ops/fused_obs.py) regenerates its dropout mask
from the same PRNG key in forward and backward instead of storing it.
On TPU, large masks ride the rbg (hardware RNG) path
(models/core.make_keep_mask) — this asserts two generations from the
same key inside one program (and across programs) are bit-identical, so
recompute-from-key is sound.  Run: python scripts/check_rbg.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from curriculum_learning_for_vln_tpu.models.core import make_keep_mask

SHAPE = (64, 36, 2048)  # >= fast-path threshold -> rbg on TPU


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    key = jax.random.PRNGKey(42)

    @jax.jit
    def twice(k):
        # two generations from the same key inside one program — whether
        # XLA CSEs them into one RngBitGenerator or keeps two, the fused
        # op's forward/backward see identical bits iff this is zero
        m1 = make_keep_mask(k, SHAPE, 0.3)
        m2 = make_keep_mask(k, SHAPE, 0.3)
        return jnp.sum(m1 != m2), jnp.sum(m1)

    diff, total = twice(key)
    assert int(diff) == 0, f"in-program mismatch: {int(diff)} bits"

    @jax.jit
    def once(k):
        m = make_keep_mask(k, SHAPE, 0.3)
        return jnp.packbits(m.reshape(-1))

    a = np.asarray(once(key))
    b = np.asarray(once(key))
    assert np.array_equal(a, b), "cross-program mismatch"
    print(f"rbg keep-mask deterministic (kept {int(total)}/{np.prod(SHAPE)})")


if __name__ == "__main__":
    main()
