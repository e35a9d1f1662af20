"""TPU microbench: encoder (packed BiLSTM) forward and forward+backward,
XLA scan vs the Pallas kernels (fwd lstm_scan_pallas; bwd
lstm_scan_bwd_pallas — VERDICT r2 item 4).

Production shapes: B=64, L=80, emb 256, hidden 512, bidirectional.
Relay-safe timing: N data-chained iterations inside one jitted scan,
differencing two scan lengths (see bench.py docstring).  Run ALONE —
concurrent CPU-heavy jobs corrupt the differencing.

Run: python scripts/perf_encoder.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, L, EMB, H, VOCAB = 64, 80, 256, 512, 1200


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    from curriculum_learning_for_vln_tpu.models.encoder import (encoder_apply,
                                                                encoder_init)
    from curriculum_learning_for_vln_tpu.ops import rnn as rnn_ops

    log(f"platform: {jax.devices()[0].platform}")
    rng = np.random.RandomState(0)
    p = encoder_init(jax.random.PRNGKey(0), vocab_size=VOCAB, embed_size=EMB,
                     hidden_size=H, padding_idx=0, bidirectional=True,
                     num_layers=1)
    p = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16)
                               if x.ndim >= 2 else x, p)
    tokens = jnp.asarray(rng.randint(4, VOCAB, size=(B, L)).astype(np.int32))
    lengths = jnp.asarray(rng.randint(L // 2, L + 1, size=B).astype(np.int32))

    def fwd_only(p, r):
        ctx, h0, c0 = encoder_apply(p, tokens, lengths, r, train=True,
                                    drop_rate=0.5)
        return jnp.sum(ctx.astype(jnp.float32)) + jnp.sum(h0) + jnp.sum(c0)

    def fwd_bwd(p, r):
        def loss(p):
            ctx, h0, c0 = encoder_apply(p, tokens, lengths, r, train=True,
                                        drop_rate=0.5)
            return jnp.sum(ctx.astype(jnp.float32) ** 2) + jnp.sum(h0 * c0)

        l, g = jax.value_and_grad(loss)(p)
        return l + sum(jnp.sum(x.astype(jnp.float32)) for x in
                       jax.tree_util.tree_leaves(g))

    def make_many(seg, n):
        @jax.jit
        def many(p, r):
            def body(carry, rr):
                rr = jax.random.fold_in(rr, jnp.int32(carry % 1024))
                return carry + seg(p, rr), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jax.random.split(r, n))
            return out
        return many

    results = {}
    for backend in ("xla", "pallas"):
        rnn_ops.set_backend(backend)
        for name, seg in (("fwd", fwd_only), ("fwd+bwd", fwd_bwd)):
            n1, n2 = 3, 12
            t1 = timed(make_many(seg, n1), p, jax.random.PRNGKey(1))
            t2 = timed(make_many(seg, n2), p, jax.random.PRNGKey(1))
            ms = (t2 - t1) / (n2 - n1) * 1e3
            results[(backend, name)] = ms
            log(f"{backend:7s} {name:8s}: {ms:7.3f} ms")
    rnn_ops.set_backend("xla")

    for name in ("fwd", "fwd+bwd"):
        x, pl_ = results[("xla", name)], results[("pallas", name)]
        log(f"speedup {name}: {x / pl_:.2f}x (xla {x:.2f} -> pallas {pl_:.2f} ms)")


if __name__ == "__main__":
    main()
