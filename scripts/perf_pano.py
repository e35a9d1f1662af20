"""TPU microbench: fused pano gather+dropout+attention kernel vs XLA chain.

35-step serialized scans at production shapes (B=64, D=2048, F=2176),
relay-safe inner-scan differencing.  Run: python scripts/perf_pano.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, D, A, V, N_NODES, H = 64, 35, 2048, 128, 36, 768, 512
F = D + A


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from curriculum_learning_for_vln_tpu.models.core import make_keep_mask
    from curriculum_learning_for_vln_tpu.ops.pallas.pano_fused import (
        pano_attend_bwd_pallas, pano_attend_fwd_pallas)

    platform = jax.devices()[0].platform
    log(f"platform: {platform}")
    interp = platform != "tpu"

    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    feats = jax.random.normal(ks[0], (N_NODES, V, D), jnp.float32).astype(jnp.bfloat16)
    feats_pad = jnp.pad(feats, ((0, 0), (0, 8 - V % 8), (0, 0)))  # view-padded table
    loc = jax.random.normal(ks[1], (V, V, A), jnp.float32).astype(jnp.bfloat16)
    nodes = jax.random.randint(ks[2], (T, B), 0, N_NODES)
    cand_view = jax.random.randint(ks[7], (B, 16), 0, V)
    views = jax.random.randint(ks[3], (T, B), 0, V)
    W = jax.random.normal(ks[4], (H, F), jnp.float32).astype(jnp.bfloat16) * 0.02
    keep = 0.7

    def xla_step(q, xs):
        node_t, view_t, key = xs
        f = feats[node_t]
        m = make_keep_mask(key, (B, V, D), 1 - keep)
        img = jnp.where(m, f / keep, 0.0).astype(f.dtype)
        pano = jnp.concatenate([img, loc[view_t]], axis=-1).astype(jnp.float32)
        tv = q @ W
        s = jnp.einsum("bvd,bd->bv", pano, tv)
        a = jax.nn.softmax(s, axis=-1)
        vis = jnp.einsum("bv,bvd->bd", a, pano)
        # the candidate extraction the fused kernel also replaces
        cand = jnp.take_along_axis(f, jnp.broadcast_to(cand_view[:, :, None], (B, 16, 1)), axis=1)
        return jnp.tanh(vis[:, :H] + jnp.sum(cand.astype(jnp.float32), axis=(1, 2))[:, None] * 0), vis

    def pallas_step(q, xs):
        node_t, view_t, key = xs
        m = make_keep_mask(key, (B, V, D), 1 - keep)
        tv = q @ W
        oi, oa, alpha, cand = pano_attend_fwd_pallas(
            node_t, view_t, cand_view, feats_pad, loc, tv[:, :D], tv[:, D:],
            mask=m, keep=keep, interpret=interp)
        vis = jnp.concatenate([oi, oa], -1)
        return jnp.tanh(vis[:, :H] + jnp.sum(cand.astype(jnp.float32), axis=(1, 2), keepdims=False)[:, None] * 0), (vis, alpha)

    def pallas_prng_step(q, xs):
        node_t, view_t, key = xs
        seeds = jnp.arange(B, dtype=jnp.int32) + jnp.int32(jnp.sum(q[0, :1]) * 0)
        tv = q @ W
        oi, oa, alpha, cand = pano_attend_fwd_pallas(
            node_t, view_t, cand_view, feats_pad, loc, tv[:, :D], tv[:, D:],
            seeds=seeds, keep=keep, interpret=interp)
        vis = jnp.concatenate([oi, oa], -1)
        return jnp.tanh(vis[:, :H] + jnp.sum(cand.astype(jnp.float32), axis=(1, 2))[:, None] * 0), None

    def pallas_prng_shared_step(q, xs):
        node_t, view_t, key = xs
        seeds = jnp.arange(B, dtype=jnp.int32) + jnp.int32(jnp.sum(q[0, :1]) * 0)
        tv = q @ W
        oi, oa, alpha, cand = pano_attend_fwd_pallas(
            node_t, view_t, cand_view, feats_pad, loc, tv[:, :D], tv[:, D:],
            seeds=seeds, keep=keep, interpret=interp, shared_prng=True)
        vis = jnp.concatenate([oi, oa], -1)
        return jnp.tanh(vis[:, :H] + jnp.sum(cand.astype(jnp.float32), axis=(1, 2))[:, None] * 0), None

    def pallas_nomask_step(q, xs):
        node_t, view_t, key = xs
        tv = q @ W
        oi, oa, alpha, cand = pano_attend_fwd_pallas(
            node_t, view_t, cand_view, feats_pad, loc, tv[:, :D], tv[:, D:],
            keep=1.0, interpret=interp)
        vis = jnp.concatenate([oi, oa], -1)
        return jnp.tanh(vis[:, :H] + jnp.sum(cand.astype(jnp.float32), axis=(1, 2))[:, None] * 0), None

    def pallas_bwd_step(q, xs):
        node_t, view_t, key = xs
        m = make_keep_mask(key, (B, V, D), 1 - keep)
        alpha = jax.nn.softmax(q @ jax.random.normal(ks[5], (H, V), jnp.float32), -1)
        dvis = jnp.tile(q, (1, (F + H - 1) // H))[:, :F]  # arbitrary [B, F] cotangent
        di, da, cand = pano_attend_bwd_pallas(node_t, view_t, cand_view, feats_pad, loc,
                                        alpha, dvis[:, :D], dvis[:, D:], mask=m,
                                        keep=keep, interpret=interp)
        return jnp.tanh(di[:, :H] + jnp.sum(da, axis=1, keepdims=True)), None

    def make_many(step, n):
        keys = jax.random.split(jax.random.PRNGKey(1), T)

        def one(q, _):
            q, _ys = jax.lax.scan(step, q, (nodes, views, keys))
            return q, jnp.sum(q)

        @jax.jit
        def many(q0):
            _, s = jax.lax.scan(one, q0, None, length=n)
            return s[-1]
        return many

    def timed(fn, *args, reps=3):
        for attempt in range(3):
            try:
                float(fn(*args))
                break
            except Exception as e:
                if attempt == 2:
                    raise
                log(f"retry after {type(e).__name__}: {e}")
                time.sleep(5)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(fn(*args))
            best = min(best, time.time() - t0)
        return best

    q0 = jax.random.normal(ks[6], (B, H), jnp.float32)
    for name, step in [("xla chain", xla_step),
                       ("pallas fwd ext", pallas_step),
                       ("pallas fwd prng", pallas_prng_step),
                       ("pallas fwd prng shared", pallas_prng_shared_step),
                       ("pallas fwd nomask", pallas_nomask_step),
                       ("pallas bwd ext", pallas_bwd_step)]:
        t0 = time.time()
        t1 = timed(make_many(step, 2), q0)
        t2 = timed(make_many(step, 10), q0)
        per = (t2 - t1) / 8
        print(f"{name:12s}: {per*1000:8.3f} ms per 35-step rollout "
              f"({per/T*1e6:6.1f} us/step)  [compile {time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
