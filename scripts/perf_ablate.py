"""Segment-level ablation probe for the EnvDrop RL training iteration.

Isolates the three compute segments of the per-step decoder chain at
exact production shapes/dtypes (B=64, T=35, D=2048, F=2176, H=512,
L=80, MC+1=17, bf16 compute copies over f32 masters):

  * pano   — feature-table gather -> env dropout -> visual soft-dot
  * lstm   — the 2240->2048-gate LSTM cell recurrence
  * text   — h dropout -> text soft-dot -> candidate scorer

Each segment runs as a T-step `lax.scan` chained through a recurrent
carry (so steps serialize like the real rollout), inside an N-iteration
outer scan with grads + SGD-ish update, timed by inner-scan differencing
(relay-safe; see bench.py).  fwd = loss only, f+b = value_and_grad.

The point: locate where the backward's 3x-over-forward cost lives —
scan-residual traffic for the pano tensor vs per-step dW accumulation —
before writing the fused/custom-VJP path.

Run from the repo root: python scripts/perf_ablate.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 64
T = 35
D = 2048           # image feature dim
A = 128            # angle feature dim
F = D + A          # 2176
H = 512
L = 80             # encoded instruction length
K = 17             # MC + STOP slot
N_NODES = 768      # 12 scans x 64 nodes (perf_probe world size)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from curriculum_learning_for_vln_tpu.models.attention import soft_dot, soft_dot_init
    from curriculum_learning_for_vln_tpu.models.core import (dense, dense_init, dropout,
                                                             lstm_cell, lstm_cell_init)

    platform = jax.devices()[0].platform
    log(f"platform: {platform} ({jax.devices()[0]})")
    cdt = jnp.bfloat16 if platform != "cpu" else jnp.float32

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)

    # world-like tables (bf16 in HBM like production device_tables)
    features = jax.random.normal(ks[0], (N_NODES, 36, D), jnp.float32).astype(cdt)
    loc_embed = jax.random.normal(ks[1], (36, 36, A), jnp.float32).astype(cdt)
    nodes = jax.random.randint(ks[2], (T, B), 0, N_NODES)
    views = jax.random.randint(ks[3], (T, B), 0, 36)

    ctx = jax.random.normal(ks[4], (B, L, H), jnp.float32)
    cand = jax.random.normal(ks[5], (B, K, F), jnp.float32)
    x_extra = jax.random.normal(ks[6], (T, B, F + 64 - H), jnp.float32)  # LSTM input filler

    params = {
        "vis": soft_dot_init(ks[7], H, context_only=True, context_dim=F),
        "back": dense_init(ks[8], F, H),          # keeps the pano segment recurrent
        "lstm": lstm_cell_init(ks[9], 64 + F, H),
        "text": soft_dot_init(ks[10], H),
        "cand": dense_init(ks[11], H, F, bias=False),
    }

    def cast(p):
        return jax.tree_util.tree_map(lambda x: x.astype(cdt), p)

    # ---------------- segments ----------------
    def pano_steps(p, rng, feat_drop):
        pc = cast(p)
        ctx_c = ctx.astype(cdt)

        def step(carry, xs):
            q, r = carry
            node_t, view_t = xs
            r, r1, r2 = jax.random.split(r, 3)
            feats = features[node_t]                       # [B, 36, D]
            le = loc_embed[view_t]                         # [B, 36, A]
            pano = jnp.concatenate([feats, le], axis=-1)   # [B, 36, F]
            if feat_drop:
                img = dropout(r1, pano[..., :D], 0.3, deterministic=False)
                pano = jnp.concatenate([img, pano[..., D:]], axis=-1)
            qd = dropout(r2, q, 0.5, deterministic=False)
            weighted, _ = soft_dot(pc["vis"], qd, pano)
            q = jnp.tanh(dense(pc["back"], weighted)).astype(jnp.float32)
            return (q, r), ()

        (q, _), _ = jax.lax.scan(step, (jnp.zeros((B, H)), rng), (nodes, views))
        return jnp.sum(q.astype(jnp.float32))

    def lstm_steps(p, rng, unused):
        pc = cast(p)
        xe = x_extra.astype(cdt)

        def step(carry, x_t):
            h, c = carry
            x = jnp.concatenate([h.astype(cdt), x_t], axis=-1)  # [B, 64+F]
            h, c = lstm_cell(pc["lstm"], x, h, c)
            return (h, c), ()

        (h, _), _ = jax.lax.scan(step, (jnp.zeros((B, H)), jnp.zeros((B, H))), xe)
        return jnp.sum(h.astype(jnp.float32))

    def text_steps(p, rng, unused):
        pc = cast(p)
        ctx_c = ctx.astype(cdt)
        cand_c = cand.astype(cdt)

        def step(carry, _):
            h1, r = carry
            r, r1, r2 = jax.random.split(r, 3)
            h1d = dropout(r1, h1, 0.5, deterministic=False)
            h_tilde, _ = soft_dot(pc["text"], h1d.astype(cdt), ctx_c)
            htd = dropout(r2, h_tilde, 0.5, deterministic=False)
            logits = jnp.einsum("bkf,bf->bk", cand_c, dense(pc["cand"], htd))
            h1 = jnp.tanh(h_tilde.astype(jnp.float32) + 0.001 * jnp.sum(logits.astype(jnp.float32), -1, keepdims=True))
            return (h1, r), ()

        (h1, _), _ = jax.lax.scan(step, (jnp.zeros((B, H)), rng), None, length=T)
        return jnp.sum(h1)

    # ---------------- harness ----------------
    def timed(fn, *args, reps=3):
        for attempt in range(3):
            try:
                float(fn(*args))
                break
            except Exception as e:  # relay hiccups
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

    def measure(name, seg_fn, grad, feat_drop=False, n1=2, n2=10):
        def one_iter(carry, rng):
            p = carry
            if grad:
                loss, g = jax.value_and_grad(lambda pp: seg_fn(pp, rng, feat_drop))(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)
            else:
                loss = seg_fn(p, rng, feat_drop)
            return p, loss

        def make_many(n):
            @jax.jit
            def many(p, rng):
                _, losses = jax.lax.scan(one_iter, p, jax.random.split(rng, n))
                return losses[-1]
            return many

        t0 = time.time()
        t_small = timed(make_many(n1), params, jax.random.PRNGKey(2))
        t_big = timed(make_many(n2), params, jax.random.PRNGKey(2))
        per = max((t_big - t_small) / (n2 - n1), 1e-9)
        log(f"{name:26s}: {per * 1000:8.2f} ms/iter   (compile+warm {time.time() - t0:.0f}s)")
        return per

    results = {}
    for name, fn, grad, fd in [
        ("pano fwd", pano_steps, False, True),
        ("pano f+b", pano_steps, True, True),
        ("pano f+b nodrop", pano_steps, True, False),
        ("lstm fwd", lstm_steps, False, False),
        ("lstm f+b", lstm_steps, True, False),
        ("text fwd", text_steps, False, False),
        ("text f+b", text_steps, True, False),
    ]:
        results[name] = measure(name, fn, grad, fd)

    for k, v in results.items():
        print(f"{k}: {v * 1000:.2f} ms")


if __name__ == "__main__":
    main()
