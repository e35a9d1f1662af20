"""Reference-scale ViLBERT scorer + pretrain step on the real TPU chip.

VERDICT r4 item 1: every prior ViLBERT artifact ran at 2-layer miniature
scale; this script instantiates the reference's FULL config — the
`BertConfig` defaults of `tasks/R2R-judy/src/model/vilbert.py:129-272`
(12 text layers / 768 hidden / 3072 FFN, 3 vision layers / 768, two
co-attention connection layers, bi_hidden 1024, v_feature 2048,
v_target 1601, vocab 30522) with the `vln_bert.py:24-75` scoring head —
and measures on the chip, bf16 compute / f32 master params:

  score        CLR2R difficulty scoring forward (compute_heads=False —
               the production score_paths path)
  score_heads  reference-parity forward incl. masked-LM tied decoder +
               region head (what the torch model always pays)
  pretrain     full multi-modal pretrain iteration: masked LM + masked
               regions + alignment + vil BCE losses, value_and_grad,
               adam update (engine/pretrain.py::build_pretrain_loss)

Timing is the relay-safe recipe from bench.py/CLAUDE.md: scan N
data-chained iterations inside ONE jitted call, fetch a scalar, subtract
the trivial-dispatch RTT baseline.  All programs' server-side
first-execution compiles are overlapped via engine.loop.parallel_warmup.
Run ALONE — concurrent CPU-heavy jobs corrupt the host wall between
fetches (CLAUDE.md "Serialize TPU benchmarks").

Usage: python scripts/perf_vilbert.py [--batch 64] [--lt 80] [--lv 8]
       [--scan 8] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.perf_common import log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lt", type=int, default=80, help="instruction tokens")
    ap.add_argument("--lv", type=int, default=8, help="path regions (max_path_len)")
    ap.add_argument("--scan", type=int, default=8, help="iterations per fetch")
    ap.add_argument("--pretrain-scan", type=int, default=4)
    ap.add_argument("--json", default="")
    ap.add_argument("--mini", action="store_true",
                    help="tiny config + shapes: CPU smoke test of the "
                         "harness itself, not a measurement")
    args = ap.parse_args()

    import jax

    if args.mini:
        # smoke-test the harness locally; the site hook would otherwise
        # land this on the axon TPU even with JAX_PLATFORMS=cpu (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from curriculum_learning_for_vln_tpu.engine.loop import parallel_warmup
    from curriculum_learning_for_vln_tpu.engine.pretrain import build_pretrain_loss
    from curriculum_learning_for_vln_tpu.models.vilbert import (
        VilBertConfig, vlnbert_apply, vlnbert_init)
    from curriculum_learning_for_vln_tpu.utils.roofline import (
        roofline_summary, vilbert_forward_cost, vilbert_train_cost)

    dev = jax.devices()[0]
    platform = dev.platform
    on_accel = platform != "cpu"
    log(f"platform: {platform} ({dev})")

    # reference scale = the dataclass defaults (ref vilbert.py:129-272)
    cfg = VilBertConfig()
    B, Lt, Lv = args.batch, args.lt, args.lv
    if args.mini:
        cfg = VilBertConfig(
            vocab_size=512, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=128,
            v_feature_size=96, v_target_size=31, v_hidden_size=64,
            v_num_hidden_layers=2, v_num_attention_heads=4,
            v_intermediate_size=128, bi_hidden_size=64,
            bi_num_attention_heads=4, v_biattention_id=(0, 1),
            t_biattention_id=(1, 2))
        B, Lt, Lv = 4, 12, 4
        args.scan, args.pretrain_scan = 2, 2
    cdt = jnp.bfloat16 if on_accel else jnp.float32
    wb = 2 if on_accel else 4

    t0 = time.time()
    params = jax.jit(lambda k: vlnbert_init(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    f32_gb = n_params * 4 / 1e9
    log(f"params: {n_params/1e6:.1f}M ({f32_gb:.2f} GB f32 master + "
        f"{n_params*8/1e9:.2f} GB adam moments + {n_params*2/1e9:.2f} GB bf16 cast "
        f"= {n_params*14/1e9:.2f} GB -> single v5e chip (16 GB HBM) fits; "
        f"init {time.time()-t0:.1f}s)")

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, tree)

    # ---- inputs (synthetic at production shapes) ----
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, Lt)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, Lv, cfg.v_feature_size)), cdt)
    locs = jnp.asarray(rng.normal(size=(B, Lv, 12)), cdt)
    attn_mask = jnp.ones((B, Lt), cdt)
    region_mask = jnp.ones((B, Lv), jnp.float32)
    region_targets = jnp.full((B, Lv, cfg.v_target_size), 1.0 / cfg.v_target_size,
                              jnp.float32)
    align_labels = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)

    params_c = cast(params)  # bf16 compute copy for the forward phases

    # ---- forward phases: scan data-chained forwards in one program ----
    def make_score(n, compute_heads):
        @jax.jit
        def many(p, f):
            def body(carry, _):
                # chain: fold the previous logit into BOTH streams' inputs.
                # Folding only into `feats` left text layers 0..9 (before the
                # first co-attention at t_biattention_id=(10,11)) loop-
                # invariant — XLA hoisted ~70% of the FLOPs out of the scan
                # and the "measurement" hit an impossible 145% of MXU peak.
                eps = carry * jnp.asarray(1e-9, cdt)
                fi = f + eps
                am = attn_mask + eps  # perturbs the text stream at layer 0
                logit, vis, lng, _ = vlnbert_apply(
                    p, cfg, tokens, fi, locs, attention_mask=am,
                    image_attention_mask=region_mask.astype(cdt),
                    train=False, compute_heads=compute_heads)
                out = jnp.sum(logit)
                if compute_heads:
                    # consume the head outputs so XLA cannot DCE them —
                    # the reference always materializes them (vln_bert.py:60)
                    out = out + jnp.mean(vis) + jnp.mean(lng)
                return out.astype(cdt), None
            out, _ = jax.lax.scan(body, jnp.asarray(0.0, cdt), None, length=n)
            return out.astype(jnp.float32)
        return many

    # ---- pretrain phase: full loss + grads + adam, params carried ----
    loss_fn = build_pretrain_loss(cfg, mask_idx=cfg.vocab_size - 1)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    batch = {"tokens": tokens, "feats": feats.astype(jnp.float32),
             "locs": locs.astype(jnp.float32)}

    def pretrain_iter(carry, r):
        p, o = carry

        def lf(pp):
            # bf16 compute cast inside the loss: grads flow to f32 masters
            loss, logs = loss_fn(cast(pp), batch["tokens"],
                                 batch["feats"].astype(cdt),
                                 batch["locs"].astype(cdt),
                                 region_mask, region_targets, align_labels, r)
            return loss.astype(jnp.float32)

        loss, grads = jax.value_and_grad(lf)(p)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    def make_pretrain(n):
        @jax.jit
        def many(p, o, r):
            (_, _), losses = jax.lax.scan(pretrain_iter, (p, o),
                                          jax.random.split(r, n))
            return losses[-1]
        return many

    # Two scan lengths per phase: per-iter = (t_long - t_short)/(n2 - n1).
    # A single length minus a trivial-program RTT baseline measured a
    # physically impossible 120% of MXU peak on this exact program — the
    # big program's fixed dispatch/fetch overhead does NOT equal the
    # trivial program's, so it must cancel within one program shape
    # (CLAUDE.md "Benchmark timing through the axon relay").
    n1, n2 = args.scan, 3 * args.scan
    p1, p2 = args.pretrain_scan, 3 * args.pretrain_scan
    score_s, score_l = make_score(n1, False), make_score(n2, False)
    heads_s, heads_l = make_score(n1, True), make_score(n2, True)
    pre_s, pre_l = make_pretrain(p1), make_pretrain(p2)

    t0 = time.time()
    thunks = [
        lambda: score_s(params_c, feats),
        lambda: score_l(params_c, feats),
        lambda: heads_s(params_c, feats),
        lambda: heads_l(params_c, feats),
        lambda: pre_s(params, opt_state, jax.random.PRNGKey(7)),
        lambda: pre_l(params, opt_state, jax.random.PRNGKey(7)),
    ]
    _, werrs = parallel_warmup(thunks)
    compile_s = time.time() - t0
    log(f"overlapped first-execution compiles: {len(thunks)} programs in "
        f"{compile_s:.1f}s ({len(werrs)} failures)")
    for e in werrs:
        log(f"  warmup failure: {e}")

    def timed(fn, *a, reps=3):
        best = float("inf")
        for _ in range(reps):
            t1 = time.time()
            float(fn(*a))
            best = min(best, time.time() - t1)
        return best

    def diff_timed(fn_s, fn_l, n_s, n_l, *a, reps=3):
        ts, tl = timed(fn_s, *a, reps=reps), timed(fn_l, *a, reps=reps)
        return max((tl - ts) / (n_l - n_s), 1e-9), ts, tl

    out = {"n_params": n_params, "batch": B, "lt": Lt, "lv": Lv,
           "compile_s": round(compile_s, 1), "platform": platform,
           "scan_lengths": [n1, n2], "pretrain_scan_lengths": [p1, p2],
           "dtype": str(cdt.__name__)}

    fc = vilbert_forward_cost(cfg, B, Lt, Lv, wb, compute_heads=False)
    per, ts, tl = diff_timed(score_s, score_l, n1, n2, params_c, feats)
    rl = roofline_summary(fc.flops, fc.bytes, per, platform)
    out["score"] = {"ms_per_batch": round(per * 1000, 2),
                    "items_per_sec": round(B / per, 1),
                    "t_short_s": round(ts, 3), "t_long_s": round(tl, 3),
                    "roofline": rl}
    log(f"score (heads off, B={B}): {per*1000:.2f} ms/batch -> "
        f"{B/per:,.0f} paths/s   roofline: {rl}")

    fch = vilbert_forward_cost(cfg, B, Lt, Lv, wb, compute_heads=True)
    per_h, ts, tl = diff_timed(heads_s, heads_l, n1, n2, params_c, feats)
    rlh = roofline_summary(fch.flops, fch.bytes, per_h, platform)
    out["score_heads"] = {"ms_per_batch": round(per_h * 1000, 2),
                          "items_per_sec": round(B / per_h, 1),
                          "t_short_s": round(ts, 3), "t_long_s": round(tl, 3),
                          "roofline": rlh}
    log(f"score (reference-parity heads, B={B}): {per_h*1000:.2f} ms/batch -> "
        f"{B/per_h:,.0f} paths/s   roofline: {rlh}")

    tc = vilbert_train_cost(cfg, B, Lt, Lv, n_params, wb)
    per_t, ts, tl = diff_timed(pre_s, pre_l, p1, p2, params, opt_state,
                               jax.random.PRNGKey(7), reps=2)
    rlt = roofline_summary(tc.flops, tc.bytes, per_t, platform)
    out["pretrain"] = {"ms_per_step": round(per_t * 1000, 2),
                       "items_per_sec": round(B / per_t, 1),
                       "t_short_s": round(ts, 3), "t_long_s": round(tl, 3),
                       "roofline": rlt}
    log(f"pretrain step (LM+regions+align+vil, grads+adam, B={B}): "
        f"{per_t*1000:.2f} ms -> {B/per_t:,.0f} items/s   roofline: {rlt}")

    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
