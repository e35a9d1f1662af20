"""Speaker compute-dtype A/B on the real chip: f32 (the round-4 path)
vs bf16 compute / f32 masters (round 5, VERDICT r4 item 3).

The round-5 device-clock trace (scripts/perf_trace.py --speaker) showed
the 25 ms teacher-forcing step is bandwidth-bound on its f32
[B,T,36,2176] pano stack (~700 MB): the feature-dropout fusion, a layout
copy, and the view-attention multiply_reduce each repay the full stack.
``Speaker(compute_dtype=bfloat16)`` halves every one of those passes and
the LSTM/attention weight reads; recurrent state and the loss softmax
stay f32 (ops/rnn.py f32 gate accumulation).

Arms (pallas RNN backend = production, both dtypes, one session):
  train  — teacher-forcing train step (collect + encoder + decoder +
           grads + adam), pretrain_speaker's hot program
  infer  — back-translation sampled decode (engine/self_train.py device
           side)

Timing: two-scan-length differencing (CLAUDE.md relay recipe); iterations
data-chained through params (train) / the sampling key (infer).
Run ALONE.

Usage: python scripts/perf_speaker_dtype.py [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_common import BATCH, EPISODE_LEN, FEAT_DIM, HIDDEN, build_setup, log


def build_speaker(tok_size: int, cdt):
    from curriculum_learning_for_vln_tpu.agents.speaker import Speaker
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    s = cfg.AIDE.SPEAKER
    s.RNN_DIM = HIDDEN
    s.WEMB = 256
    s.MAX_DECODE = 80
    return Speaker(s, tok_size, feat_dim=FEAT_DIM, episode_len=EPISODE_LEN,
                   compute_dtype=cdt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--only", default="",
                    help="measure just one arm (f32|bf16) — halves the "
                         "relay compile bill when re-measuring after a fix")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from curriculum_learning_for_vln_tpu.agents.speaker import \
        collect_shortest_path_features
    from curriculum_learning_for_vln_tpu.engine.loop import parallel_warmup
    from curriculum_learning_for_vln_tpu.ops import rnn as rnn_ops

    agent, tables, henv, ep, *_ = build_setup()
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        rnn_ops.set_backend("pallas")
    log(f"platform: {jax.devices()[0].platform}, rnn backend "
        f"{'pallas' if on_tpu else 'xla'}")

    speakers = {
        "f32": build_speaker(henv.tok.vocab_size(), jnp.float32),
        "bf16": build_speaker(henv.tok.vocab_size(), jnp.bfloat16),
    }
    if args.only:
        speakers = {args.only: speakers[args.only]}
    # masters are f32 for every arm; any Speaker builds the same pytree
    params, opt_state = next(iter(speakers.values())).init(jax.random.PRNGKey(0))

    def make_train_many(spk, n):
        def one(carry, rng):
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
        def many(p, o, rng):
            (_, _), losses = jax.lax.scan(one, (p, o), jax.random.split(rng, n))
            return losses[-1]

        return many

    def make_infer_many(spk, n):
        @jax.jit
        def many(p, rng, mask):
            def one(carry, r):
                rr = jax.random.fold_in(
                    r, jnp.int32(jnp.mod(carry, 32768.0)) & 0x7FFF)
                feats = collect_shortest_path_features(tables, ep, spk.episode_len,
                                                       spk.compute_dtype)
                words, _ = spk.infer(p, feats, rr, sampling=True, feat_mask=mask)
                return carry + jnp.sum(words).astype(jnp.float32), None

            out, _ = jax.lax.scan(one, jnp.float32(0.0), jax.random.split(rng, n))
            return out

        return many

    mask = next(iter(speakers.values())).make_drop_mask(
        jax.random.PRNGKey(7), FEAT_DIM)
    N1, N2 = 2, 8
    programs = {}
    for dt, spk in speakers.items():
        for n in (N1, N2):
            programs[(dt, "train", n)] = (
                make_train_many(spk, n),
                (params, opt_state, jax.random.PRNGKey(3)))
            programs[(dt, "infer", n)] = (
                make_infer_many(spk, n),
                (params, jax.random.PRNGKey(4), mask))

    t0 = time.time()
    thunks = [lambda f=f, a=a: f(*a) for (f, a) in programs.values()]
    _, errs = parallel_warmup(thunks)
    log(f"warmup: {len(thunks)} programs in {time.time()-t0:.0f}s "
        f"({len(errs)} failures)")
    for e in errs:
        log(f"  failure: {e}")

    def timed(fn, *a, reps=3):
        best = float("inf")
        for _ in range(reps):
            t1 = time.time()
            float(fn(*a))
            best = min(best, time.time() - t1)
        return best

    out = {"batch": BATCH, "episode_len": EPISODE_LEN, "feat_dim": FEAT_DIM}
    for dt in speakers:
        for nm in ("train", "infer"):
            fs, a = programs[(dt, nm, N1)]
            fl, _ = programs[(dt, nm, N2)]
            ts, tl = timed(fs, *a), timed(fl, *a)
            per = max((tl - ts) / (N2 - N1), 1e-9)
            out[f"{dt}_{nm}_ms"] = round(per * 1000, 2)
            log(f"{dt:5s} {nm}: {per*1000:.2f} ms/iter "
                f"(t{N1}={ts:.3f}s t{N2}={tl:.3f}s)")
    if "f32_train_ms" in out and out["f32_train_ms"] > 0:
        out["train_speedup"] = round(out["f32_train_ms"] / out["bf16_train_ms"], 2)
        out["infer_speedup"] = round(out["f32_infer_ms"] / out["bf16_infer_ms"], 2)
        log(f"speedup: train {out['train_speedup']}x, infer {out['infer_speedup']}x")

    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
