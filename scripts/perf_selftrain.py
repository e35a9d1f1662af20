"""Self-train (speaker) iteration cost on the real chip, XLA vs Pallas
LSTM backend — VERDICT r3 item 7's perf line.

The speaker encoder now routes its LSTMs through ops.rnn.masked_lstm
(models/speaker_model.py), so the "pallas" backend covers its post-LSTM
(w_ih 2 MB: fits VMEM) while the first layer (D=feat+angle=2176, w_ih
8.9 MB) falls back to the XLA scan via the ops.rnn VMEM guard — this
script measures what that buys end to end:

* speaker teacher-forcing training step (collect feats + encoder +
  decoder + grads + Adam) — the pretrain_speaker hot loop;
* back-translation generation (collect feats + encoder + 80-step decode
  scan) — the device side of engine/self_train.py's bt arm.  Production
  bt additionally pays one host fetch (~1 relay RTT) per iteration for
  generated_to_instr_tokens, reported separately via the trivial-dispatch
  baseline.

Timing: relay-RTT-cancelled inner-scan differencing (perf_common).  Each
arm's programs are traced eagerly with its backend active, then all first
executions fire from one thread so the relay overlaps the server-side
compiles.  Run ALONE.

Usage: python scripts/perf_selftrain.py
"""
from __future__ import annotations

import time

from perf_common import BATCH, EPISODE_LEN, FEAT_DIM, HIDDEN, build_setup, log, timed


def build_speaker(tok_size: int):
    from curriculum_learning_for_vln_tpu.agents.speaker import Speaker
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    s = cfg.AIDE.SPEAKER
    s.RNN_DIM = HIDDEN
    s.WEMB = 256
    s.MAX_DECODE = 80
    return Speaker(s, tok_size, feat_dim=FEAT_DIM, episode_len=EPISODE_LEN)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from curriculum_learning_for_vln_tpu.engine.loop import parallel_warmup
    from curriculum_learning_for_vln_tpu.ops import rnn as rnn_ops

    agent, tables, henv, ep, *_ = build_setup()
    spk = build_speaker(henv.tok.vocab_size())
    params, opt_state = spk.init(jax.random.PRNGKey(0))

    def make_train_many(n):
        from curriculum_learning_for_vln_tpu.agents.speaker import \
            collect_shortest_path_features

        def one(carry, rng):
            p, o = carry
            feats = collect_shortest_path_features(tables, ep, spk.episode_len)

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

    def make_infer_many(n):
        from curriculum_learning_for_vln_tpu.agents.speaker import \
            collect_shortest_path_features

        @jax.jit
        def many(p, rng, mask):
            def one(carry, r):
                # sampling=True (the reference's back-translation decode
                # mode) + carry folded into the key: each iteration's
                # decode depends on the previous one, so XLA can neither
                # hoist the loop-invariant argmax decode out of the scan
                # (the bug in the first version of this arm, which
                # measured 0.0 ms) nor overlap iterations.
                rr = jax.random.fold_in(r, jnp.int32(jnp.mod(carry, 32768.0)) & 0x7FFF)
                feats = collect_shortest_path_features(tables, ep, spk.episode_len)
                words, _ = spk.infer(p, feats, rr, sampling=True, feat_mask=mask)
                return carry + jnp.sum(words).astype(jnp.float32), None

            out, _ = jax.lax.scan(one, jnp.float32(0.0), jax.random.split(rng, n))
            return out

        return many

    mask = spk.make_drop_mask(jax.random.PRNGKey(7), FEAT_DIM)
    N1, N2 = 2, 8
    programs = {}
    for backend in ("xla", "pallas"):
        rnn_ops.set_backend(backend)
        for nm, mk, args in (
            ("train", make_train_many, lambda n: (params, opt_state,
                                                  jax.random.PRNGKey(3))),
            ("infer", make_infer_many, lambda n: (params, jax.random.PRNGKey(4),
                                                  mask)),
        ):
            for n in (N1, N2):
                key = (backend, nm, n)
                programs[key] = (mk(n).lower(*args(n)).compile(), args(n))
    rnn_ops.set_backend("xla")

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.000001

    t0 = time.time()
    thunks = [lambda: trivial(jnp.ones((8,), jnp.float32))]
    thunks += [lambda c=c, a=a: c(*a) for (c, a) in programs.values()]
    _, errs = parallel_warmup(thunks)
    log(f"warmup: {len(thunks)} programs in {time.time()-t0:.0f}s "
        f"({len(errs)} failures)")

    t_rtt = timed(trivial, jnp.ones((8,), jnp.float32))
    log(f"dispatch+fetch baseline (the extra per-iteration cost the "
        f"production bt arm pays for its host fetch): {t_rtt*1000:.1f} ms")

    for backend in ("xla", "pallas"):
        for nm in ("train", "infer"):
            c1, a1 = programs[(backend, nm, N1)]
            c2, a2 = programs[(backend, nm, N2)]
            t1 = timed(c1, *a1)
            t2 = timed(c2, *a2)
            per = max((t2 - t1) / (N2 - N1), 1e-9)
            print(f"speaker {nm} [{backend}]: {per*1000:.2f} ms/iter")


if __name__ == "__main__":
    main()
