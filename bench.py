"""Benchmark: batched R2R episode rollout throughput (steps/sec/chip).

Headline metric (BASELINE.json): rollout steps/sec/chip for batched R2R
episodes at the reference's EnvDrop configuration (batch 64, episode len
35, 36x2048 features, hidden 512, 80-token instructions).

Measurements:
* device rollout — the TPU-native path: policy inference + env stepping
  fused in one jitted lax.scan (argmax feedback, eval mode);
* device training iteration — the full fused program: teacher-forced IL
  rollout + sampled A2C rollout + backward + RMSprop update;
* host-loop baseline — a faithful cost emulation of the reference
  architecture's environment path (one C++ sim per batch slot stepped
  sequentially from Python, per-sample candidate/feature packing in
  numpy; ref: tasks/R2R-judy/src/environ/common_env.py:58-110,225-330),
  with a zero-cost model (teacher actions).  This under-counts the
  reference's true per-step cost (no torch forward/backward), so
  ``vs_baseline`` is a conservative lower bound on the speedup.

Timing methodology: when the device is reached through a network relay,
per-dispatch timing (and even block_until_ready) can misreport
completion.  Device work is therefore timed by running N iterations
*inside* one jitted lax.scan, fetching a scalar result to the host, and
differencing two scan lengths — round-trip latency cancels and the
result is pure device time (each scan iteration is data-dependent on the
previous one so the compiler cannot elide iterations).

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# soft wall-clock budget so the JSON line always lands
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
_T_START = time.time()

BATCH = 64
EPISODE_LEN = 35
ENC_LEN = 80
FEAT_DIM = 2048
HIDDEN = 512
NUM_SCANS = 12
NODES_PER_SCAN = 64


def remaining():
    return BUDGET_S - (time.time() - _T_START)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fail_json(reason: str):
    """Emit ONE structured JSON line and exit 0 — the driver must always
    capture a parseable record, never a traceback (BENCH_r03 lost a whole
    round's perf evidence to an rc=1 relay outage)."""
    print(json.dumps({
        "metric": "rollout steps/sec/chip (batched R2R episodes, EnvDrop policy)",
        "value": None,
        "unit": "steps/s",
        "vs_baseline": None,
        "ok": False,
        "reason": reason,
        "elapsed_s": round(time.time() - _T_START, 1),
    }))
    sys.exit(0)


def pause_cpu_studies():
    """SIGSTOP background CPU study jobs for the duration of the bench.

    CLAUDE.md: 'Serialize TPU benchmarks against CPU-heavy jobs' — the
    relay-safe inner-scan differencing still measures host wall-clock
    between two fetches, and the host-loop baseline is a pure CPU timing,
    so a concurrent parity-matrix/pytest run corrupts both (a measured
    6x-inflated rl-only number).  The round-5 study queue
    (scripts/cpu_queue_r5.sh) can be mid-run when the driver fires
    bench.py at round end; rather than relying on the queue noticing,
    the bench pauses it: SIGSTOP (never kill) the queue shells via their
    pid files plus any process whose argv[0] is literally ``python``
    running a known study entry point (bench.py itself can't match).
    Everything stopped is SIGCONTed at exit via atexit — including the
    fail_json early-exit path.
    """
    import atexit
    import signal

    stopped = []

    def _stop(pid):
        try:
            os.kill(pid, 0)
            os.kill(pid, signal.SIGSTOP)
            stopped.append(pid)
        except (OSError, ValueError):
            pass

    for f in ("/tmp/cpu_queue.pid", "/tmp/monitor_study.pid"):
        try:
            with open(f) as fh:
                _stop(int(fh.read().strip()))
        except (OSError, ValueError):
            pass
    names = ("parity_matrix.py", "clr2r_e2e.py", "packed_study.py",
             "beam_study.py", "-m pytest")
    try:
        ps = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                            text=True, timeout=20).stdout
        for line in ps.splitlines()[1:]:
            parts = line.split(None, 2)
            if len(parts) == 3 and parts[1] == "python" and any(
                    n in parts[2] for n in names):
                _stop(int(parts[0]))
    except Exception as e:
        log(f"study-pause ps scan failed (continuing): {e}")
    if stopped:
        log(f"paused CPU study jobs for the bench: {stopped}")

        def _resume():
            for p in stopped:
                try:
                    os.kill(p, signal.SIGCONT)
                except OSError:
                    pass
            log(f"resumed CPU study jobs: {stopped}")

        atexit.register(_resume)


def acquire_backend():
    """Patiently wait for the JAX backend before importing jax in-process.

    The axon TPU relay can be down for hours, and a hung in-process
    ``jax.devices()`` cannot be recovered from — so probe it in a
    SUBPROCESS with a hard timeout, retrying with backoff.  Only after a
    probe succeeds do we let the parent process touch jax.  CPU-forced
    runs (JAX_PLATFORMS=cpu, e.g. BENCH_MESH on the virtual mesh) skip
    the probe entirely.
    """
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return
    attempts = int(os.environ.get("BENCH_BACKEND_RETRIES", "10"))
    backoff = float(os.environ.get("BENCH_BACKEND_BACKOFF_S", "60"))
    probe = ("import jax, sys; d = jax.devices(); "
             "print(d[0].platform, len(d)); sys.stdout.flush()")
    last_err = "unknown"
    for i in range(attempts):
        if remaining() < 180:
            last_err = f"budget exhausted after {i} probe attempts ({last_err})"
            break
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=90,
                               capture_output=True, text=True)
            if r.returncode == 0:
                log(f"backend probe ok (attempt {i + 1}): {r.stdout.strip()}")
                return
            last_err = (r.stderr.strip().splitlines() or ["rc=%d" % r.returncode])[-1]
        except subprocess.TimeoutExpired:
            last_err = "probe timed out after 90s (relay hang)"
        log(f"backend probe attempt {i + 1}/{attempts} failed: {last_err}")
        if i + 1 < attempts and remaining() > backoff + 180:
            time.sleep(backoff)
    fail_json(f"backend unavailable: {last_err}")


def build_universe():
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
    from curriculum_learning_for_vln_tpu.utils.tokenizer import Tokenizer, build_vocab
    from curriculum_learning_for_vln_tpu.world import compiler, synthetic

    t0 = time.time()
    graphs = synthetic.make_world_graphs(NUM_SCANS, NODES_PER_SCAN, seed=0)
    world = compiler.compile_world(graphs, max_candidates=16)
    compiler.attach_synthetic_features(world, feature_dim=FEAT_DIM)
    items = synthetic.make_r2r_dataset(graphs, num_paths=512, seed=1, min_hops=4, max_hops=7)
    tok = Tokenizer(build_vocab(items, min_count=1), encoding_length=ENC_LEN)
    data = expand_r2r_items(items, tok)
    henv = R2RBatchEnv(world, data, batch_size=BATCH, tokenizer=tok, seed=0)
    log(f"universe: {world.num_nodes} nodes, {len(data)} episodes, built in {time.time()-t0:.1f}s")
    return world, graphs, henv, tok


def _timed_fetch(fn, *args, reps: int = 3) -> float:
    """Min wall time of fn(*args) forced to completion via a host fetch.
    Retries transient remote-compile failures (relay contention)."""
    for attempt in range(3):
        try:
            float(fn(*args))  # warmup / compile
            break
        except Exception as e:
            if attempt == 2:
                raise
            log(f"warmup retry after: {e}")
            time.sleep(5)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best


def bench_device(world, henv, tok):
    import jax

    # honor JAX_PLATFORMS=cpu despite the site hook that pre-registers the
    # remote-TPU backend (same snippet as main.py; needed for CPU-mesh runs)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import optax

    # NO persistent compile cache here: through the axon relay the real
    # Mosaic compile happens SERVER-side at first execution (CLAUDE.md
    # "Relay compile"), so a client cache cannot shorten cold starts — and
    # the round-3 judged segfault was in the client cache READ path against
    # the shared multi-GB .jax_cache dir (tests/conftest.py).  Overlapped
    # first-execution dispatch (parallel_warmup below) is the cold-start
    # mitigation instead.

    from curriculum_learning_for_vln_tpu.agents import EnvDropAgent
    from curriculum_learning_for_vln_tpu.agents.common import (FEEDBACK_ARGMAX,
                                                               FEEDBACK_SAMPLE,
                                                               FEEDBACK_TEACHER)
    from curriculum_learning_for_vln_tpu.engine.loop import (clip_submodule_grads,
                                                             make_optimizer)
    from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

    platform = jax.devices()[0].platform
    log(f"device platform: {platform} ({jax.devices()[0]})")
    on_accel = platform != "cpu"
    if platform == "tpu":
        # mirror the production TPU.USE_PALLAS path (fused masked-LSTM
        # encoder kernel; measured 3.98 -> 3.38 ms rollout, 18.8 -> 16.2 ms
        # train iteration on v5e) + the fused observation kernel
        # (gather+dropout+attention+cand rows, ops/fused_obs.py)
        from curriculum_learning_for_vln_tpu.ops import fused_obs, rnn
        rnn.set_backend("pallas")
        fused_obs.set_backend("pallas_prng")
    tables = world.device_tables("bf16" if on_accel else "f32")

    cfg = get_cfg_defaults()
    m = cfg.MODEL.ENVDROP
    m.WORD_EMB_SIZE = 256
    m.ACT_EMB_SIZE = 64
    m.HIDDEN_SIZE = HIDDEN
    m.ENC_BIDIRECTION = True
    m.ENC_LAYERS = 1
    m.ML_WEIGHT = 0.2
    m.GAMMA = 0.9
    m.RL_NORMALIZE = "total"
    agent = EnvDropAgent(m, max_enc_len=ENC_LEN, vocab_size=tok.vocab_size(),
                         feat_dim=FEAT_DIM, episode_len=EPISODE_LEN)
    if on_accel:
        agent.compute_dtype = jnp.bfloat16
    params, mstate = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()

    # --- pure rollout, RTT-cancelled inner-scan timing ---
    def one_rollout(p, ep_in, rng):
        _, r, _ = agent.rollout(p, {}, tables, ep_in, rng,
                                feedback=FEEDBACK_ARGMAX, train=False)
        return r.final_state.node

    def make_many_rollouts(n):
        @jax.jit
        def many(tables_, params_, ep_, rng):
            def body(carry, r):
                # data-dependent chain: heading jitter from the previous
                # result (rounded away in reset, but not statically
                # removable, so iterations cannot be elided)
                ep2 = ep_._replace(start_heading=ep_.start_heading + 1e-9 * carry)
                nodes = one_rollout(params_, ep2, r)
                return jnp.sum(nodes).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(rng, n))
            return out
        return many

    # RTT/dispatch baseline: a trivial jitted fetch (compiles in ~1s).
    # Subtracting it replaces the old two-scan-length differencing with
    # HALF the number of full-program compiles (VERDICT r2 item 8: cold
    # compile) at the same relay-RTT cancellation: t(program) = dispatch
    # + fetch + device_time; the trivial program measures dispatch+fetch.
    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.000001

    n2 = 20
    many_big = make_many_rollouts(n2)

    # --- build the train program up front so BOTH big programs' server-side
    # first-execution compiles overlap (the relay compiles distinct programs
    # concurrently — 6 programs measured 189 s overlapped vs 1067 s summed,
    # scripts/compile_audit.py --overlap / engine.loop.parallel_warmup) ---
    IL_LEN = 8
    train_big = None
    packed_big = None
    opt = opt_state = None
    ep_t, params_t = ep, params
    mesh_n = 0
    if remaining() > 180:
        opt = make_optimizer("rms", 1e-4)
        opt_state = opt.init(params)

        # BENCH_MESH=N: run the train iteration data-parallel over an
        # N-device mesh (the driver's single-chip run leaves this off; on a
        # real v5e-8 pod set BENCH_MESH=8 for the DP number).  The rollout
        # phase keeps the unplaced single-chip arrays.
        mesh_n = int(os.environ.get("BENCH_MESH", "0"))
        if mesh_n > 1 and len(jax.devices()) >= mesh_n:
            from curriculum_learning_for_vln_tpu.parallel import mesh as M

            mesh = M.make_mesh(data=mesh_n)
            ep_t = jax.device_put(ep, M.batch_sharding(mesh))
            params_t = M.replicate(params, mesh)
            opt_state = M.replicate(opt_state, mesh)
            log(f"BENCH_MESH: data-parallel over {mesh_n} devices "
                f"(global batch {BATCH})")

        def train_iter(carry, rng):
            p, o = carry

            def loss_fn(pp):
                il, _, _ = agent.rollout(pp, {}, tables, ep_t, rng,
                                         feedback=FEEDBACK_TEACHER, train=True,
                                         train_ml=True, train_rl=False,
                                         episode_len=IL_LEN)
                rl, _, _ = agent.rollout(pp, {}, tables, ep_t, jax.random.fold_in(rng, 1),
                                         feedback=FEEDBACK_SAMPLE, train=True,
                                         train_ml=False, train_rl=True)
                return il.ml_loss + rl.rl_loss

            loss, grads = jax.value_and_grad(loss_fn)(p)
            grads = clip_submodule_grads(grads, ("encoder", "decoder"), 40.0)
            updates, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        def make_many_train(n):
            @jax.jit
            def many(params_, opt_state_, rng):
                (_, _), losses = jax.lax.scan(train_iter, (params_, opt_state_),
                                              jax.random.split(rng, n))
                return losses[-1]
            return many

        train_big = make_many_train(8)

        # packed-RL variant (TPU.PACKED_RL, agents/packed.py): continuous
        # batching refills ended RL slots from a 3xB pool inside the scan,
        # so useful work is episodes/s, not scan-steps/s (raw steps/s
        # undercounts it).  Single-chip only (the DP mesh path keeps the
        # classic program).
        if mesh_n <= 1 and os.environ.get("BENCH_PACKED", "1") == "1":
            from curriculum_learning_for_vln_tpu.engine.loop import concat_batches

            pool = concat_batches([ep, henv.next_batch(), henv.next_batch()])

            def packed_iter(carry, rng):
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
                return (optax.apply_updates(p, updates), o), done

            def make_many_packed(n):
                @jax.jit
                def many(params_, opt_state_, rng):
                    (_, _), dones = jax.lax.scan(packed_iter, (params_, opt_state_),
                                                 jax.random.split(rng, n))
                    return jnp.sum(dones).astype(jnp.float32)
                return many

            packed_big = make_many_packed(8)

    t0 = time.time()
    from curriculum_learning_for_vln_tpu.engine.loop import parallel_warmup

    thunks = [lambda: trivial(jnp.ones((8,), jnp.float32)),
              lambda: many_big(tables, params, ep, jax.random.PRNGKey(1))]
    if train_big is not None:
        thunks.append(lambda: train_big(params_t, opt_state, jax.random.PRNGKey(2)))
    if packed_big is not None:
        thunks.append(lambda: packed_big(params, opt_state, jax.random.PRNGKey(3)))
    _, werrs = parallel_warmup(thunks)
    rollout_compile_s = time.time() - t0
    log(f"overlapped first-execution compiles: {len(thunks)} programs in "
        f"{rollout_compile_s:.1f}s ({len(werrs)} failures)")
    for e in werrs:
        # warmup failures are usually transient relay contention — the
        # measurement phases retry — but name them so a real compile
        # error is diagnosable from the driver log
        log(f"  warmup failure: {type(e).__name__}: {str(e)[:200]}")

    t_rtt = _timed_fetch(trivial, jnp.ones((8,), jnp.float32))
    log(f"dispatch+fetch baseline: {t_rtt*1000:.1f} ms")

    t_big = _timed_fetch(many_big, tables, params, ep, jax.random.PRNGKey(1))
    per_rollout = max((t_big - t_rtt) / n2, 1e-9)
    rollout_sps = BATCH * EPISODE_LEN / per_rollout
    log(f"device rollout: {per_rollout*1000:.2f} ms / {BATCH}x{EPISODE_LEN} rollout "
        f"-> {rollout_sps:,.0f} steps/s  (overlapped setup+compile "
        f"{rollout_compile_s:.1f}s)")
    # MFU/roofline vs v5e peaks from the analytic cost model (VERDICT r2
    # item 7; XLA's cost_analysis counts scan bodies once, so it cannot
    # price these programs — utils/roofline.py docstring)
    from curriculum_learning_for_vln_tpu.utils.roofline import (
        EnvDropShapes, roofline_summary, rollout_cost, train_iter_cost)

    shapes = EnvDropShapes(B=BATCH, T=EPISODE_LEN, L=ENC_LEN, D=FEAT_DIM,
                           H=HIDDEN, wb=2 if on_accel else 4,
                           fb=2 if on_accel else 4)
    rc = rollout_cost(shapes)
    rollout_roofline = roofline_summary(rc.flops, rc.bytes, per_rollout, platform)
    log(f"rollout roofline: {rollout_roofline}")

    # --- full training iteration, same methodology.  The IL rollout uses
    # the production episode-length bucket (TPU.IL_BUCKETS: these 4-7-hop
    # episodes compile at T=8, engine.trainer.il_bucket_fn); the sampled RL
    # rollout keeps the full horizon.  Measured on v5e: 38.3 ms unbucketed
    # -> 23.5 ms bucketed. ---
    train_sps = None
    per_iter = None
    train_roofline = {}
    if train_big is not None and remaining() > 60:
        try:
            t_big = _timed_fetch(train_big, params_t, opt_state, jax.random.PRNGKey(2))
            t_big = min(t_big, _timed_fetch(train_big, params_t, opt_state,
                                            jax.random.PRNGKey(2)))
            per_iter = max((t_big - t_rtt) / 8, 1e-9)
            # steps the reference would execute for the same iteration
            train_sps = BATCH * EPISODE_LEN * 2 / per_iter
            log(f"train iteration (IL[T={IL_LEN}]+RL[T={EPISODE_LEN}]+grads+update): "
                f"{per_iter*1000:.2f} ms -> {train_sps:,.0f} rollout-steps/s")
            tc = train_iter_cost(shapes, il_T=IL_LEN)
            train_roofline = roofline_summary(tc["flops"], tc["bytes"],
                                              per_iter, platform)
            log(f"train roofline: {train_roofline}")
        except Exception as e:
            log(f"train-step measurement skipped: {e}")
    else:
        log(f"train-step measurement skipped ({remaining():.0f}s budget left)")

    # --- packed-RL iteration: episodes/s is the honest useful-work rate ---
    packed = {}
    if packed_big is not None and remaining() > 60:
        try:
            done_total = float(packed_big(params, opt_state, jax.random.PRNGKey(3)))
            t_big = _timed_fetch(packed_big, params, opt_state, jax.random.PRNGKey(3))
            per_packed = max((t_big - t_rtt) / 8, 1e-9)
            done_per_iter = done_total / 8
            packed = {
                "iter_ms": round(per_packed * 1000, 2),
                "pool_factor": 3,
                "episodes_done_per_iter": round(done_per_iter, 1),
                "episodes_per_sec": round(done_per_iter / per_packed, 1),
            }
            if per_iter:
                packed["unpacked_episodes_per_sec"] = round(BATCH / per_iter, 1)
            log(f"packed train iteration (IL[T={IL_LEN}]+packedRL3): "
                f"{per_packed*1000:.2f} ms, {done_per_iter:.1f} episodes/iter "
                f"-> {done_per_iter/per_packed:,.0f} episodes/s"
                + (f" (unpacked: {BATCH/per_iter:,.0f}/s)" if per_iter else ""))
        except Exception as e:
            log(f"packed measurement skipped: {e}")
    return (rollout_sps, train_sps, per_iter, rollout_compile_s,
            rollout_roofline, train_roofline, packed)


def bench_host_baseline(world, graphs, henv):
    """Reference-architecture env loop: per-sample C++ sim stepping +
    numpy observation packing, teacher actions, zero-cost model."""
    from curriculum_learning_for_vln_tpu.utils.angles import (ANGLE_INC, all_loc_embeddings,
                                                              make_angle_feat_np)
    from curriculum_learning_for_vln_tpu.world import native

    if not native.native_available():
        log("native graphworld unavailable; baseline skipped")
        return None
    loc_embeds = all_loc_embeddings()
    nworlds = {s: native.NativeWorld(g) for s, g in graphs.items()}
    feat_store = {g: world.features[g] for g in range(world.num_nodes)}

    total_steps = 0
    t0 = time.time()
    for _round in range(4):  # average several batches
        idx = np.asarray(henv._next_indices())
        scans = [world.scan_of(int(henv.start_node[i])) for i in idx]
        sims = []
        for b, i in enumerate(idx):
            sim = native.GraphSim(nworlds[scans[b]])
            sim.new_episode(int(world.node_local[henv.start_node[i]]),
                            float(henv.start_heading[i]))
            sims.append(sim)
        goals = [int(henv.goal_local[i]) for i in idx]
        offsets = {s: int(world.scan_offset[world.scan_ids.index(s)]) for s in set(scans)}
        cand_cache = {}
        ended = np.zeros(len(idx), dtype=bool)
        for t in range(EPISODE_LEN):
            feats = np.empty((len(idx), 36, FEAT_DIM + 128), np.float32)
            actions = []
            for b, sim in enumerate(sims):
                st = sim.get_state()
                g = offsets[scans[b]] + st["node"]
                feats[b] = np.concatenate([feat_store[g], loc_embeds[st["viewIndex"]]], -1)
                key = (scans[b], st["node"])
                if key not in cand_cache:
                    n = int(world.n_cands[g])
                    cand_cache[key] = [
                        (int(world.cand_next[g, j]) - offsets[scans[b]],
                         float(world.cand_heading[g, j]), float(world.cand_elev[g, j]),
                         int(world.cand_view[g, j])) for j in range(n)]
                base_heading = (st["viewIndex"] % 12) * ANGLE_INC
                _cand_feats = [
                    np.concatenate([feat_store[g][v], make_angle_feat_np(h - base_heading, e)])
                    for (_, h, e, v) in cand_cache[key]]
                teacher_next = int(world.next_hop[g, goals[b]]) - offsets[scans[b]]
                a = -1
                for j, (nxt, h, e, v) in enumerate(cand_cache[key]):
                    if nxt == teacher_next:
                        a = j
                        break
                actions.append((a, cand_cache[key][a] if a >= 0 else None))
            for b, sim in enumerate(sims):
                if ended[b]:
                    continue
                total_steps += 1
                a, cand = actions[b]
                if a < 0:
                    ended[b] = True
                    continue
                st = sim.get_state()
                target_view = cand[3]
                dh = (target_view % 12) - (st["viewIndex"] % 12)
                dh = (dh + 6) % 12 - 6
                for _ in range(abs(dh)):
                    sim.make_action(0, np.sign(dh) * ANGLE_INC, 0)
                de = target_view // 12 - st["viewIndex"] // 12
                for _ in range(abs(de)):
                    sim.make_action(0, 0, np.sign(de) * ANGLE_INC)
                nodes, rh, re = sim.navigable()
                slot = int(np.where(nodes == cand[0])[0][0])
                sim.make_action(slot, 0, 0)
            if ended.all():
                break
    dt = time.time() - t0
    sps = total_steps / dt
    log(f"host-loop baseline: {sps:,.0f} env steps/s ({total_steps} steps in {dt:.2f}s)")
    return sps


def main():
    acquire_backend()
    # pause AFTER the (possibly hours-long) relay wait so the studies keep
    # making progress until the chip is actually reachable
    pause_cpu_studies()
    world, graphs, henv, tok = build_universe()
    try:
        baseline_sps = bench_host_baseline(world, graphs, henv)
    except Exception as e:  # baseline must never sink the benchmark
        log(f"baseline failed: {e}")
        baseline_sps = None
    try:
        (rollout_sps, train_sps, per_iter, compile_s,
         rollout_roofline, train_roofline, packed) = bench_device(world, henv, tok)
    except Exception as e:
        fail_json(f"device bench failed: {type(e).__name__}: {e}")

    vs = (rollout_sps / baseline_sps) if baseline_sps else None
    print(json.dumps({
        "metric": "rollout steps/sec/chip (batched R2R episodes, EnvDrop policy)",
        "value": round(rollout_sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "ok": True,
        "detail": {
            "packed_rl": packed or None,
            "train_steps_per_sec_incl_grads": round(train_sps, 1) if train_sps else None,
            "train_iter_ms": round(per_iter * 1000, 2) if per_iter else None,
            "train_episodes_per_sec": round(BATCH / per_iter, 1) if per_iter else None,
            "rollout_roofline": rollout_roofline or None,
            "train_roofline": train_roofline or None,
            "il_bucketed": True,
            "host_loop_baseline_steps_per_sec": round(baseline_sps, 1) if baseline_sps else None,
            "batch": BATCH, "episode_len": EPISODE_LEN,
            "setup_compile_s": round(compile_s, 1),
            "compile_overlapped": True,
            "timing": "N-iteration inner scan minus trivial-dispatch RTT baseline "
                      "(relay-RTT cancelled; all programs' server-side first-"
                      "execution compiles overlapped, setup_compile_s is that wall)",
            "baseline_scope": "env-architecture comparison (zero-cost model in the "
                              "host loop); NOT an end-to-end reference-training ratio",
        },
    }))


if __name__ == "__main__":
    main()
