"""Config-knob coverage: every TPU/model knob that gates a code path has a
test that flips it (VERDICT r1 item 7)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import build_agent
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine.loop import (build_scanned_train_step,
                                                         build_train_step,
                                                         make_optimizer, stack_batches)
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def base_cfg(model="FOLLOWER"):
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = model
    cfg.MODEL.FOLLOWER.WORD_EMB_SIZE = 32
    cfg.MODEL.FOLLOWER.HIDDEN_SIZE = 64
    cfg.MODEL.FOLLOWER.ENC_LAYERS = 1
    cfg.MODEL.ENVDROP.WORD_EMB_SIZE = 32
    cfg.MODEL.ENVDROP.ACT_EMB_SIZE = 16
    cfg.MODEL.ENVDROP.HIDDEN_SIZE = 64
    cfg.MODEL.ENVDROP.ML_WEIGHT = 0.2
    cfg.MODEL.ENVDROP.GAMMA = 0.9
    cfg.MODEL.MONITOR.WORD_EMB_SIZE = 32
    cfg.MODEL.MONITOR.HIDDEN_SIZE = 64
    cfg.MODEL.MONITOR.MLP_HIDDEN = (32, 64)
    cfg.DATA.MAX_ENC_LEN = 24
    cfg.AGENT.MAX_EPISODE_LEN = 6
    return cfg


def test_glove_path_reaches_follower_encoder(tokenizer, tmp_path):
    """MODEL.FOLLOWER.GLOVE_PATH flows through build_agent into the encoder
    embedding table (ref: units.py:30-37, config.py:70)."""
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((tokenizer.vocab_size(), 32)).astype(np.float32)
    path = str(tmp_path / "glove.npy")
    np.save(path, glove)

    cfg = base_cfg()
    cfg.MODEL.FOLLOWER.GLOVE_PATH = path
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM, vocab=tokenizer.vocab)
    params, _ = agent.init(jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(params["encoder"]["embedding"]["w"]), glove)


def test_glove_text_format_aligns_vocab(tokenizer, tmp_path):
    words = tokenizer.vocab[:3]
    path = str(tmp_path / "glove.txt")
    with open(path, "w") as f:
        for i, w in enumerate(words):
            vec = " ".join([str(float(i + 1))] * 32)
            f.write(f"{w} {vec}\n")
    cfg = base_cfg()
    cfg.MODEL.FOLLOWER.GLOVE_PATH = path
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM, vocab=tokenizer.vocab)
    params, _ = agent.init(jax.random.PRNGKey(0))
    emb = np.asarray(params["encoder"]["embedding"]["w"])
    # row 0 is <PAD> (zeroed); later listed words got their text vectors
    assert np.allclose(emb[0], 0.0)
    for i, w in enumerate(words):
        if w == "<PAD>":
            continue
        assert np.allclose(emb[tokenizer.word_to_index[w]], float(i + 1))


@pytest.mark.parametrize("model", ["FOLLOWER", "SELF-MONITOR", "ENVDROP"])
def test_compute_dtype_follows_tpu_precision(tokenizer, model):
    cfg = base_cfg(model)
    cfg.TPU.PRECISION = "bf16"
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    assert agent.compute_dtype == jnp.bfloat16
    cfg.TPU.PRECISION = "f32"
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    assert agent.compute_dtype == jnp.float32


def test_bf16_feature_path_trains(synth_world, synth_dataset, tokenizer):
    """bf16 observation gathers produce a finite, close loss vs f32."""
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=1)
    tables = synth_world.device_tables()
    losses = {}
    for precision in ("f32", "bf16"):
        cfg = base_cfg()
        cfg.TPU.PRECISION = precision
        agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
        params, mstate = agent.init(jax.random.PRNGKey(0))
        opt = make_optimizer("sgd", 1e-2)
        step = build_train_step(agent, opt, "teacher")
        henv.reset_epoch()
        ep = henv.next_batch()
        _, _, _, logs = step(tables, params, opt.init(params), mstate, ep,
                             jax.random.PRNGKey(1))
        losses[precision] = float(logs["loss"])
    assert np.isfinite(losses["bf16"])
    assert np.allclose(losses["f32"], losses["bf16"], rtol=0.05)


def test_scanned_weighted_step_matches_sequential(synth_world, synth_dataset, tokenizer):
    """SPCL path through build_scanned_train_step: K fused weighted
    iterations == K sequential weighted steps (VERDICT r1 weak 3)."""
    from curriculum_learning_for_vln_tpu.agents import FollowerAgent

    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=3)
    tables = synth_world.device_tables()
    cfg = base_cfg()
    agent = FollowerAgent(cfg.MODEL.FOLLOWER, tokenizer.vocab_size(), FEAT_DIM, episode_len=6)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)

    K = 3
    batches = [henv.next_batch() for _ in range(K)]
    rngs = jax.random.split(jax.random.PRNGKey(7), K)
    w_rng = np.random.default_rng(5)
    ws = jnp.asarray(w_rng.uniform(0.1, 1.0, (K, 8)).astype(np.float32))
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    seq = build_train_step(agent, opt, "teacher", weighted=True)
    p_seq, o_seq, ms_seq = copy(params), copy(opt_state), mstate
    seq_losses = []
    for b, r, w in zip(batches, rngs, ws):
        p_seq, o_seq, ms_seq, logs = seq(tables, p_seq, o_seq, ms_seq, b, r, w)
        seq_losses.append(float(logs["loss"]))

    scan = build_scanned_train_step(agent, opt, "teacher", weighted=True)
    p_scan, o_scan, ms_scan, slogs = scan(
        tables, copy(params), copy(opt_state), mstate, stack_batches(batches), rngs, ws)

    assert np.allclose(seq_losses, np.asarray(slogs["loss"]), atol=1e-5)
    assert slogs["loss_per_sample"].shape == (K, 8)
    for a, b in zip(jax.tree_util.tree_leaves(p_seq), jax.tree_util.tree_leaves(p_scan)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # weighted + bucketed (the SPCL SCAN_ITERS production combination):
    # fused-K with a static IL length matches sequential bucketed steps
    # (loss equality with the full-length scan is covered separately by
    # test_il_bucketing_loss_identical, which sizes the bucket correctly)
    il = 4
    p_seq2, o_seq2 = copy(params), copy(opt_state)
    seq_losses2 = []
    for b, r, w in zip(batches, rngs, ws):
        p_seq2, o_seq2, _, logs = seq(tables, p_seq2, o_seq2, mstate, b, r, w, il_len=il)
        seq_losses2.append(float(logs["loss"]))
    p_scan2, _, _, slogs2 = scan(
        tables, copy(params), copy(opt_state), mstate, stack_batches(batches), rngs, ws,
        il_len=il)
    assert np.allclose(seq_losses2, np.asarray(slogs2["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_seq2), jax.tree_util.tree_leaves(p_scan2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_backend_gradients_in_train_step(synth_world, synth_dataset, tokenizer):
    """TPU.USE_PALLAS path: the fused-LSTM backend (interpret mode off-TPU)
    runs inside a full train step under jax.grad and matches XLA."""
    from curriculum_learning_for_vln_tpu.agents import FollowerAgent
    from curriculum_learning_for_vln_tpu.ops import rnn

    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=4, tokenizer=tokenizer, seed=4)
    tables = synth_world.device_tables()
    cfg = base_cfg()
    agent = FollowerAgent(cfg.MODEL.FOLLOWER, tokenizer.vocab_size(), FEAT_DIM, episode_len=4)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(9)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    try:
        rnn.set_backend("pallas")
        step_p = build_train_step(agent, opt, "teacher")
        p_pal, _, _, logs_p = step_p(tables, copy(params), copy(opt_state), mstate, ep, rng)
    finally:
        rnn.set_backend("xla")
    step_x = build_train_step(agent, opt, "teacher")
    p_xla, _, _, logs_x = step_x(tables, copy(params), copy(opt_state), mstate, ep, rng)

    assert np.allclose(float(logs_p["loss"]), float(logs_x["loss"]), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_pal), jax.tree_util.tree_leaves(p_xla)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_evaluator_batched_dtw_matches_per_item(synth_world, synth_dataset, tokenizer):
    """Evaluation.score's vectorized nDTW/SDTW equals the per-item DTW class
    on real trajectories (the fast path is now the production path)."""
    from curriculum_learning_for_vln_tpu.agents import TestAgent
    from curriculum_learning_for_vln_tpu.engine import Evaluation, run_eval
    from curriculum_learning_for_vln_tpu.utils.metrics import DTW

    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data[:18], batch_size=6, tokenizer=tokenizer, seed=2)
    agent = TestAgent(episode_len=10)
    results = run_eval(agent, {}, {}, synth_world.device_tables(), henv, jax.random.PRNGKey(0))

    ev = Evaluation(synth_world, [it for it in synth_dataset
                                  if it["path_id"] in {d["path_id"] for d in henv.data}])
    summary, scores = ev.score(results)

    # recompute per item with the reference-parity DTW class (score() visits
    # results in list order, so positions align)
    i = 0
    for item in results:
        gt = ev.gt[item["instr_id"].rsplit("_", 1)[0]]
        scan = gt["scan"]
        dist = ev._dist(scan)
        loc = lambda vp: ev._local(scan, vp)
        pred = [loc(p[0]) for p in item["trajectory"]]
        ref = [loc(v) for v in gt["path"]]
        ndtw, sdtw = DTW(lambda u, v: dist[u, v], threshold=3.0)(pred, ref, ["ndtw", "sdtw"])
        assert np.isclose(scores["ndtws"][i], ndtw, atol=1e-9)
        assert np.isclose(scores["sdtws"][i], sdtw, atol=1e-9)
        i += 1


@pytest.mark.parametrize("model,feedback", [
    ("FOLLOWER", "teacher"),
    ("SELF-MONITOR", "teacher"),
    ("ENVDROP", "sample"),   # IL phase truncates, RL keeps the full horizon
])
def test_il_bucketing_loss_identical(synth_world, synth_dataset, tokenizer, model, feedback):
    """A bucketed teacher-forced scan (T = max_hops+1 rounded up) computes
    the exact same training update as the full-length scan — steps past
    episode end are fully masked (ref early-exit: follower.py:168).
    MAX_EPISODE_LEN 9 > il_len (max hops is 6 in the synth dataset, so
    il_len <= 7) keeps the truncation-headroom assert biting while
    halving the scan-length-dominated XLA-CPU compile."""
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=6)
    tables = synth_world.device_tables()
    cfg = base_cfg(model)
    cfg.AGENT.MAX_EPISODE_LEN = 9
    cfg.AGENT.FEEDBACK = feedback
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)
    step = build_train_step(agent, opt, feedback)

    ep = henv.next_batch()
    il_len = henv.cur_batch_max_hops + 1
    assert il_len < 9, "need truncation headroom for the test to bite"
    rng = jax.random.PRNGKey(3)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    p_full, _, _, logs_full = step(tables, copy(params), copy(opt_state), mstate, ep, rng)
    p_trunc, _, _, logs_trunc = step(tables, copy(params), copy(opt_state), mstate, ep, rng,
                                     il_len=il_len)
    assert np.allclose(float(logs_full["loss"]), float(logs_trunc["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_full), jax.tree_util.tree_leaves(p_trunc)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("unroll", [2, 4])
def test_scan_unroll_training_update_identical(synth_world, synth_dataset, tokenizer, unroll):
    """TPU.SCAN_UNROLL only changes how XLA lowers the rollout loop — the
    training update must match the unroll=1 baseline (episode_len 7 is
    deliberately a multiple of neither 2 nor 4: jax handles the
    remainder for both factors)."""
    from curriculum_learning_for_vln_tpu.agents import common as AC

    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=6)
    tables = synth_world.device_tables()
    cfg = base_cfg("ENVDROP")
    cfg.AGENT.MAX_EPISODE_LEN = 7
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)

    ep = henv.next_batch()
    rng = jax.random.PRNGKey(3)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    # a fresh build_train_step per factor: the unroll global is read at
    # trace time, so reusing one jitted step would hit its compile cache
    try:
        AC.set_scan_unroll(1)
        step1 = build_train_step(agent, opt, "sample")
        p1, _, _, logs1 = step1(tables, copy(params), copy(opt_state), mstate, ep, rng)
        AC.set_scan_unroll(unroll)
        stepu = build_train_step(agent, opt, "sample")
        pu, _, _, logsu = stepu(tables, copy(params), copy(opt_state), mstate, ep, rng)
    finally:
        AC.set_scan_unroll(1)
    assert np.allclose(float(logs1["loss"]), float(logsu["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(pu)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("model,fb,T", [
    # T leaves several genuinely-frozen steps while keeping the compile
    # bill down (scan length dominates the 1-core XLA-CPU compile time):
    # measured with this exact env/seed, sampled episodes are ALL dead
    # from step 9 (alive counts 8,8,6,3,3,2,2,1,1,0,...), teacher-forced
    # ones stop at the goal by step 7 (max hops 6 in the synth dataset).
    ("ENVDROP", "sample", 13),       # 4 frozen steps exercised
    ("SELF-MONITOR", "teacher", 10), # 3 frozen steps
    ("FOLLOWER", "teacher", 10),
])
def test_scan_early_exit_update_identical(synth_world, synth_dataset, tokenizer,
                                          model, fb, T):
    """TPU.SCAN_EARLY_EXIT skips all-ended scan steps via lax.cond (the
    reference breaks its rollout loop there, follower.py:168); every
    loss-visible StepRecord field is masked at dead steps, so the training
    update must equal the no-exit baseline bit-for-bit up to float assoc.
    T is chosen so every batch fully ends well before the horizon — the
    frozen branch is genuinely exercised.

    f32 compute: under bf16 compute copies the cond changes XLA's fusion
    of the upcast chains, which moves grads by 1-2 bf16 ulps (and BN-MLP
    bias leaves have mathematically-zero gradients, so they are pure
    rounding noise in both variants) — f32 makes the semantic equality
    visible at 1e-5."""
    from curriculum_learning_for_vln_tpu.agents import common as AC

    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=9)
    tables = synth_world.device_tables()
    cfg = base_cfg(model)
    cfg.TPU.PRECISION = "f32"
    cfg.AGENT.MAX_EPISODE_LEN = T
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)

    ep = henv.next_batch()
    rng = jax.random.PRNGKey(4)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    try:
        AC.set_early_exit(False)
        step0 = build_train_step(agent, opt, fb)
        p0, _, _, logs0 = step0(tables, copy(params), copy(opt_state), mstate, ep, rng)
        AC.set_early_exit(True)
        step1 = build_train_step(agent, opt, fb)
        p1, _, _, logs1 = step1(tables, copy(params), copy(opt_state), mstate, ep, rng)
    finally:
        AC.set_early_exit(False)
    assert np.allclose(float(logs0["loss"]), float(logs1["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_scan_early_exit_trajectories_identical(synth_world, synth_dataset, tokenizer):
    """Eval-path equivalence: teacher-forced rollouts assemble the same
    reference-format trajectories with the early exit on and off."""
    from curriculum_learning_for_vln_tpu.agents import common as AC
    from curriculum_learning_for_vln_tpu.agents.common import (
        FEEDBACK_TEACHER, assemble_trajectories)

    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=9)
    tables = synth_world.device_tables()
    cfg = base_cfg("FOLLOWER")
    cfg.AGENT.MAX_EPISODE_LEN = 10
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    ep = henv.next_batch()
    rng = jax.random.PRNGKey(5)

    def run():
        _, result, _ = agent.rollout(params, mstate, tables, ep, rng,
                                     feedback=FEEDBACK_TEACHER, train=False)
        return assemble_trajectories(synth_world, ep, result, data)

    try:
        AC.set_early_exit(False)
        base = run()
        AC.set_early_exit(True)
        fast = run()
    finally:
        AC.set_early_exit(False)
    assert base == fast


def test_il_bucket_fn_selection(synth_world, synth_dataset, tokenizer):
    from curriculum_learning_for_vln_tpu.engine.trainer import il_bucket_fn

    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=6)
    cfg = base_cfg("ENVDROP")
    cfg.AGENT.MAX_EPISODE_LEN = 35
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    bucket = il_bucket_fn(cfg, agent)
    henv.next_batch()
    need = henv.cur_batch_max_hops + 1
    got = bucket(henv)
    if need <= 8:
        assert got == 8
    elif need <= 16:
        assert got == 16
    else:
        assert got is None
    # buckets off -> always full length
    cfg.TPU.IL_BUCKETS = ()
    assert il_bucket_fn(cfg, agent)(henv) is None
    # non-teacher single-rollout agents never bucket
    cfg2 = base_cfg("FOLLOWER")
    cfg2.AGENT.FEEDBACK = "sample"
    agent2 = build_agent(cfg2, tokenizer.vocab_size(), FEAT_DIM)
    assert il_bucket_fn(cfg2, agent2)(henv) is None


def test_obs_masks_knob_selects_fused_obs_backend(monkeypatch):
    """TPU.OBS_MASKS maps to the fused-obs kernel backend in
    configure_tpu_runtime (gated on a TPU default backend)."""
    import jax as _jax

    from curriculum_learning_for_vln_tpu.engine.loop import configure_tpu_runtime
    from curriculum_learning_for_vln_tpu.ops import fused_obs, rnn

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    cfg = base_cfg()
    cfg.TPU.COMPILATION_CACHE = ""
    try:
        for knob, backend in [("prng_shared", "pallas_prng_shared"),
                              ("ext", "pallas"), ("prng", "pallas_prng")]:
            cfg.TPU.OBS_MASKS = knob
            configure_tpu_runtime(cfg)
            assert fused_obs._BACKEND == backend
    finally:
        fused_obs.set_backend("xla")
        rnn.set_backend("xla")


def test_parallel_warmup_compiles_all_variants(synth_world, synth_dataset,
                                               tokenizer, monkeypatch):
    """TPU.PARALLEL_WARMUP fires every program variant concurrently with
    donated-buffer copies, leaves the env's batch stream untouched, and
    reports zero failures (gate forced open off-TPU)."""
    import jax as _jax

    from curriculum_learning_for_vln_tpu.engine import loop as L
    from curriculum_learning_for_vln_tpu.engine.trainer import il_bucket_fn

    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=6, tokenizer=tokenizer, seed=9)
    tables = synth_world.device_tables()
    cfg = base_cfg("ENVDROP")
    cfg.AGENT.FEEDBACK = "sample"
    # two buckets exercise the per-bucket variant compiles; small ones
    # keep the warmed scans short (compile time ~ scan length on 1 core)
    cfg.TPU.IL_BUCKETS = (4, 8)
    agent = build_agent(cfg, tokenizer.vocab_size(), FEAT_DIM)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)
    step = build_train_step(agent, opt, "sample")
    scan_step = build_scanned_train_step(agent, opt, "sample")
    eval_roll = L.build_eval_rollout(agent)
    il_bucket = il_bucket_fn(cfg, agent)

    ix0 = henv.ix
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    dt, errs = L.warmup_variants(
        cfg, agent, step, eval_roll, il_bucket, henv, tables, params,
        opt_state, mstate, jax.random.PRNGKey(1),
        scan_step=scan_step, scan_iters=2)
    assert errs == []
    assert dt > 0.0
    # batch stream untouched: iteration state fully restored
    assert henv.ix == ix0
    assert henv._cur_indices is None
    # knob off -> no-op
    cfg.TPU.PARALLEL_WARMUP = False
    dt2, errs2 = L.warmup_variants(
        cfg, agent, step, eval_roll, il_bucket, henv, tables, params,
        opt_state, mstate, jax.random.PRNGKey(1))
    assert (dt2, errs2) == (0.0, [])
