"""Classic (non-curriculum) training engine.

Rebuild of `tasks/R2R-judy/src/engine/trainer.py`: per-epoch iteration
loop, eval cadence on val_seen/val_unseen with argmax feedback, best-SR
checkpointing per split with superseded-file cleanup, rotating "latest"
checkpoint, scalar logging, optional per-round train-split evaluation —
but with the reference's trainer trio (train_follower /
train_selfmonitor / train_envdrop, trainer.py:46-518) collapsed into one
engine since the agent differences live in the compiled train step
(engine.loop).  Checkpoints additionally capture optimizer + RNG state
(reference gap, SURVEY §5).
"""
from __future__ import annotations

import logging
import os
import os.path as osp
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..parallel import mesh as M
from ..utils.logging_utils import ScalarWriter, clean_dir, prettyprint
from .checkpoint import load_checkpoint, save_checkpoint, wait_for_checkpoints
from .evaluator import Evaluation
from .loop import (build_eval_rollout, build_packed_train_step,
                   build_scanned_train_step, build_train_step, check_pool_valid,
                   concat_batches, configure_tpu_runtime, make_optimizer,
                   run_eval, stack_batches, warmup_variants)

logger = logging.getLogger("main.train")


def _flat_envs(envs):
    for env in envs:
        if env is None:
            continue
        if isinstance(env, dict):
            yield from env.values()
        else:
            yield env


def setup_mesh(cfg, batch_size: int, train_env=None, *eval_envs):
    """Build the production ('data','model') mesh from cfg.TPU and point
    every episode source at it: emitted batches come out sharded on the
    'data' axis, so the jitted train/eval steps run SPMD over all chips
    (gradient psum inserted by XLA).  Returns the mesh.

    The data axis must divide every env's batch size (eval envs may use a
    different size than cfg.TRAIN.BATCH_SIZE), so it is fit to their gcd.

    Multi-host: training batches stay sharded (each process contributes
    its shards — env.host_env multihost path); evaluation batches are
    replicated instead, so trajectory assembly and scoring stay host-local
    with no cross-host gather of results.
    """
    import math

    for env in _flat_envs((train_env,) + eval_envs):
        batch_size = math.gcd(batch_size, env.batch_size)
    mesh = M.mesh_from_config(cfg, batch_size)
    sh = M.batch_sharding(mesh)
    eval_sh = M.replicated(mesh) if jax.process_count() > 1 else sh
    for env in _flat_envs((train_env,)):
        env.set_sharding(sh)
    for env in _flat_envs(eval_envs):
        env.set_sharding(eval_sh)
    logger.info("Device mesh: data=%d model=%d (of %d devices, %d processes)",
                mesh.shape["data"], mesh.shape["model"], jax.device_count(),
                jax.process_count())
    return mesh


def dedup_by_path(items):
    seen, out = set(), []
    for it in items:
        if it["path_id"] not in seen:
            seen.add(it["path_id"])
            out.append(it)
    return out


def il_bucket_fn(cfg, agent):
    """Episode-length bucketing for teacher-forced rollouts (NEXT.md item 3,
    ref early-exit semantics: follower.py:168).  Returns a callable
    env -> static IL scan length (or None = full), valid only where the
    trajectory is teacher-driven: the whole step for FEEDBACK=teacher, the
    IL phase for EnvDrop (engine.loop handles the phase split)."""
    buckets = tuple(getattr(cfg.TPU, "IL_BUCKETS", ()) or ()) if hasattr(cfg, "TPU") else ()
    applies = cfg.AGENT.FEEDBACK == "teacher" or agent.name == "ENVDROP"
    if not buckets or not applies:
        return lambda env: None
    full = agent.episode_len

    def bucket(env) -> Optional[int]:
        need = env.cur_batch_max_hops + 1  # +1 for the STOP step
        for b in sorted(buckets):
            if need <= b < full:
                return b
        return None  # full length

    return bucket


def check_the_code(cfg, tables, valid_env) -> dict:
    """Sanity check (ref: trainer.py:27-39): model-free teacher-following
    through val_unseen, scored; near-perfect SR validates the plumbing."""
    from ..agents import TestAgent

    agent = TestAgent(episode_len=cfg.AGENT.MAX_EPISODE_LEN)
    henv = valid_env["val_unseen"]
    results = run_eval(agent, {}, {}, tables, henv, jax.random.PRNGKey(0))
    evaluator = Evaluation(henv.world, dedup_by_path(henv.data))
    summary, _ = evaluator.score(results)
    prettyprint({"val_unseen": summary})
    return summary


class ClassicTrainer:
    """Dispatch-free classic trainer (ref: engine/__init__.py:6-17)."""

    def select_env(self, train_env, ep: int):
        """Curriculum hook: which episode source to use this epoch."""
        return train_env

    def iter_env(self, epoch_env, train_env):
        """Per-iteration curriculum hook (AutoCurriculum samples a round
        arm here); the default uses the epoch's env."""
        return epoch_env

    def on_epoch_losses(self, losses) -> None:
        """Post-epoch hook receiving the per-iteration losses in draw
        order (bandit reward feedback; syncs stay batched per epoch)."""

    def supports_packed_rl(self) -> bool:
        """Whether TPU.PACKED_RL may replace this trainer's iteration.
        AutoCurriculum overrides to False: its bandit attributes one
        reward per drawn batch, which a multi-batch packed iteration
        would misalign."""
        return True

    def curriculum_state(self):
        """Curriculum state to embed in checkpoints (None = stateless).
        SPCL overrides in its own trainer; AutoCurriculum persists the
        bandit here — the reference loses all curriculum state on resume
        (SURVEY §5 gap)."""
        return None

    def load_curriculum_state(self, state) -> None:
        pass

    def train(self, cfg, agent, tsboard_dir, train_env, valid_env,
              eval_train: bool = False, eval_train_env: Optional[Dict] = None,
              seed: int = 2020, max_iters_override: Optional[int] = None):
        configure_tpu_runtime(cfg)
        ckpt_backend = getattr(cfg.TPU, "CKPT_BACKEND", "pickle") if hasattr(cfg, "TPU") else "pickle"
        ckpt_async = getattr(cfg.TPU, "CKPT_ASYNC", False) if hasattr(cfg, "TPU") else False
        first_env = self.select_env(train_env, cfg.TRAIN.START_EPOCH)
        if isinstance(first_env, dict):  # per-iteration curricula keep the round dict
            first_env = next(iter(first_env.values()))
        tables = first_env.world.device_tables(cfg.TPU.PRECISION if hasattr(cfg, "TPU") else "f32")
        train_cfg = cfg.TRAIN

        # production data parallelism: batches sharded over 'data', params
        # and world tables replicated; one SPMD program over all chips
        mesh = setup_mesh(cfg, train_cfg.BATCH_SIZE, train_env, valid_env, eval_train_env)
        tables = M.replicate(tables, mesh)
        # multi-host: only process 0 writes logs/checkpoints/tables
        is_main = jax.process_index() == 0

        time_str = time.strftime("%Y-%m%d-%H:%M", time.localtime())
        writer = ScalarWriter(osp.join(tsboard_dir, time_str)
                              if (tsboard_dir and is_main) else None)

        rng = jax.random.PRNGKey(seed)
        rng, init_rng = jax.random.split(rng)
        params, model_state = agent.init(init_rng)
        params = M.replicate(params, mesh)
        model_state = M.replicate(model_state, mesh)
        optimizer = make_optimizer(train_cfg.OPTIM, train_cfg.LR)
        opt_state = optimizer.init(params)
        start_epoch = train_cfg.START_EPOCH

        ckpt_root = cfg.OUTPUT.CKPT_DIR or "snapshots/checkpoints"
        if cfg.OUTPUT.RESUME:
            ckpt_path = osp.join(ckpt_root, f"{cfg.OUTPUT.RESUME}.ckpt")
            logger.info("Resuming %s from %s", cfg.MODEL.NAME, ckpt_path)
            bundle = load_checkpoint(ckpt_path)
            params = M.replicate(bundle["params"], mesh)
            if bundle.get("opt_state") is not None:
                opt_state = M.replicate(bundle["opt_state"], mesh)
            if bundle.get("model_state") is not None:
                model_state = M.replicate(bundle["model_state"], mesh)
            if bundle.get("rng") is not None:
                rng = jax.numpy.asarray(bundle["rng"])
            if bundle.get("curriculum") is not None:
                self.load_curriculum_state(bundle["curriculum"])
            start_epoch = bundle.get("epoch", 0) + 1

        scan_iters = getattr(cfg.TPU, "SCAN_ITERS", 1) if hasattr(cfg, "TPU") else 1
        # packed RL (continuous batching, agents/packed.py): each iteration
        # draws `packed` batches; the RL arm rolls them out as one pool
        packed = getattr(cfg.TPU, "PACKED_RL", 0) if hasattr(cfg, "TPU") else 0
        if packed >= 2 and (agent.name != "ENVDROP"
                            or cfg.AGENT.FEEDBACK != "sample"
                            or not self.supports_packed_rl()
                            or scan_iters > 1):
            logger.info("TPU.PACKED_RL=%d ignored (needs ENVDROP + sample "
                        "feedback, a classic/naive trainer, SCAN_ITERS=1)",
                        packed)
            packed = 0
        if packed >= 2:
            packed_step = build_packed_train_step(agent, optimizer)
        if scan_iters > 1:
            scan_step = build_scanned_train_step(
                agent, optimizer, cfg.AGENT.FEEDBACK,
                progmonitor_weight=train_cfg.PROGMONITOR_WEIGHT)
        train_step = build_train_step(
            agent, optimizer, cfg.AGENT.FEEDBACK,
            progmonitor_weight=train_cfg.PROGMONITOR_WEIGHT,
        )
        eval_rollout = build_eval_rollout(agent)
        il_bucket = il_bucket_fn(cfg, agent)
        # overlap the server-side first-execution compiles of every
        # program variant this run will dispatch (~5.6x cold-start cut
        # through the relay; loop.py::parallel_warmup)
        if packed >= 2:
            logger.info("TPU.PACKED_RL=%d: packed iteration compiles at "
                        "first dispatch (warmup covers the eval rollout)", packed)
        warmup_variants(cfg, agent,
                        None if packed >= 2 else train_step,
                        eval_rollout, il_bucket,
                        first_env, tables, params, opt_state, model_state, rng,
                        scan_step=scan_step if scan_iters > 1 else None,
                        scan_iters=scan_iters, logger=logger)

        valid_evaluator = {
            key: Evaluation(env.world, dedup_by_path(env.data)) for key, env in valid_env.items()
        }
        best_val = {key: {"success_rate": 0.0} for key in valid_env}
        train_evaluator = None
        if eval_train:
            assert eval_train_env is not None, "Please give the eval environment!"
            train_evaluator = {
                key: Evaluation(env.world, dedup_by_path(env.data), data_name="CLR2R")
                for key, env in eval_train_env.items()
            }

        output_ckpt_dir = osp.join(ckpt_root, time_str)
        os.makedirs(output_ckpt_dir, exist_ok=True)
        logger.info("Checkpoints at %s", output_ckpt_dir)

        start_time = last_time = time.time()
        iters = max_iters_override or train_cfg.ITER_PER_EPOCH
        profile_dir = getattr(cfg.TPU, "PROFILE_DIR", "") if hasattr(cfg, "TPU") else ""
        pool_checked = False  # packed-pool contract checked once per run

        for ep in range(start_epoch, train_cfg.MAX_EPOCH + 1):
            if profile_dir and ep == start_epoch + 1 and is_main:
                # trace the second epoch (first epoch carries compilation)
                from ..utils.profiling import trace as profiler_trace
                profile_ctx = profiler_trace(profile_dir)
                logger.info("Capturing jax.profiler trace of epoch %d -> %s", ep, profile_dir)
            else:
                import contextlib
                profile_ctx = contextlib.nullcontext()
            epoch_env = self.select_env(train_env, ep)
            # keep per-iteration logs on device; a float() per iteration
            # would force a device sync each step and serialize the loop.
            # Entries stay in draw order (single logs or stacked [K] scan
            # logs) so curriculum hooks can align rewards to iterations.
            log_entries = []
            with profile_ctx:
                it = 0
                while it < iters:
                    if packed >= 2:
                        # packed RL: the IL arm trains on the first batch,
                        # the RL arm rolls all `packed` batches out as one
                        # continuously-refilled pool (agents/packed.py)
                        env_i = self.iter_env(epoch_env, train_env)
                        raws = [env_i.next_batch()]
                        il_len = il_bucket(env_i)
                        for _ in range(packed - 1):
                            raws.append(env_i.next_batch())
                        pool = concat_batches(raws)
                        if not pool_checked:  # once per run, one device fetch
                            check_pool_valid(pool)
                            pool_checked = True
                        rng, rng_it = jax.random.split(rng)
                        params, opt_state, model_state, logs = packed_step(
                            tables, params, opt_state, model_state, raws[0],
                            pool, rng_it, il_len=il_len)
                        log_entries.append({k: v for k, v in logs.items()
                                            if k != "loss_per_sample"})
                        it += 1
                    elif scan_iters > 1 and iters - it >= scan_iters:
                        raw, il_lens = [], []
                        for _ in range(scan_iters):
                            env_i = self.iter_env(epoch_env, train_env)
                            raw.append(env_i.next_batch())
                            il_lens.append(il_bucket(env_i))
                        batches = M.shard_stacked_batch(stack_batches(raw), mesh)
                        # one static IL length for the fused K iterations
                        il_len = None if None in il_lens else max(il_lens)
                        rng, rng_it = jax.random.split(rng)
                        rngs = jax.random.split(rng_it, scan_iters)
                        params, opt_state, model_state, slogs = scan_step(
                            tables, params, opt_state, model_state, batches, rngs,
                            il_len=il_len)
                        log_entries.append({k: v for k, v in slogs.items() if k != "loss_per_sample"})
                        it += scan_iters
                    else:
                        env_i = self.iter_env(epoch_env, train_env)
                        batch = env_i.next_batch()
                        il_len = il_bucket(env_i)
                        rng, rng_it = jax.random.split(rng)
                        params, opt_state, model_state, logs = train_step(
                            tables, params, opt_state, model_state, batch, rng_it,
                            il_len=il_len
                        )
                        log_entries.append({k: v for k, v in logs.items() if k != "loss_per_sample"})
                        it += 1
                host_entries = jax.device_get(log_entries)
            epoch_losses = []
            extra_logs = {"entropy": 0.0, "critic_loss": 0.0, "total_actions": 0.0, "progress_loss": 0.0}
            for entry in host_entries:
                loss = np.atleast_1d(entry["loss"])
                epoch_losses.extend(float(x) for x in loss)
                for k in extra_logs:
                    if k in entry:
                        extra_logs[k] += float(np.sum(entry[k]))
            self.on_epoch_losses(epoch_losses)

            epoch_loss = sum(epoch_losses)
            avg_iter = epoch_loss / len(epoch_losses)
            writer.add_scalar("train/ml_epoch", epoch_loss, ep)
            writer.add_scalar("train/ml_iter_avg", avg_iter, ep)
            writer.add_scalar("train/ml_iter_max", max(epoch_losses), ep)
            writer.add_scalar("train/ml_iter_min", min(epoch_losses), ep)
            if agent.name == "SELF-MONITOR":
                writer.add_scalar("train/progress_loss", extra_logs["progress_loss"], ep)
            if agent.name == "ENVDROP":
                total = max(extra_logs["total_actions"], 1.0)
                writer.add_scalar("train/critic_loss", extra_logs["critic_loss"] / total, ep)
                writer.add_scalar("train/policy_entropy", extra_logs["entropy"] / total, ep)
                writer.add_scalar("train/total_actions", total, ep)

            cost = (time.time() - last_time) / 60
            remain = ((time.time() - start_time) / (60 * (ep + 1 - start_epoch))) * (train_cfg.MAX_EPOCH - ep)
            msg = (f"Epoch [{ep}/{train_cfg.MAX_EPOCH}], {cost:.2f}min/ep, remaining {remain:.2f}min, "
                   f"loss {epoch_loss:.4f} (avg {avg_iter:.4f})")
            print(msg)
            logger.info(msg)

            if ep % train_cfg.EVAL_INTERVAL == 0 and eval_train and train_evaluator:
                summary = {}
                for key, env in eval_train_env.items():
                    rng, rng_e = jax.random.split(rng)
                    results = run_eval(agent, params, model_state, tables, env, rng_e, eval_rollout)
                    scores, _ = train_evaluator[key].score(results)
                    summary[key] = scores
                    for mk in ("lengths", "steps", "nav_error", "oracle_error",
                               "success_rate", "oracle_rate", "spl", "ndtw", "sdtw"):
                        writer.add_scalar(f"eval_{key}/{mk}", scores[mk], ep)
                if is_main:
                    prettyprint(summary)

            if ep % train_cfg.EVAL_INTERVAL == 0:
                summary = {}
                for key, env in valid_env.items():
                    rng, rng_e = jax.random.split(rng)
                    results = run_eval(agent, params, model_state, tables, env, rng_e, eval_rollout)
                    scores, _ = valid_evaluator[key].score(results)
                    summary[key] = scores
                    for mk in ("lengths", "steps", "nav_error", "oracle_error",
                               "success_rate", "oracle_rate", "spl", "ndtw", "sdtw"):
                        writer.add_scalar(f"{key}/{mk}", scores[mk], ep)
                    if key in best_val and scores["success_rate"] > best_val[key]["success_rate"]:
                        # keep the FULL metric row of the best-SR epoch
                        # (fidelity studies read ndtw/cls off it too)
                        best_val[key] = dict(scores)
                        if is_main:
                            path = osp.join(output_ckpt_dir, f"best_{key}_SR:{scores['success_rate']:.4f}.ckpt")
                            save_checkpoint(path, params, opt_state, model_state, rng, ep,
                                            cfg_yaml=cfg.dump(), backend=ckpt_backend,
                                            async_write=ckpt_async,
                                            pre_tasks=(lambda d=output_ckpt_dir, k=f"best_{key}":
                                                       clean_dir(d, clean_key=k),))
                            logger.info("Saved best %s SR=%.4f -> %s", key, scores["success_rate"], path)
                if is_main:
                    prettyprint(summary)

            if is_main:
                cur_state = self.curriculum_state()
                save_checkpoint(osp.join(output_ckpt_dir, f"latest_ep{ep}.ckpt"),
                                params, opt_state, model_state, rng, ep,
                                curriculum=cur_state, cfg_yaml=cfg.dump(), backend=ckpt_backend,
                                async_write=ckpt_async,
                                pre_tasks=(lambda d=output_ckpt_dir:
                                           clean_dir(d, clean_key="latest_ep"),))
                # stable "latest" for OUTPUT.RESUME=latest
                save_checkpoint(osp.join(ckpt_root, "latest.ckpt"),
                                params, opt_state, model_state, rng, ep,
                                curriculum=cur_state, cfg_yaml=cfg.dump(), backend=ckpt_backend,
                                async_write=ckpt_async)
            last_time = time.time()

        if ckpt_async:
            wait_for_checkpoints()
        writer.close()
        return params, model_state, best_val
