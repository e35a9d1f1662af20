"""Curriculum training engines: naive rounds and self-paced (SPCL).

Rebuild of `tasks/R2R-judy/src/engine/curriculum.py`:

* NaiveCurriculum (:27-179): round k = 1 + (epoch - 1) // switch_epoch,
  capped at round 5; each round's episode source holds the *cumulative*
  splits 1..k (built by the CLI, ref main.py:66-69).  Implemented as a
  per-epoch env-selection hook over the classic trainer.

* SelfPacedCurriculum (:183-457): SPCL (Jiang et al., AAAI'15) —
  alternate between training with per-sample weighted losses and the
  closed-form weight update (pace function + projection onto the
  curriculum region {w : a.w <= c}).  Here the weight vector, per-item
  loss table and the solver all live on device: the update is one jitted
  vector program (ref loop: curriculum.py:403-448).  Curriculum state is
  checkpointed (weights, lambda, per-item losses) — a reference gap where
  resume silently restarted the pacing schedule.
"""
from __future__ import annotations

import functools
import logging
import os
import os.path as osp
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import mesh as M
from ..utils.logging_utils import ScalarWriter, clean_dir, prettyprint
from .checkpoint import load_checkpoint, save_checkpoint
from .evaluator import Evaluation
from .loop import (build_eval_rollout, build_packed_train_step,
                   build_scanned_train_step, build_train_step, check_pool_valid,
                   concat_batches, configure_tpu_runtime, make_optimizer,
                   run_eval, stack_batches, warmup_variants)
from .trainer import ClassicTrainer, dedup_by_path, il_bucket_fn, setup_mesh

logger = logging.getLogger("main.curriculum")


class NaiveCurriculum(ClassicTrainer):
    def __init__(self, switch_epoch: int = 20, reverse: bool = False):
        self.switch_epoch = switch_epoch
        self.reverse = reverse

    def select_env(self, train_env, ep: int):
        """(ref: curriculum.py:176-179)"""
        idx = 1 + (ep - 1) // self.switch_epoch
        key = f"round_{idx}" if idx <= 4 else "round_5"
        return train_env[key]


# ---------------------------------------------------------------------------
# SPCL weight solver (pure device function)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("pace_func",))
def spcl_update_weight(
    weight: jnp.ndarray,    # [N]
    a: jnp.ndarray,         # [N] difficulty
    c: jnp.ndarray,         # scalar capacity
    lamb: jnp.ndarray,      # scalar model age
    loss: jnp.ndarray,      # [N] latest per-item losses
    pace_func: str = "linear",
) -> jnp.ndarray:
    """One SPCL weight update (ref: curriculum.py:428-448)."""
    zeta = 1.0 - lamb
    hard = loss >= lamb
    if pace_func == "log":
        easy_w = jnp.log(loss + zeta) / jnp.log(zeta)
    elif pace_func == "linear":
        easy_w = 1.0 - loss / lamb
    elif pace_func == "binary":
        easy_w = jnp.ones_like(loss)
    else:
        raise NotImplementedError(pace_func)
    w = jnp.where(hard, 0.01, easy_w)
    w = jnp.maximum(w, 0.01)
    # projection onto the curriculum region {w : a.w <= c}
    aw = jnp.dot(a, w)
    a_norm_sq = jnp.dot(a, a)
    w_proj = w + a * (c - aw) / a_norm_sq
    w_proj = jnp.where(w_proj <= 0.0, 0.001, w_proj)
    return jnp.where(aw > c, w_proj, w)


def spcl_update_lambda(lamb: jnp.ndarray, stepsize: float, loss_max: jnp.ndarray) -> jnp.ndarray:
    """lambda += mu (or mu/2 once lambda reaches the max loss;
    ref: curriculum.py:406-407)."""
    return jnp.where(lamb < loss_max, lamb + stepsize, lamb + stepsize / 2.0)


@jax.jit
def _record_item_losses(loss_for_item, idx, per_sample):
    """Scatter the latest per-item losses (ref: curriculum.py:310-314).
    Jitted so the sharded per-sample vector from the DP train step and the
    replicated record table reshard cleanly in one dispatch."""
    return loss_for_item.at[idx].set(per_sample)


class SelfPacedCurriculum:
    """SPCL trainer over a CLR2RBatchEnv."""

    def __init__(self, train_env, pace_func: str = "linear",
                 init_lamb: float = 0.1, init_weight_ctrl: float = 0.5,
                 miu: float = 0.1, interval: int = 5, strategy: str = "epoch",
                 burn_in: int = 10):
        assert strategy == "epoch", "only the reference's epoch strategy is implemented"
        self.train_env = train_env
        self.pace_func = pace_func
        self.dim = len(train_env)
        self.a = jnp.asarray(train_env.a)
        self.c = jnp.asarray(train_env.c)
        self.lamb = jnp.asarray(float(init_lamb))
        # init weights: WCTRL except rounds <= 2 start at 1.0 (ref: :214-220)
        w = np.full(self.dim, init_weight_ctrl, dtype=np.float32)
        w[train_env.a <= 2] = 1.0
        self.weight = jnp.asarray(w)
        self.stepsize = miu
        self.burn_in = burn_in
        self.update_interval = interval

    # -- state (for checkpoint) -------------------------------------------
    def state_dict(self, loss_for_item) -> dict:
        return {
            "weight": np.asarray(self.weight),
            "lamb": np.asarray(self.lamb),
            "loss_for_item": np.asarray(loss_for_item),
        }

    def load_state_dict(self, state: dict):
        self.weight = jnp.asarray(state["weight"])
        self.lamb = jnp.asarray(state["lamb"])
        return jnp.asarray(state["loss_for_item"])

    def train(self, cfg, agent, tsboard_dir, train_env, valid_env,
              eval_train: bool = False, eval_train_env: Optional[Dict] = None,
              seed: int = 2020, max_iters_override: Optional[int] = None):
        configure_tpu_runtime(cfg)
        ckpt_backend = getattr(cfg.TPU, "CKPT_BACKEND", "pickle") if hasattr(cfg, "TPU") else "pickle"
        tables = train_env.world.device_tables(cfg.TPU.PRECISION if hasattr(cfg, "TPU") else "f32")
        train_cfg = cfg.TRAIN

        # production DP: same mesh contract as ClassicTrainer — batches and
        # SPCL weight gathers sharded on 'data', everything else replicated
        mesh = setup_mesh(cfg, train_cfg.BATCH_SIZE, train_env, valid_env, eval_train_env)
        tables = M.replicate(tables, mesh)
        batch_sh = M.batch_sharding(mesh)
        self.weight = M.replicate(self.weight, mesh)
        is_main = jax.process_index() == 0  # multi-host: process 0 writes

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
        loss_for_item = M.replicate(jnp.zeros(self.dim), mesh)

        ckpt_root = cfg.OUTPUT.CKPT_DIR or "snapshots/checkpoints"
        if cfg.OUTPUT.RESUME:
            bundle = load_checkpoint(osp.join(ckpt_root, f"{cfg.OUTPUT.RESUME}.ckpt"))
            params = M.replicate(bundle["params"], mesh)
            if bundle.get("opt_state") is not None:
                opt_state = M.replicate(bundle["opt_state"], mesh)
            if bundle.get("model_state") is not None:
                model_state = M.replicate(bundle["model_state"], mesh)
            if bundle.get("rng") is not None:
                rng = jnp.asarray(bundle["rng"])
            if bundle.get("curriculum") is not None:
                loss_for_item = self.load_state_dict(bundle["curriculum"])
            start_epoch = bundle.get("epoch", 0) + 1

        train_step = build_train_step(
            agent, optimizer, cfg.AGENT.FEEDBACK,
            progmonitor_weight=train_cfg.PROGMONITOR_WEIGHT, weighted=True,
        )
        scan_iters = getattr(cfg.TPU, "SCAN_ITERS", 1) if hasattr(cfg, "TPU") else 1
        # packed RL under SPCL (TPU.PACKED_RL): weighted objective extends
        # dot(w, ml+rl) to dot(w_il, ml_vec) + dot(w_pool, rl_per_episode)
        packed = getattr(cfg.TPU, "PACKED_RL", 0) if hasattr(cfg, "TPU") else 0
        if packed >= 2 and (agent.name != "ENVDROP"
                            or cfg.AGENT.FEEDBACK != "sample" or scan_iters > 1):
            logger.info("TPU.PACKED_RL=%d ignored under SPCL (needs ENVDROP + "
                        "sample feedback, SCAN_ITERS=1)", packed)
            packed = 0
        if packed >= 2:
            packed_step = build_packed_train_step(agent, optimizer, weighted=True)
        if scan_iters > 1:
            scan_step = build_scanned_train_step(
                agent, optimizer, cfg.AGENT.FEEDBACK,
                progmonitor_weight=train_cfg.PROGMONITOR_WEIGHT, weighted=True)
        eval_rollout = build_eval_rollout(agent)
        il_bucket = il_bucket_fn(cfg, agent)
        # overlap server-side first-execution compiles (weighted variants);
        # a packed run never dispatches the per-batch weighted step, so
        # don't burn server-side compiles on it (mirrors ClassicTrainer)
        warmup_variants(cfg, agent, None if packed >= 2 else train_step,
                        eval_rollout, il_bucket,
                        train_env, tables, params, opt_state, model_state, rng,
                        scan_step=scan_step if scan_iters > 1 else None,
                        scan_iters=scan_iters, weighted=True, logger=logger)
        valid_evaluator = {
            key: Evaluation(env.world, dedup_by_path(env.data)) for key, env in valid_env.items()
        }
        best_val = {key: {"success_rate": 0.0} for key in valid_env}

        output_ckpt_dir = osp.join(ckpt_root, time_str)
        os.makedirs(output_ckpt_dir, exist_ok=True)
        iters = max_iters_override or train_cfg.ITER_PER_EPOCH
        start_time = last_time = time.time()
        pool_checked = False  # packed-pool contract checked once per run

        for ep in range(start_epoch, train_cfg.MAX_EPOCH + 1):
            device_losses = []
            it = 0
            while it < iters:
                if scan_iters > 1 and iters - it >= scan_iters:
                    # K weighted iterations fused into one dispatch
                    batches, idxs, il_lens = [], [], []
                    for _ in range(scan_iters):
                        batches.append(train_env.next_batch())
                        idxs.append(np.asarray(train_env.cur_batch_index))
                        il_lens.append(il_bucket(train_env))
                    eps = M.shard_stacked_batch(stack_batches(batches), mesh)
                    il_len = None if None in il_lens else max(il_lens)
                    idx_stack = jnp.asarray(np.stack(idxs))
                    ws = jax.device_put(self.weight[idx_stack], M.stacked_batch_sharding(mesh))
                    rng, rng_it = jax.random.split(rng)
                    rngs = jax.random.split(rng_it, scan_iters)
                    params, opt_state, model_state, slogs = scan_step(
                        tables, params, opt_state, model_state, eps, rngs, ws,
                        il_len=il_len)
                    device_losses.append(slogs["loss"])  # [K]
                    # scatter per-item losses in iteration order (an item can
                    # recur across the K batches; last write must win)
                    for k in range(scan_iters):
                        loss_for_item = _record_item_losses(
                            loss_for_item, idx_stack[k], slogs["loss_per_sample"][k])
                    it += scan_iters
                elif packed >= 2:
                    raws = [train_env.next_batch()]
                    idx = jnp.asarray(train_env.cur_batch_index)
                    il_len = il_bucket(train_env)
                    pool_idx = [np.asarray(train_env.cur_batch_index)]
                    for _ in range(packed - 1):
                        raws.append(train_env.next_batch())
                        pool_idx.append(np.asarray(train_env.cur_batch_index))
                    pool = concat_batches(raws)
                    if not pool_checked:  # once per run, one device fetch
                        check_pool_valid(pool)
                        pool_checked = True
                    w_il = jax.device_put(self.weight[idx], batch_sh)
                    # device-side gather (a host np.asarray here would force
                    # a per-iteration device sync)
                    w_pool = self.weight[jnp.asarray(np.concatenate(pool_idx))]
                    rng, rng_it = jax.random.split(rng)
                    params, opt_state, model_state, logs = packed_step(
                        tables, params, opt_state, model_state, raws[0], pool,
                        rng_it, w_il, w_pool, il_len=il_len)
                    device_losses.append(logs["loss"])
                    # per-item record for the IL batch (refresh rate 1/packed)
                    loss_for_item = _record_item_losses(loss_for_item, idx, logs["loss_per_sample"])
                    it += 1
                else:
                    batch = train_env.next_batch()
                    idx = jnp.asarray(train_env.cur_batch_index)
                    w_batch = jax.device_put(self.weight[idx], batch_sh)
                    rng, rng_it = jax.random.split(rng)
                    params, opt_state, model_state, logs = train_step(
                        tables, params, opt_state, model_state, batch, rng_it, w_batch,
                        il_len=il_bucket(train_env)
                    )
                    device_losses.append(logs["loss"])  # sync deferred to epoch end
                    # record latest per-item loss (ref: curriculum.py:310-314)
                    loss_for_item = _record_item_losses(loss_for_item, idx, logs["loss_per_sample"])
                    it += 1
            record_losses = [float(x)
                             for arr in jax.device_get(device_losses)
                             for x in np.atleast_1d(arr)]

            epoch_loss = sum(record_losses)
            avg_iter = epoch_loss / len(record_losses)
            writer.add_scalar("train/ml_epoch", epoch_loss, ep)
            writer.add_scalar("train/ml_iter_avg", avg_iter, ep)
            writer.add_scalar("train/ml_iter_max", max(record_losses), ep)
            writer.add_scalar("train/ml_iter_min", min(record_losses), ep)

            cost = (time.time() - last_time) / 60
            msg = f"[SPCL] Epoch [{ep}/{train_cfg.MAX_EPOCH}], {cost:.2f}min/ep, loss {epoch_loss:.4f}"
            print(msg)
            logger.info(msg)

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
                        best_val[key]["success_rate"] = scores["success_rate"]
                        if is_main:
                            path = osp.join(output_ckpt_dir, f"best_{key}_SR:{scores['success_rate']:.4f}.ckpt")
                            clean_dir(output_ckpt_dir, clean_key=f"best_{key}")
                            save_checkpoint(path, params, opt_state, model_state, rng, ep,
                                            curriculum=self.state_dict(loss_for_item), cfg_yaml=cfg.dump(), backend=ckpt_backend)
                if is_main:
                    prettyprint(summary)

            # SPCL parameter update (ref: curriculum.py:403-415)
            if ep >= self.burn_in and ep % self.update_interval == 0:
                loss_np = np.asarray(loss_for_item)
                self.lamb = spcl_update_lambda(self.lamb, self.stepsize, loss_for_item.max())
                self.weight = spcl_update_weight(
                    self.weight, self.a, self.c, self.lamb, loss_for_item, pace_func=self.pace_func
                )
                q = np.percentile(loss_np, [0, 25, 50, 75, 100])
                logger.info("SPCL lambda=%s loss quantiles=%s", float(self.lamb), q.tolist())
                writer.add_histogram("sample_weight", np.asarray(self.weight), ep)
                writer.add_histogram("sample_loss", loss_np, ep)
                w_np = np.asarray(self.weight)
                a_np = np.asarray(self.a)
                for k in range(1, 6):
                    wk = w_np[a_np == k]
                    if wk.size:
                        logger.info("Round[%d] weight avg %.3f min %.3f max %.3f",
                                    k, wk.mean(), wk.min(), wk.max())

            if is_main:
                save_checkpoint(osp.join(ckpt_root, "latest.ckpt"),
                                params, opt_state, model_state, rng, ep,
                                curriculum=self.state_dict(loss_for_item), cfg_yaml=cfg.dump(), backend=ckpt_backend)
            last_time = time.time()

        writer.close()
        return params, model_state, best_val
