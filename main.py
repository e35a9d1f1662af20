"""CLI entry point — preserves the reference's invocation contract
(`tasks/R2R-judy/main.py:136-151`):

    python main.py --config-file configs/envdrop/envdrop_config.yaml \
        --seed 2020 [KEY VALUE ...]

Config = defaults <- YAML file <- dotted-path CLI overrides.
"""
from __future__ import annotations

import argparse
import os
import random
import sys
import traceback

import numpy as np

from curriculum_learning_for_vln_tpu import engine, pipeline
from curriculum_learning_for_vln_tpu.agents import build_agent
from curriculum_learning_for_vln_tpu.utils import logging_utils
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults


def main(args, cfg):
    logger = logging_utils.get_main_logger(cfg.OUTPUT.LOG_DIR, cfg.MODEL.NAME)

    random.seed(args.seed)
    np.random.seed(args.seed)
    pipeline.setup_vocab(cfg, seed=args.seed)
    logger.info("[1] seed %d, config %s", args.seed, args.config_file)

    import jax

    # Honor a requested-CPU environment (e.g. virtual-device DP testing via
    # xla_force_host_platform_device_count) even when a site hook registered
    # an experimental TPU backend first — it would win the default otherwise.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Multi-host entry point (SURVEY §7.2 step 9): explicit env-var driven
    # bootstrap (VLN_COORDINATOR host:port + VLN_NUM_PROCESSES +
    # VLN_PROCESS_ID), or VLN_MULTIHOST=1 for auto-detection on TPU pods.
    # Must run before the first device query.
    if os.environ.get("VLN_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["VLN_COORDINATOR"],
            num_processes=int(os.environ["VLN_NUM_PROCESSES"]),
            process_id=int(os.environ["VLN_PROCESS_ID"]),
        )
        logger.info("[2] multi-host: process %d/%d", jax.process_index(), jax.process_count())
    elif os.environ.get("VLN_MULTIHOST") == "1":
        jax.distributed.initialize()
        logger.info("[2] multi-host (auto): process %d/%d", jax.process_index(), jax.process_count())
    logger.info("[2] devices: %s", jax.devices())

    tok = pipeline.build_tokenizer(cfg)
    logger.info("[3] tokenizer ready, vocab size %d", tok.vocab_size())

    world, train_env, valid_env, feat_dim = pipeline.build_environments(cfg, tok, seed=args.seed)
    logger.info("[4] world compiled (%d nodes) and environments created", world.num_nodes)

    if args.check_the_code:
        engine.check_the_code(cfg, world.device_tables(cfg.TPU.PRECISION), valid_env)
        return

    if args.beam > 0:
        # beam-search inference + speaker rescoring over the val splits
        # (the reference's beam_search is latent — base.py:452-464)
        from curriculum_learning_for_vln_tpu.engine.beam_eval import run_beam_eval

        agent = build_agent(cfg, tok.vocab_size(), feat_dim, vocab=tok.vocab)
        run_beam_eval(cfg, agent, world, valid_env, tok,
                      beam_size=args.beam, seed=args.seed)
        logger.info("[5] Beam-search evaluation finished")
        return

    if args.self_train:
        # speaker-augmented back-translation stage (the reference carries
        # the plumbing but no driver; SURVEY §2 "latent plumbing")
        from curriculum_learning_for_vln_tpu.agents.speaker import Speaker

        assert cfg.MODEL.NAME == "ENVDROP", "back-translation is an EnvDrop stage"
        agent = build_agent(cfg, tok.vocab_size(), feat_dim, vocab=tok.vocab)
        import jax.numpy as jnp

        speaker = Speaker(cfg.AIDE.SPEAKER, tok.vocab_size(), feat_dim=feat_dim,
                          episode_len=cfg.AGENT.MAX_EPISODE_LEN,
                          compute_dtype=jnp.bfloat16
                          if cfg.TPU.PRECISION == "bf16" else jnp.float32)
        aug_env = train_env if not isinstance(train_env, dict) else train_env["round_5"]
        base_env = aug_env
        engine.self_train(cfg, agent, speaker, base_env, aug_env,
                          world.device_tables(cfg.TPU.PRECISION), seed=args.seed,
                          epochs=cfg.TRAIN.MAX_EPOCH,
                          iters_per_epoch=cfg.TRAIN.ITER_PER_EPOCH)
        logger.info("[5] Self-training finished")
        return

    try:
        agent = build_agent(cfg, tok.vocab_size(), feat_dim, vocab=tok.vocab)
        if cfg.DATA.NAME == "CLR2R" and cfg.TRAIN.CLMODE == "NAIVE":
            trainer = engine.NaiveCurriculum()
            logger.info("Using NaiveCurriculum trainer")
        elif cfg.DATA.NAME == "CLR2R" and cfg.TRAIN.CLMODE == "AUTO":
            # Exp3.S bandit curriculum — the reference reserves the
            # TRAIN.AUTO_CULM keys but never implements it
            trainer = engine.AutoCurriculum.from_config(cfg, seed=args.seed)
            logger.info("Using AutoCurriculum (Exp3.S) trainer")
        elif cfg.DATA.NAME == "CLR2R" and cfg.TRAIN.CLMODE == "SELF-PACE":
            trainer = engine.SelfPacedCurriculum(
                train_env,
                pace_func=cfg.TRAIN.SELF_PACE.FUNC,
                init_lamb=cfg.TRAIN.SELF_PACE.LAMB,
                init_weight_ctrl=cfg.TRAIN.SELF_PACE.WCTRL,
                miu=cfg.TRAIN.SELF_PACE.MIU,
                interval=cfg.TRAIN.SELF_PACE.INTERVAL,
                strategy=cfg.TRAIN.SELF_PACE.STRATEGY,
                burn_in=cfg.TRAIN.SELF_PACE.BURN_IN,
            )
            logger.info("Using SelfPacedCurriculum trainer")
        else:
            trainer = engine.ClassicTrainer()
            logger.info("Using Classic trainer")

        eval_train_env = None
        if cfg.TRAIN.EVAL_TRAIN and not cfg.TPU.SYNTHETIC_WORLD:
            # per-round train-split evaluation envs (ref: main.py:116-123)
            from curriculum_learning_for_vln_tpu.data import datasets as DS
            from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv

            clr_dir = cfg.DATA.DATA_DIR if cfg.DATA.NAME == "CLR2R" else "assets/CLR2Rv3"
            eval_train_env = {}
            for k in range(1, 6):
                items = DS.load_datasets([DS.clr2r_split_name(k)], "CLR2R", clr_dir)
                expanded = DS.expand_r2r_items(items, tok, set(world.scan_ids))
                eval_train_env[f"round_{k}"] = R2RBatchEnv(
                    world, expanded, cfg.TRAIN.BATCH_SIZE * 2, tok, args.seed + 100 + k, "train")

        trainer.train(cfg, agent, cfg.OUTPUT.TSBOARD_DIR, train_env, valid_env,
                      eval_train=eval_train_env is not None, eval_train_env=eval_train_env,
                      seed=args.seed)
    except Exception:
        s = traceback.format_exc()
        print(s)
        logger.error(s)
        sys.exit(1)

    logger.info("[5] Training finished")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="TPU-native R2R navigation training")
    parser.add_argument("--config-file", default="configs/envdrop/envdrop_config.yaml",
                        metavar="FILE", help="path to config file")
    parser.add_argument("--seed", default=2020, type=int, help="random seed")
    parser.add_argument("--check-the-code", action="store_true",
                        help="run the teacher-following sanity check and exit")
    parser.add_argument("--self-train", action="store_true",
                        help="speaker-augmented back-translation training stage")
    parser.add_argument("--beam", default=0, type=int, metavar="N",
                        help="run beam-search inference with beam size N over "
                             "the validation splits and write scored results")
    parser.add_argument("opts", help="config overrides: KEY VALUE [KEY VALUE ...]",
                        default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    main(args, cfg)
