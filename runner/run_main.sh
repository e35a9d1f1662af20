#!/bin/bash
# Canonical invocations (mirrors the reference runner/run_main.sh recipes).
# All runs preserve the reference's config-file + KEY VALUE override CLI.

set -e

SEED=${SEED:-2020}

case "${1:-help}" in
  follower)
    python main.py --config-file configs/follower/follower_config.yaml --seed $SEED "${@:2}" ;;
  monitor)
    python main.py --config-file configs/monitor/selfmonitor_config.yaml --seed $SEED "${@:2}" ;;
  envdrop)
    python main.py --config-file configs/envdrop/envdrop_config.yaml --seed $SEED "${@:2}" ;;
  envdrop-naive-cl)
    python main.py --config-file configs/envdrop/envdrop_cl_config.yaml --seed $SEED \
      TRAIN.CLMODE NAIVE "${@:2}" ;;
  envdrop-spcl)
    # reference Table-3 recipe: SPCL, linear pace, lambda0=2, mu in {1,2,3}
    python main.py --config-file configs/envdrop/envdrop_cl_config.yaml --seed $SEED \
      TRAIN.CLMODE SELF-PACE TRAIN.SELF_PACE.FUNC linear \
      TRAIN.SELF_PACE.LAMB 2.0 TRAIN.SELF_PACE.MIU 1.0 "${@:2}" ;;
  monitor-spcl)
    python main.py --config-file configs/monitor/selfmonitor_cl_config.yaml --seed $SEED \
      TRAIN.CLMODE SELF-PACE "${@:2}" ;;
  follower-spcl)
    python main.py --config-file configs/follower/follower_cl_config.yaml --seed $SEED \
      TRAIN.CLMODE SELF-PACE "${@:2}" ;;
  envdrop-auto-cl)
    # Exp3.S automated curriculum (the reference reserves TRAIN.AUTO_CULM
    # but never implements it)
    python main.py --config-file configs/envdrop/envdrop_cl_config.yaml --seed $SEED \
      TRAIN.CLMODE AUTO "${@:2}" ;;
  self-train)
    # speaker-augmented back-translation stage
    python main.py --config-file configs/envdrop/envdrop_config.yaml --seed $SEED \
      --self-train "${@:2}" ;;
  check)
    python main.py --config-file configs/envdrop/envdrop_config.yaml --check-the-code \
      TPU.SYNTHETIC_WORLD True "${@:2}" ;;
  smoke)
    # end-to-end synthetic smoke train (no external assets)
    python main.py --config-file configs/follower/follower_config.yaml --seed $SEED \
      TPU.SYNTHETIC_WORLD True TRAIN.MAX_EPOCH 3 TRAIN.ITER_PER_EPOCH 10 \
      TRAIN.BATCH_SIZE 16 TRAIN.EVAL_INTERVAL 3 AGENT.MAX_EPISODE_LEN 10 "${@:2}" ;;
  *)
    echo "usage: $0 {follower|monitor|envdrop|envdrop-naive-cl|envdrop-spcl|envdrop-auto-cl|monitor-spcl|follower-spcl|self-train|check|smoke} [KEY VALUE ...]" ;;
esac
