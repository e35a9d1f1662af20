#!/bin/bash
# Turnkey Matterport real-data parity runs (VERDICT r4 item 8).
#
# The reference's Table-3 recipes (ref: README.md:96-107 and
# tasks/R2R-judy/runner/run_main.sh:12-59) need two asset classes this
# repo cannot ship: the Matterport connectivity graphs and the
# ResNet-152 image-feature TSV.  This script makes the run zero-code
# once those assets appear: it validates every required file, builds the
# packed world-table cache, and launches the exact Table-3 recipe grid.
#
# Usage:
#   scripts/real_data_run.sh check                  # validate assets, exit 2 on gaps
#   scripts/real_data_run.sh build-world            # compile + cache world tables
#   scripts/real_data_run.sh table3 [--dry-run]     # the full Table-3 grid
#   scripts/real_data_run.sh <recipe> [--dry-run]   # one recipe, e.g. envdrop-spcl
#
# Env knobs: CONNECTIVITY_DIR (default: connectivity),
#   IMG_FEAT (default: img_features/ResNet-152-imagenet.tsv),
#   WORLD_CACHE (default: world_cache), SEED (default: 2020).
# --dry-run validates and prints the exact commands without launching
# (exercised by tests/test_pipeline.py).

set -u
cd "$(dirname "$0")/.."

CONNECTIVITY_DIR=${CONNECTIVITY_DIR:-connectivity}
IMG_FEAT=${IMG_FEAT:-img_features/ResNet-152-imagenet.tsv}
WORLD_CACHE=${WORLD_CACHE:-world_cache}
SEED=${SEED:-2020}

DRY=0
for a in "$@"; do [ "$a" = "--dry-run" ] && DRY=1; done

say() { echo "[real_data_run] $*"; }

check_assets() {
  local missing=0
  # R2R splits (public JSON, shipped in assets/)
  for s in train val_seen val_unseen; do
    if [ ! -f "assets/R2R_${s}.json" ]; then
      say "MISSING assets/R2R_${s}.json (R2R split)"; missing=1
    fi
  done
  # CLR2R curriculum rounds (built by scripts/build_clr2r.py from R2R)
  for k in 1 2 3 4 5; do
    if [ ! -f "assets/CLR2Rv3/CLR2R_train_round[${k}]_v3.json" ]; then
      say "MISSING assets/CLR2Rv3/CLR2R_train_round[${k}]_v3.json" \
          "(run: python scripts/build_clr2r.py)"; missing=1
    fi
  done
  # Matterport connectivity graphs (one JSON per scan + scans.txt)
  if [ ! -d "$CONNECTIVITY_DIR" ]; then
    say "MISSING $CONNECTIVITY_DIR/ (Matterport connectivity dir;" \
        "get from github.com/peteanderson80/Matterport3DSimulator connectivity/)"
    missing=1
  else
    local n
    n=$(ls "$CONNECTIVITY_DIR"/*_connectivity.json 2>/dev/null | wc -l)
    if [ "$n" -lt 1 ]; then
      say "MISSING $CONNECTIVITY_DIR/*_connectivity.json (found $n)"; missing=1
    else
      say "connectivity: $n scan graphs in $CONNECTIVITY_DIR/"
    fi
  fi
  # Pre-extracted ResNet-152 image features
  if [ ! -f "$IMG_FEAT" ]; then
    say "MISSING $IMG_FEAT (ResNet-152-imagenet.tsv, the reference's" \
        "pre-extracted 36-view features; ~4 GB)"
    missing=1
  else
    say "image features: $IMG_FEAT ($(du -h "$IMG_FEAT" | cut -f1))"
  fi
  if [ "$missing" -ne 0 ]; then
    say "asset validation FAILED — fill the gaps above, then re-run"
    return 2
  fi
  say "asset validation OK"
  return 0
}

build_world() {
  if [ -f "$WORLD_CACHE/world.npz" ]; then
    say "world cache already present: $WORLD_CACHE/world.npz"
    return 0
  fi
  # features stay in the TSV (loaded at train time); the cache holds only
  # the graph-derived tables (scripts/build_world.py docstring)
  run python scripts/build_world.py --connectivity "$CONNECTIVITY_DIR" \
    --data assets --out "$WORLD_CACHE"
}

run() {
  if [ "$DRY" -eq 1 ]; then
    echo "DRYRUN: $*"
  else
    say "launch: $*"
    "$@" || { say "FAILED: $*"; exit 1; }
  fi
}

# Shared real-data overrides: synthetic world OFF, asset paths injected.
REAL="TPU.SYNTHETIC_WORLD False DATA.CONNECTIVITY_DIR $CONNECTIVITY_DIR DATA.IMG_FEAT_DIR $IMG_FEAT DATA.WORLD_CACHE $WORLD_CACHE"

# One recipe per reference runner/run_main.sh stanza (lines cited above);
# SPCL hyperparameters are the reference's per-model Table-3 values.
recipe() {
  case "$1" in
    follower)
      run python main.py --config-file configs/follower/follower_config.yaml \
        --seed "$SEED" $REAL ;;
    follower-naive)
      run python main.py --config-file configs/follower/follower_cl_config.yaml \
        --seed "$SEED" TRAIN.CLMODE NAIVE $REAL ;;
    follower-spcl)   # ref: WCTRL 0.0, MIU 3.0, linear
      run python main.py --config-file configs/follower/follower_cl_config.yaml \
        --seed "$SEED" TRAIN.CLMODE SELF-PACE TRAIN.SELF_PACE.WCTRL 0.0 \
        TRAIN.SELF_PACE.MIU 3.0 TRAIN.SELF_PACE.FUNC linear $REAL ;;
    monitor)
      run python main.py --config-file configs/monitor/selfmonitor_config.yaml \
        --seed "$SEED" $REAL ;;
    monitor-naive)
      run python main.py --config-file configs/monitor/selfmonitor_cl_config.yaml \
        --seed "$SEED" TRAIN.CLMODE NAIVE $REAL ;;
    monitor-spcl)    # ref: WCTRL 1.0, MIU 3.0, binary
      run python main.py --config-file configs/monitor/selfmonitor_cl_config.yaml \
        --seed "$SEED" TRAIN.CLMODE SELF-PACE TRAIN.SELF_PACE.WCTRL 1.0 \
        TRAIN.SELF_PACE.MIU 3.0 TRAIN.SELF_PACE.FUNC binary $REAL ;;
    envdrop)
      run python main.py --config-file configs/envdrop/envdrop_config.yaml \
        --seed "$SEED" $REAL ;;
    envdrop-naive)
      run python main.py --config-file configs/envdrop/envdrop_cl_config.yaml \
        --seed "$SEED" TRAIN.CLMODE NAIVE $REAL ;;
    envdrop-spcl)    # ref: WCTRL 0.5, MIU 2.0, linear
      run python main.py --config-file configs/envdrop/envdrop_cl_config.yaml \
        --seed "$SEED" TRAIN.CLMODE SELF-PACE TRAIN.SELF_PACE.WCTRL 0.5 \
        TRAIN.SELF_PACE.MIU 2.0 TRAIN.SELF_PACE.FUNC linear $REAL ;;
    *)
      say "unknown recipe: $1"; exit 1 ;;
  esac
}

CMD=${1:-help}
case "$CMD" in
  check)
    check_assets; exit $? ;;
  build-world)
    check_assets || exit $?
    build_world ;;
  table3)
    if [ "$DRY" -eq 1 ]; then
      check_assets || say "(dry-run: continuing past asset gaps)"
    else
      check_assets || exit $?
      build_world
    fi
    for r in follower follower-naive follower-spcl \
             monitor monitor-naive monitor-spcl \
             envdrop envdrop-naive envdrop-spcl; do
      recipe "$r"
    done ;;
  follower|follower-naive|follower-spcl|monitor|monitor-naive|monitor-spcl|envdrop|envdrop-naive|envdrop-spcl)
    if [ "$DRY" -ne 1 ]; then
      check_assets || exit $?
      build_world
    fi
    recipe "$CMD" ;;
  *)
    echo "usage: $0 {check|build-world|table3|follower[-naive|-spcl]|monitor[-naive|-spcl]|envdrop[-naive|-spcl]} [--dry-run]"
    exit 1 ;;
esac
