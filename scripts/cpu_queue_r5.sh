#!/bin/sh
# Round-5 sequential CPU study queue (1-core host; runs are resumable).
#
# Regenerates the two BASELINE.md-cited evidence files that were never
# committed (VERDICT r4 weak #1 / next #4) and extends the CLR2R e2e
# study to 5 seeds (next #5).  Chip measurements SIGSTOP this queue via
# /tmp/cpu_queue.pid (CLAUDE.md: serialize TPU benchmarks against
# CPU-heavy jobs).
#
# Usage: nohup scripts/cpu_queue_r5.sh > /tmp/cpu_queue.log 2>&1 &
#        echo $! > /tmp/cpu_queue.pid
cd /root/repo || exit 1
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo

run() {
  name=$1; shift
  echo "== $name start $(date +%H:%M:%S)"
  "$@" > "snapshots/logs/${name}_r5.log" 2>&1
  echo "== $name rc=$? end $(date +%H:%M:%S)"
}

mkdir -p snapshots/logs

# 0. Beam value study under the length-normalized selection rule (fills
#    BASELINE.md's BEAM_LN_TABLE and regenerates the cited JSONL that was
#    lost with the previous host).  --ckpt-dir makes a re-selection rerun
#    skip the ~25 min training stage.
run beam_study python scripts/beam_study.py --epochs 60 \
  --ckpt-dir snapshots/beam_ckpt_r5 --out snapshots/beam_study_r5.jsonl

# 1. 5-seed Self-Monitor matrix (schedule-complete: 120 epochs, 20-epoch
#    naive rounds — the recipe behind BASELINE.md's p~0.007 ordering).
#    Seed-outer order: every finished seed is a complete paired triple.
run matrix_monitor python scripts/parity_matrix.py --models SELF-MONITOR \
  --seeds 5 --epochs 120 --switch-epoch 20 \
  --out snapshots/matrix_r5_monitor.jsonl

# 2. 3-seed packed-RL quality study (the evidence behind PACKED_RL=3).
run packed_study python scripts/packed_study.py --seeds 3 --epochs 100 \
  --arms base,packed3,exit --out snapshots/packed_study_r5.jsonl

# 3. CLR2R e2e at 5 seeds (resumes past the committed round-4 seeds 0-1).
run clr2r_e2e python scripts/clr2r_e2e.py --seeds 5 \
  --out snapshots/clr2r_e2e_r5.jsonl

echo "QUEUE DONE $(date +%H:%M:%S)"
touch /tmp/cpu_queue.done
