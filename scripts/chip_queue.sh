#!/bin/sh
# Auto-firing real-chip perf queue (round 4).
#
# The round-3 perf record was lost to an axon relay outage (VERDICT r3
# item 1), so round 4 runs its chip measurements unattended: this script
# polls the relay, and the moment it answers it (a) SIGSTOPs the
# CPU-heavy study jobs (CLAUDE.md: "Serialize TPU benchmarks against
# CPU-heavy jobs" -- the relay-safe differencing still measures host
# wall-clock between two fetches), (b) runs every pending real-chip
# measurement sequentially with per-run timeouts, (c) SIGCONTs the CPU
# jobs and writes a DONE marker.  Outputs land in snapshots/perf_r4/.
#
# Queue contents (one per VERDICT r3 "next round" item):
#   bench       -- bench.py re-baseline (item 1; relay drifts between
#                  sessions so in-session arms below compare to this)
#   scan_iters  -- TPU.SCAN_ITERS K-sweep x {base,exit,packed3} (items 2+5)
#   early_exit  -- SCAN_EARLY_EXIT / PACKED_RL wall + episodes/s (item 2)
#   selftrain   -- speaker XLA-vs-Pallas self-train iteration (item 7)
#
# Usage: nohup scripts/chip_queue.sh > /dev/null 2>&1 &  (from /root/repo)
LOG=/tmp/chip_queue.log
cd /root/repo || exit 1

probe() {
  timeout 90 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
    >/dev/null 2>&1
}

echo "$(date +%H:%M:%S) chip_queue waiting for relay" >> "$LOG"
while ! probe; do sleep 240; done
echo "$(date +%H:%M:%S) RELAY UP - pausing CPU studies, firing queue" >> "$LOG"

# Pause CPU-heavy jobs by exact match on study entry points (never a bare
# "python" match: SIGSTOP, not kill, and the perf scripts themselves are
# perf_*.py / bench.py so they can't self-match).
STOPPED=""
for f in /tmp/monitor_study.pid /tmp/cpu_queue.pid; do
  if [ -f "$f" ] && kill -0 "$(cat "$f")" 2>/dev/null; then
    kill -STOP "$(cat "$f")" 2>/dev/null && STOPPED="$STOPPED $(cat "$f")"
  fi
done
# Only processes whose argv[0] is literally "python" (study entry points
# are launched that way); an interactive shell wrapper whose long command
# line merely MENTIONS one of these scripts must never be STOPped.
for p in $(ps -eo pid,args | awk '$2 == "python" && \
             /parity_matrix\.py|-m pytest|clr2r_e2e\.py|packed_study\.py/ {print $1}'); do
  kill -STOP "$p" 2>/dev/null && STOPPED="$STOPPED $p"
done
echo "paused:$STOPPED" >> "$LOG"

mkdir -p snapshots/perf_r4
run() {
  name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout 3600 "$@" > "snapshots/perf_r4/$name.log" 2>&1
  echo "== $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

run bench python bench.py
run scan_iters python scripts/perf_scan_iters.py
run early_exit python scripts/perf_early_exit.py
run selftrain python scripts/perf_selftrain.py

for p in $STOPPED; do kill -CONT "$p" 2>/dev/null; done
echo "$(date +%H:%M:%S) DONE - CPU studies resumed" >> "$LOG"
touch /tmp/chip_queue.done
