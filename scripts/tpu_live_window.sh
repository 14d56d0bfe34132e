#!/bin/bash
# One-shot orchestration for a live axon-tunnel window. Stages ordered so a
# short window still yields the most valuable artifacts first:
#   1. kernel validation, small shapes (fast Mosaic feedback)
#   2. full drive with bench-scale spot timings
#   3. bench.py (warms the persistent cache for the driver's BENCH_r03 run)
#   4. two-scene compare_reference for the README table
# All output appended to /tmp/tpu_live.log; stages are separated by markers.
set -u
cd /root/repo
LOG=/tmp/tpu_live.log
: > "$LOG"
mark() { echo "===== $(date +%T) $* =====" | tee -a "$LOG"; }

mark "stage 1: drive --small-only"
timeout 2400 python benchmark/tpu_drive_round3.py --small-only >> "$LOG" 2>&1
echo "stage1 rc=$?" | tee -a "$LOG"

mark "stage 2: drive full"
timeout 3000 python benchmark/tpu_drive_round3.py >> "$LOG" 2>&1
echo "stage2 rc=$?" | tee -a "$LOG"

mark "stage 3: bench.py"
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "stage3 rc=$?" | tee -a "$LOG"

mark "stage 4: compare_reference --scene both"
timeout 3600 python benchmark/compare_reference.py --scene both >> "$LOG" 2>&1
echo "stage4 rc=$?" | tee -a "$LOG"

mark "done"
