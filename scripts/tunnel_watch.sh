#!/bin/bash
# Probe the axon TPU tunnel until it answers. Each probe is a child python
# with a hard deadline (a dead relay HANGS jax.devices(), it does not
# error). Exits 0 the moment a probe succeeds; logs each attempt.
LOG=/tmp/tunnel_watch.log
: > "$LOG"
i=0
while true; do
  i=$((i+1))
  timeout 120 python -c "import jax; d=jax.devices(); print(d)" >> "$LOG" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "$(date +%T) probe $i: ALIVE" >> "$LOG"
    exit 0
  fi
  # rc=124: hung (timeout); other: errored
  echo "$(date +%T) probe $i: dead (rc=$rc)" >> "$LOG"
  sleep 240
done
