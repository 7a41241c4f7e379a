#!/bin/bash
# Babysits the exact-pose 20k flagship through axon tunnel stalls: starts
# the run, watches its log mtime, and on >6 min of silence (steady cadence
# is a log line every ~30-50 s; legitimate gaps — snapshot writes, SH-ramp
# re-jits — stay under ~3 min) kills the exact PID and restarts, resuming
# from the latest 2000-iter snapshot. Touches logs/flagship_exact.done when
# FLAGSHIP_20K_EXACT.json exists (or on giving up), which gates
# postrun_r5.sh. Two manual kill+resume cycles tonight motivated this.
set -u
cd /root/repo
LOG=logs/flagship_20k_exact.log
OUT=FLAGSHIP_20K_EXACT.json
MARKER=logs/flagship_exact.done
STALL_S=360
MAX_RESTARTS=8

run_once() {
  nohup python scripts/flagship_1080p.py --iters 20000 --width 1920 \
    --height 1080 --n 120000 --densify_from 500 --densify_until_dynamic \
    15000 --sh_up_start 15000 --resume_every 2000 \
    --state_dir logs/flagship20k_exact_state --out "$OUT" >> "$LOG" 2>&1 &
  FPID=$!
  echo "[babysitter] started flagship pid $FPID at $(date)"
}

restarts=0
run_once
while true; do
  sleep 60
  if [ -f "$OUT" ] && ! kill -0 "$FPID" 2>/dev/null; then
    echo "[babysitter] flagship completed at $(date)"
    break
  fi
  if ! kill -0 "$FPID" 2>/dev/null; then
    echo "[babysitter] flagship pid $FPID died without output at $(date)"
    restarts=$((restarts + 1))
    [ $restarts -gt $MAX_RESTARTS ] && break
    run_once
    continue
  fi
  # stall detection: no log append for STALL_S seconds
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$age" -gt "$STALL_S" ]; then
    echo "[babysitter] stall detected (log idle ${age}s) at $(date); killing $FPID"
    kill "$FPID" 2>/dev/null
    sleep 5
    kill -0 "$FPID" 2>/dev/null && kill -9 "$FPID" 2>/dev/null
    sleep 5
    restarts=$((restarts + 1))
    if [ $restarts -gt $MAX_RESTARTS ]; then
      echo "[babysitter] giving up after $restarts restarts"
      break
    fi
    run_once
  fi
done
touch "$MARKER"
echo "[babysitter] done at $(date) (restarts=$restarts)"
