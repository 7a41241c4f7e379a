#!/bin/bash
# Babysits the exact-pose 20k flagship through axon tunnel stalls: starts
# (or adopts, pass the PID as $1) the run, watches its log mtime, and on
# >6 min of silence (steady cadence is a log line every ~30-50 s) kills the
# exact PID and restarts, resuming from the latest 2000-iter snapshot.
# ENDGAME GRACE: past iter 19500 the final eval renders compile and run
# silently for many minutes — the stall threshold widens to 45 min there so
# the watchdog cannot kill a run that is finishing. Touches
# logs/flagship_exact.done when FLAGSHIP_20K_EXACT.json exists (or on
# giving up), which gates postrun_r5.sh.
set -u
cd /root/repo
LOG=logs/flagship_20k_exact.log
OUT=FLAGSHIP_20K_EXACT.json
MARKER=logs/flagship_exact.done
STALL_S=360
ENDGAME_STALL_S=2700
MAX_RESTARTS=10

run_once() {
  nohup python scripts/flagship_1080p.py --iters 20000 --width 1920 \
    --height 1080 --n 120000 --densify_from 500 --densify_until_dynamic \
    15000 --sh_up_start 15000 --resume_every 2000 \
    --state_dir logs/flagship20k_exact_state --out "$OUT" >> "$LOG" 2>&1 &
  FPID=$!
  echo "[babysitter] started flagship pid $FPID at $(date)"
}

FPID=${1:-}
if [ -z "$FPID" ]; then
  run_once
else
  echo "[babysitter] adopting flagship pid $FPID at $(date)"
fi

restarts=0
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
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  thresh=$STALL_S
  if tail -3 "$LOG" | grep -qE "iter (19[5-9][0-9][0-9]|20000)|RESUMED at iter 200"; then
    thresh=$ENDGAME_STALL_S
  fi
  if [ "$age" -gt "$thresh" ]; then
    echo "[babysitter] stall detected (log idle ${age}s, thresh ${thresh}) at $(date); killing $FPID"
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
