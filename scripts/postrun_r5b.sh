#!/bin/bash
# Stage 2 of the round-5 chip queue: waits for postrun_r5.sh to print its
# done marker, then uses any remaining round time for the TnT-regime
# stability smoke (150k iterations at small resolution — the capacity
# drift / escalation thrash / host-RSS evidence VERDICT r4 item 5 asks
# for). Resume snapshots make a partial run continuable.
set -u
cd /root/repo
mkdir -p logs/postrun_r5

echo "waiting for postrun_r5 done marker..."
while ! grep -q "postrun_r5 done" logs/postrun_r5.out 2>/dev/null; do
  sleep 30
done
echo "stage 1 complete at $(date); starting 150k stability smoke"

timeout 5400 python scripts/flagship_1080p.py --width 128 --height 96 \
  --n 8000 --iters 150000 --densify_from 500 \
  --densify_until_static 100000 --densify_until_dynamic 100000 \
  --sh_up_start 100000 --log_every 2000 --resume_every 25000 \
  --state_dir logs/smoke150k_state --out SMOKE_150K.json \
  > logs/postrun_r5/smoke150k.log 2>&1
echo "rc=$? $(tail -2 logs/postrun_r5/smoke150k.log | head -1)"
echo "=== postrun_r5b done at $(date) ==="
