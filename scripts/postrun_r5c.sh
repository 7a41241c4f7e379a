#!/bin/bash
# Stage 3 of the round-5 chip queue: after the stability smoke, measure the
# forced 3-band point at 1080p (the poller's safe default settles at
# ("huge", 2); ("huge", 3) is keep-viable but below the upgrade margin —
# this quantifies what a smarter upgrade policy would buy), then re-run the
# full CPU suite serially (two earlier concurrent attempts died in XLA CPU
# compile while starving the 4-core host).
set -u
cd /root/repo
mkdir -p logs/postrun_r5

echo "waiting for postrun_r5b done marker..."
while ! grep -q "postrun_r5b done" logs/postrun_r5b.out 2>/dev/null; do
  sleep 30
done
echo "stage 2 complete at $(date)"

echo "=== [1/2] 1080p forced RODYGS_SORT_BANDS=3 ==="
timeout 2400 env RODYGS_SORT_BANDS=3 python scripts/profile_step.py \
  --width 1920 --height 1080 --n 240000 --no_trace --windows 4 --steps 8 \
  > logs/postrun_r5/ab1080_bands3.log 2>&1
echo "bands3: rc=$? $(grep '\[steady\]' logs/postrun_r5/ab1080_bands3.log | tail -1)"

echo "=== [2/2] full CPU suite (serial, chip idle) ==="
timeout 2400 python -m pytest tests/ -q > logs/postrun_r5/pytest_final.log 2>&1
echo "rc=$? $(tail -1 logs/postrun_r5/pytest_final.log)"
echo "=== postrun_r5c done at $(date) ==="
