#!/bin/bash
# Round-5 post-flagship TPU session: waits for the running flagship
# (FLAGSHIP_20K_EXACT) to finish, then runs the serialized chip work in
# priority order (one TPU process at a time). Logs under logs/postrun_r5/.
#
# Usage: bash scripts/postrun_r5.sh <flagship_pid>
set -u
cd /root/repo
mkdir -p logs/postrun_r5

# gate on the babysitter's completion marker (the flagship PID changes on
# stall-restarts, so a PID wait is the wrong trigger)
if [ "${1:-wait}" != "nowait" ]; then
  echo "waiting for logs/flagship_exact.done..."
  while [ ! -f logs/flagship_exact.done ]; do sleep 30; done
  echo "flagship stage complete at $(date)"
fi

echo "=== [1/5] 1080p A/B: banded (poller default) vs forced bands=1 ==="
timeout 2400 python scripts/profile_step.py \
  --width 1920 --height 1080 --n 240000 --no_trace --windows 4 --steps 8 \
  > logs/postrun_r5/ab1080_banded.log 2>&1
echo "banded: rc=$? $(grep '\[steady\]' logs/postrun_r5/ab1080_banded.log | tail -1)"
timeout 2400 env RODYGS_SORT_BANDS=1 python scripts/profile_step.py \
  --width 1920 --height 1080 --n 240000 --no_trace --windows 4 --steps 8 \
  > logs/postrun_r5/ab1080_bands1.log 2>&1
echo "bands1: rc=$? $(grep '\[steady\]' logs/postrun_r5/ab1080_bands1.log | tail -1)"

echo "=== [2/5] bench.py (both workload points, new code) ==="
timeout 2400 python bench.py > logs/postrun_r5/bench.log 2>&1
echo "rc=$? $(tail -1 logs/postrun_r5/bench.log)"

echo "=== [3/5] POSE RUNG 512x384 noisy (2 deg / 0.25 trans) + w_align ==="
timeout 4200 python scripts/flagship_1080p.py --width 512 --height 384 \
  --n 40000 --iters 5000 --pose_noise_rot_deg 2.0 --pose_noise_trans 0.25 \
  --pose_prealign --camera_sparse_adam --motion_masks --scale_inflate 1.0 \
  --densify_from 500 --eval_w_align --resume_every 1000 \
  --state_dir logs/pose_rung_state --out POSE_RUNG_512.json \
  > logs/postrun_r5/pose_rung_512.log 2>&1
echo "rc=$? $(tail -2 logs/postrun_r5/pose_rung_512.log | head -1)"

echo "=== [4/5] POSE RUNG exact twin ==="
timeout 2400 python scripts/flagship_1080p.py --width 512 --height 384 \
  --n 40000 --iters 5000 --pose_noise_rot_deg 0 --pose_noise_trans 0 \
  --camera_sparse_adam --motion_masks --scale_inflate 1.0 \
  --densify_from 500 --resume_every 1000 \
  --state_dir logs/pose_rung_exact_state --out POSE_RUNG_512_EXACT.json \
  > logs/postrun_r5/pose_rung_exact.log 2>&1
echo "rc=$? $(tail -2 logs/postrun_r5/pose_rung_exact.log | head -1)"

echo "=== [5/5] 512^2 A/B sanity (banded default should leave it alone) ==="
timeout 900 python scripts/profile_step.py --no_trace --windows 3 --steps 10 \
  > logs/postrun_r5/ab512_banded.log 2>&1
echo "rc=$? $(grep '\[steady\]' logs/postrun_r5/ab512_banded.log | tail -1)"

echo "=== postrun_r5 done at $(date) ==="
