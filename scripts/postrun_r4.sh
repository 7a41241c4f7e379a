#!/bin/bash
# Round-4 post-flagship TPU session: runs the serialized chip work in
# priority order (one TPU process at a time). Fire after FLAGSHIP_20K
# completes. Logs under logs/postrun_r4/.
set -u
cd /root/repo
mkdir -p logs/postrun_r4

echo "=== [1/5] bench.py (both workload points) ==="
timeout 1800 python bench.py > logs/postrun_r4/bench.log 2>&1
echo "rc=$? $(tail -1 logs/postrun_r4/bench.log)"

echo "=== [2/5] 1080p A/B: fwd-records + bwd-unsort gather ==="
for knob in base fwd_gather bwd_gather; do
  case $knob in
    base) env_args=() ;;
    fwd_gather) env_args=(RODYGS_FWD_RECORDS=gather) ;;
    bwd_gather) env_args=(RODYGS_BWD_UNSORT=gather) ;;
  esac
  timeout 1200 env "${env_args[@]}" python scripts/profile_step.py \
    --width 1920 --height 1080 --n 240000 --no_trace --windows 3 --steps 8 \
    > "logs/postrun_r4/ab1080_${knob}.log" 2>&1
  echo "$knob: $(grep '\[steady\]' logs/postrun_r4/ab1080_${knob}.log | tail -1)"
done

echo "=== [3/5] 1080p trace (breakdown) ==="
timeout 1200 python scripts/profile_step.py --width 1920 --height 1080 \
  --n 240000 --windows 2 --steps 8 --outdir /tmp/tr1080 \
  > logs/postrun_r4/trace1080.log 2>&1
echo "rc=$?"

echo "=== [4/5] 512^2 trace (breakdown) ==="
timeout 900 python scripts/profile_step.py --windows 2 --steps 10 \
  --outdir /tmp/tr512 > logs/postrun_r4/trace512.log 2>&1
echo "rc=$?"

echo "=== [5/5] dynamic-replication bound at 262144 ==="
timeout 900 python scripts/measure_dyn_replication.py --capacity 262144 \
  > logs/postrun_r4/dynrep.log 2>&1
echo "rc=$? $(tail -1 logs/postrun_r4/dynrep.log)"

echo "=== postrun_r4 done ==="
