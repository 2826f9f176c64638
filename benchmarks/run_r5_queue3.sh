#!/bin/bash
# Round-5 queue 3: train-ablation retry (q1 job4 died on an axon tunnel
# flake mid-compile) + static-int8 compounded drift at v1 geometry.
set -x
cd /root/repo
B=benchmarks

for attempt in 1 2; do
  timeout 3000 python scripts/bench_train_ablation.py --batch 8 \
    > $B/train_ablation_r5.jsonl 2> $B/train_ablation_r5.log
  rc=$?
  echo "== q3 job1 trainablate attempt$attempt rc=$rc =="
  [ $rc -eq 0 ] && break
  sleep 60
done

timeout 3600 python scripts/bench_quant_drift.py --variant int8-static \
  > $B/quant_drift_static_r5.jsonl 2> $B/quant_drift_static_r5.log
echo "== q3 job2 static-drift rc=$? =="
