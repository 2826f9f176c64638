#!/bin/bash
# Round-5 queue 4: restart of queue2 (killed with the session at its
# first job) + queue3 (never started), plus a re-run of the open-loop
# serving A/B — queue-1's runs recorded drain-loop poll time as the
# completion latency, inflating every latency toward the offered-window
# end (bench_serving.py now stamps at future resolution).
set -x
cd /root/repo
B=benchmarks

# 1. open-loop serving A/B with correct latency stamps (VERDICT item 5)
timeout 1500 python scripts/bench_serving.py --warmup --uint8_out \
  --buckets 8 --arrival_rate 1.6 --duration_s 180 --queue_depth 256 \
  > $B/serving_openloop_off_r5.jsonl 2> $B/serving_openloop_off_r5.log
echo "== q4 job1a serving-unshaped rc=$? =="
timeout 1500 python scripts/bench_serving.py --warmup --uint8_out \
  --buckets 8 --arrival_rate 1.6 --duration_s 180 --deadline_s 8 \
  --queue_depth 16 \
  > $B/serving_openloop_on_r5.jsonl 2> $B/serving_openloop_on_r5.log
echo "== q4 job1b serving-shaped rc=$? =="

# 2. ds=1 SpatialTransformer decomposition (fusion headroom, VERDICT 6)
timeout 2400 python scripts/bench_spatial_transformer.py \
  > $B/spatial_transformer_r5.jsonl 2> $B/spatial_transformer_r5.log
echo "== q4 job2 spatial rc=$? =="

# 3. headline sweep, batch 1 + 8 (single-token reorder is in-graph now)
timeout 2400 python scripts/bench_sweep.py \
  > $B/sweep_fp_b1_r5.jsonl 2> $B/sweep_fp_b1_r5.log
echo "== q4 job3 sweep-b1 rc=$? =="
timeout 2400 python scripts/bench_sweep.py --batch 8 --steps 50 \
  --samplers plms \
  > $B/sweep_fp_b8_r5.jsonl 2> $B/sweep_fp_b8_r5.log
echo "== q4 job4 sweep-b8 rc=$? =="

# 4. int8 variant attribution incl. calibrated static scales (PERF §8)
timeout 3000 python scripts/bench_int8_unet.py --batch 2 \
  > $B/int8_unet_static_b2_r5.jsonl 2> $B/int8_unet_static_b2_r5.log
echo "== q4 job5 int8-variants-b2 rc=$? =="
timeout 3000 python scripts/bench_int8_unet.py --batch 16 --lo 5 --hi 15 \
  > $B/int8_unet_static_b16_r5.jsonl 2> $B/int8_unet_static_b16_r5.log
echo "== q4 job6 int8-variants-b16 rc=$? =="

# 5. end-to-end static-int8 sweeps at the headline config
timeout 2400 python scripts/bench_sweep.py --steps 50 --samplers plms \
  --quantize int8-static \
  > $B/sweep_int8static_b1_r5.jsonl 2> $B/sweep_int8static_b1_r5.log
echo "== q4 job7 static-sweep-b1 rc=$? =="
timeout 2400 python scripts/bench_sweep.py --batch 8 --steps 50 \
  --samplers plms --quantize int8-static \
  > $B/sweep_int8static_b8_r5.jsonl 2> $B/sweep_int8static_b8_r5.log
echo "== q4 job8 static-sweep-b8 rc=$? =="

# 6. train-step ablation (r4 OOM fixed with donate; r5 q1 died on a
#    tunnel flake mid-compile — two attempts)
for attempt in 1 2; do
  timeout 3000 python scripts/bench_train_ablation.py --batch 8 \
    > $B/train_ablation_r5.jsonl 2> $B/train_ablation_r5.log
  rc=$?
  echo "== q4 job9 trainablate attempt$attempt rc=$rc =="
  [ $rc -eq 0 ] && break
  sleep 60
done

# 7. static-int8 compounded drift at v1 geometry
timeout 3600 python scripts/bench_quant_drift.py --variant int8-static \
  > $B/quant_drift_static_r5.jsonl 2> $B/quant_drift_static_r5.log
echo "== q4 job10 static-drift rc=$? =="
