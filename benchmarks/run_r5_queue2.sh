#!/bin/bash
# Round-5 queue 2: the ds=1 fusion-headroom probe + headline re-sweep
# after the single-token to_out reorder. Run AFTER run_r5_queue.sh.
set -x
cd /root/repo
B=benchmarks

# 1. ds=1 SpatialTransformer decomposition (fusion headroom bound)
timeout 2400 python scripts/bench_spatial_transformer.py \
  > $B/spatial_transformer_r5.jsonl 2> $B/spatial_transformer_r5.log
echo "== q2 job1 spatial rc=$? =="

# 2. headline sweep, batch 1 + 8 (the single-token reorder is in-graph now)
timeout 2400 python scripts/bench_sweep.py \
  > $B/sweep_fp_b1_r5.jsonl 2> $B/sweep_fp_b1_r5.log
echo "== q2 job2 sweep-b1 rc=$? =="
timeout 2400 python scripts/bench_sweep.py --batch 8 --steps 50 --samplers plms \
  > $B/sweep_fp_b8_r5.jsonl 2> $B/sweep_fp_b8_r5.log
echo "== q2 job3 sweep-b8 rc=$? =="

# 4. calibrated static-scale int8 UNet attribution (PERF §8's named
#    candidate fix: constant-scale quantize/rescale, no runtime amax)
timeout 3000 python scripts/bench_int8_unet.py --batch 2 \
  > $B/int8_unet_static_b2_r5.jsonl 2> $B/int8_unet_static_b2_r5.log
echo "== q2 job4 int8-static-b2 rc=$? =="
timeout 3000 python scripts/bench_int8_unet.py --batch 16 --lo 5 --hi 15 \
  > $B/int8_unet_static_b16_r5.jsonl 2> $B/int8_unet_static_b16_r5.log
echo "== q2 job5 int8-static-b16 rc=$? =="

# 6/7. end-to-end static-int8 sweep at the headline config (the batch-1
#    2.3x regression is the question; calibration adds one extra compile)
timeout 2400 python scripts/bench_sweep.py --steps 50 --samplers plms \
  --quantize int8-static \
  > $B/sweep_int8static_b1_r5.jsonl 2> $B/sweep_int8static_b1_r5.log
echo "== q2 job6 static-sweep-b1 rc=$? =="
timeout 2400 python scripts/bench_sweep.py --batch 8 --steps 50 \
  --samplers plms --quantize int8-static \
  > $B/sweep_int8static_b8_r5.jsonl 2> $B/sweep_int8static_b8_r5.log
echo "== q2 job7 static-sweep-b8 rc=$? =="
