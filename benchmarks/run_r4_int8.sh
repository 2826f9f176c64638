#!/bin/bash
# Round-4 int8 end-to-end banking run (serialized: one TPU job at a time).
# fp rows re-run same-day for a fair A/B (they are compile-cache hits).
set -x
cd /root/repo
B=benchmarks
python scripts/bench_sweep.py --samplers plms --steps 50 --batch 1 --repeats 5 \
  > $B/sweep_fp_b1_r4.jsonl 2> $B/sweep_fp_b1_r4.log
python scripts/bench_sweep.py --samplers plms --steps 50 --batch 1 --repeats 5 \
  --quantize int8 > $B/sweep_int8_b1_r4.jsonl 2> $B/sweep_int8_b1_r4.log
python scripts/bench_sweep.py --samplers plms --steps 50 --batch 8 --repeats 3 \
  > $B/sweep_fp_b8_r4.jsonl 2> $B/sweep_fp_b8_r4.log
python scripts/bench_sweep.py --samplers plms --steps 50 --batch 8 --repeats 3 \
  --quantize int8 > $B/sweep_int8_b8_r4.jsonl 2> $B/sweep_int8_b8_r4.log
python scripts/bench_quant_drift.py --steps 50 \
  > $B/quant_drift_r4.jsonl 2> $B/quant_drift_r4.log
python scripts/bench_serving.py --n_requests 64 --concurrency 16 --warmup \
  --uint8_out --buckets 8 \
  > $B/serving_fp_bucket8_r4.jsonl 2> $B/serving_fp_bucket8_r4.log
python scripts/bench_serving.py --n_requests 64 --concurrency 16 --warmup \
  --uint8_out --buckets 8 --quantize int8 \
  > $B/serving_int8_bucket8_r4.jsonl 2> $B/serving_int8_bucket8_r4.log
echo DONE_R4_INT8
