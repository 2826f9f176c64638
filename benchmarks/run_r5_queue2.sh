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
