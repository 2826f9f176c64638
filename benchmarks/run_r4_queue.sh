#!/bin/bash
# Round-4 on-chip bench queue (serialized: ONE TPU job at a time; the
# axon device grant cannot be shared). Each job writes its own jsonl so
# partial progress survives; generous timeouts are a hang backstop only.
set -x
cd /root/repo
B=benchmarks

# claim probe: the axon device grant can be stuck for minutes after an
# interrupted process; backend init then blocks forever with no error.
# Retry a trivial on-device op under a short timeout until the chip is
# actually claimable, so a poisoned grant stalls THIS loop, not job 1.
for i in $(seq 1 12); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('probe', float(jnp.ones((8, 8)).sum()))
"; then
    echo "== claim probe OK (attempt $i) =="
    break
  fi
  echo "== claim probe attempt $i failed; sleeping 60s =="
  sleep 60
done

# 1. pipelined flash-attention variant: does it beat rowblock on-chip?
timeout 2400 python scripts/bench_attention.py \
  --impls pipelined,rowblock --shapes unet_ds1,unet_ds2 --repeats 10 \
  > $B/attention_pipelined_r4.jsonl 2> $B/attention_pipelined_r4.log
echo "== job1 attention rc=$? =="

# 2. int8 composition bisect: why do convs lose in-graph?
timeout 2400 python scripts/bench_int8_compose.py \
  > $B/int8_compose_r4.jsonl 2> $B/int8_compose_r4.log
echo "== job2 compose rc=$? =="

# 3. pipeline-level int8 drift bound at v1 geometry (50-step fixed seed)
timeout 3000 python scripts/bench_quant_drift.py --steps 50 \
  > $B/quant_drift_r4.jsonl 2> $B/quant_drift_r4.log
echo "== job3 drift rc=$? =="

# 4. frozen program at PRODUCTION geometry: export, AOT-load, bitwise vs live
timeout 3600 python scripts/verify_frozen_program.py \
  --H 512 --W 512 --steps 50 --det_first_stage 0 \
  --outdir /tmp/frozen_v1_r4 \
  > $B/frozen_v1_r4.jsonl 2> $B/frozen_v1_r4.log
echo "== job4 frozen rc=$? =="

# 5. 1024^2 tiling seam-quality verdict (3 arms, 50 steps)
timeout 3600 python scripts/bench_tiling_seams.py --steps 50 --size 1024 \
  > $B/tiling_seams_r4.jsonl 2> $B/tiling_seams_r4.log
echo "== job5 seams rc=$? =="

# 6. train-step cost breakdown at v1 geometry, batch 8
timeout 3600 python scripts/bench_train_ablation.py --batch 8 \
  > $B/train_ablation_r4.jsonl 2> $B/train_ablation_r4.log
echo "== job6 trainablate rc=$? =="

# 7. sustained train rate FROM DISK (PNG decode + mask synth + H2D) at batch 8
timeout 3600 python scripts/train.py --max_steps 120 --log_every 20 \
  --val_every 1000000 --logdir /tmp/disktrain_r4 \
  data.params.batch_size=8 \
  data.params.train.params.dataset_dir=/tmp/oi_r4 \
  data.params.validation.params.dataset_dir=/tmp/oi_r4 \
  > $B/disk_train_b8_r4.log 2>&1
echo "== job7 disktrain rc=$? =="

# 8. serving A/B with 8-bucket occupancy: fp vs int8
timeout 2700 python scripts/bench_serving.py --n_requests 64 --concurrency 16 \
  --warmup --uint8_out --buckets 8 \
  > $B/serving_fp_bucket8_r4.jsonl 2> $B/serving_fp_bucket8_r4.log
echo "== job8 serving-fp rc=$? =="
timeout 2700 python scripts/bench_serving.py --n_requests 64 --concurrency 16 \
  --warmup --uint8_out --buckets 8 --quantize int8 \
  > $B/serving_int8_bucket8_r4.jsonl 2> $B/serving_int8_bucket8_r4.log
echo "== job9 serving-int8 rc=$? =="

echo DONE_R4_QUEUE
