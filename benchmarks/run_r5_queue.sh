#!/bin/bash
# Round-5 on-chip queue: pay down the round-4 proof debt (VERDICT r4).
# Jobs run SEQUENTIALLY (one chip, one host core; parallel runs corrupt
# each other's timings and can deadlock the device grant).
set -x
cd /root/repo
B=benchmarks

# 1. frozen program at v1 geometry: fixed runtime (device-resident params)
#    + the documented tolerance criterion
timeout 3000 python scripts/verify_frozen_program.py \
  --H 512 --W 512 --steps 50 --det_first_stage 0 \
  --outdir /tmp/frozen_v1_r5 \
  > $B/frozen_v1_r5.jsonl 2> $B/frozen_v1_r5.log
echo "== job1 frozen rc=$? =="

# 2. int8-vs-fp compounded drift, NONTRIVIAL eps (zero-init leaves
#    perturbed + eps RMS asserted)
timeout 3000 python scripts/bench_quant_drift.py \
  > $B/quant_drift_r5.jsonl 2> $B/quant_drift_r5.log
echo "== job2 drift rc=$? =="

# 3. 1024^2 tiling seam verdict, NONTRIVIAL eps
timeout 3600 python scripts/bench_tiling_seams.py --steps 50 --size 1024 \
  --save_dir /tmp/seams_r5 \
  > $B/tiling_seams_r5.jsonl 2> $B/tiling_seams_r5.log
echo "== job3 seams rc=$? =="

# 4. train-step cost breakdown at batch 8 (donated chain, no OOM)
timeout 3000 python scripts/bench_train_ablation.py --batch 8 \
  > $B/train_ablation_r5.jsonl 2> $B/train_ablation_r5.log
echo "== job4 trainablate rc=$? =="

# 5. input-pipeline attribution with the crop-first __getitem__
timeout 1200 python scripts/bench_input_pipeline.py --tree /tmp/oi_r5b \
  --n_images 128 \
  > $B/input_pipeline_r5.jsonl 2> $B/input_pipeline_r5.log
echo "== job5 inputpipe rc=$? =="

# 6. sustained disk-fed training, uint8 wire format, batch 8
timeout 1800 python scripts/train.py --max_steps 120 --log_every 20 \
  --val_every 1000000 --logdir /tmp/disktrain_r5 \
  data.params.batch_size=8 \
  data.params.train.params.dataset_dir=/tmp/oi_r5b \
  data.params.validation.params.dataset_dir=/tmp/oi_r5b \
  data.params.train.params.uint8=true \
  data.params.validation.params.uint8=true \
  > $B/disk_train_u8_r5.log 2>&1
echo "== job6 disktrain-u8 rc=$? =="

# 6b. float control at the same tree/geometry (attributes the uint8 win)
timeout 1800 python scripts/train.py --max_steps 60 --log_every 20 \
  --val_every 1000000 --logdir /tmp/disktrain_r5f \
  data.params.batch_size=8 \
  data.params.train.params.dataset_dir=/tmp/oi_r5b \
  data.params.validation.params.dataset_dir=/tmp/oi_r5b \
  > $B/disk_train_fp_r5.log 2>&1
echo "== job6b disktrain-fp rc=$? =="

# 7. open-loop serving at the SAME offered load, shaping OFF vs ON
#    (capacity ~1.1-1.2 edits/s at bucket 8 -> 1.6/s is ~140% overload)
timeout 1500 python scripts/bench_serving.py --warmup --uint8_out \
  --buckets 8 --arrival_rate 1.6 --duration_s 180 --queue_depth 256 \
  > $B/serving_openloop_off_r5.jsonl 2> $B/serving_openloop_off_r5.log
echo "== job7a serving-unshaped rc=$? =="
timeout 1500 python scripts/bench_serving.py --warmup --uint8_out \
  --buckets 8 --arrival_rate 1.6 --duration_s 180 \
  --deadline_s 8 --queue_depth 16 \
  > $B/serving_openloop_on_r5.jsonl 2> $B/serving_openloop_on_r5.log
echo "== job7b serving-shaped rc=$? =="

# 8. re-run the two probes whose round-4 data was garbage, with the
#    jitter-proof chain lengths (lo=64 hi=512)
timeout 1800 python scripts/bench_ds8_conv.py \
  > $B/ds8_conv_r5.jsonl 2> $B/ds8_conv_r5.log
echo "== job8 ds8conv rc=$? =="
timeout 1800 python scripts/bench_int8_compose.py \
  > $B/int8_compose_r5.jsonl 2> $B/int8_compose_r5.log
echo "== job9 compose rc=$? =="
