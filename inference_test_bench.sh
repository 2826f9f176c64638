#!/usr/bin/env bash
# COCOEE 3500-pair batch generation (reference inference_test_bench.sh).
# Usage: ./inference_test_bench.sh [CKPT] [TEST_BENCH_DIR] [OUTDIR]
set -euo pipefail
CKPT="${1:-model.ckpt}"
BENCH="${2:-test_bench}"
OUTDIR="${3:-results/test_bench}"

exec python scripts/inference_test_bench.py --plms --outdir "$OUTDIR" \
  --config configs/v1.yaml --ckpt "$CKPT" --test_bench_dir "$BENCH" \
  --n_samples 4 --scale 5 --ddim_steps 50 --seed 321
