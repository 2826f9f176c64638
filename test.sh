#!/usr/bin/env bash
# Golden-example smoke run (reference test.sh surface): three fixed
# (image, mask, reference, seed) triples at scale 5, PLMS 50.
# Usage: ./test.sh [CKPT] [EXAMPLES_DIR] [OUTDIR]
set -euo pipefail
CKPT="${1:-model.ckpt}"
EXAMPLES="${2:-examples}"
OUTDIR="${3:-results}"

run () {
  python scripts/inference.py --plms --outdir "$OUTDIR" \
    --config configs/v1.yaml --ckpt "$CKPT" \
    --image_path "$EXAMPLES/image/example_$1.png" \
    --mask_path "$EXAMPLES/mask/example_$1.png" \
    --reference_path "$EXAMPLES/reference/example_$1.jpg" \
    --seed "$2" --scale 5
}

run 1 321
run 2 5876
run 3 5065
