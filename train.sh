#!/usr/bin/env bash
# Training launcher (reference train.sh surface, minus the NCCL/OFI env —
# distribution is the in-process JAX data mesh).
# Env: CONFIG_BASE (default configs/v1.yaml), LOGDIR, CKPT (init checkpoint).
set -euo pipefail
CONFIG_BASE="${CONFIG_BASE:-configs/v1.yaml}"
LOGDIR="${LOGDIR:-logs/pbe}"
CKPT="${CKPT:-}"

ARGS=(--base "$CONFIG_BASE" --train --scale_lr --logdir "$LOGDIR" --bf16_moments)
if [[ -n "$CKPT" ]]; then ARGS+=(--ckpt "$CKPT"); fi
exec python scripts/train.py "${ARGS[@]}" "$@"
