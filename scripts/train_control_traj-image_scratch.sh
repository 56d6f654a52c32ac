#!/usr/bin/env bash
# Scratch 1.4B with RoPE.
set -euo pipefail
DATASET_TYPE=${DATASET_TYPE:-bridgev2}
python -m orv_tpu.pipelines.train \
  --experiment traj_image_1.4b_scratch \
  --dataset_type "$DATASET_TYPE" "$@"
