#!/usr/bin/env bash
# Stage 2: occupancy (depth+label) conditioned finetune.
set -euo pipefail
DATASET_TYPE=${DATASET_TYPE:-bridgev2}
python -m orv_tpu.pipelines.train \
  --experiment traj_image_condfull_2b_finetune \
  --dataset_type "$DATASET_TYPE" "$@"
