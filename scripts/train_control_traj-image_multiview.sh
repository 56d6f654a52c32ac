#!/usr/bin/env bash
# Stage 3: multiview (only mv_blocks train).
set -euo pipefail
DATASET_TYPE=${DATASET_TYPE:-bridgev2_2}
python -m orv_tpu.pipelines.train \
  --experiment traj_image_2b_multiview \
  --dataset_type "$DATASET_TYPE" "$@"
