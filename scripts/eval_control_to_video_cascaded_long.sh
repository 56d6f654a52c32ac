#!/usr/bin/env bash
# Long-horizon cascaded rollout (reference eval_control_to_video_cascaded_long.sh).
set -euo pipefail
DATASET_TYPE=${DATASET_TYPE:-bridgev2}
python -m orv_tpu.pipelines.evaluate --dataset_type "$DATASET_TYPE" \
  evaluation.cascaded=true evaluation.batch_size=1 "$@"
