#!/usr/bin/env bash
# Distributed evaluation (reference eval_control_to_video_dist.sh): the eval
# entry shards its work list by jax.process_index() across pod processes.
set -euo pipefail
DATASET_TYPE=${DATASET_TYPE:-bridgev2}
python -m orv_tpu.pipelines.evaluate --dataset_type "$DATASET_TYPE" "$@"
