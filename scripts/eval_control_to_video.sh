#!/usr/bin/env bash
set -euo pipefail
DATASET_TYPE=${DATASET_TYPE:-bridgev2}
python -m orv_tpu.pipelines.evaluate --dataset_type "$DATASET_TYPE" "$@"
