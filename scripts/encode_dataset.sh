#!/usr/bin/env bash
set -euo pipefail
DATASET_TYPE=${DATASET_TYPE:-bridgev2}
python -m orv_tpu.pipelines.encode_dataset --dataset_type "$DATASET_TYPE" "$@"
