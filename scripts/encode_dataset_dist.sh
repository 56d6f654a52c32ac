#!/usr/bin/env bash
# Multi-process offline encoding (reference encode_dataset_dist.sh). On TPU
# pods each jax process takes its slice via jax.process_index(); single-host
# multi-process runs shard by PROC_ID/NUM_PROCS env.
set -euo pipefail
DATASET_TYPE=${DATASET_TYPE:-bridgev2}
python -m orv_tpu.pipelines.encode_dataset --dataset_type "$DATASET_TYPE" "$@"
