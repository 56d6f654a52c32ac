#!/usr/bin/env bash
# Occupancy reconstruction stage (reference prepare_data_recon.sh)
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-./data/bridge/renderings}
python -m orv_tpu.pipelines.prepare_dataset --action reconstruction \
  --data_root "$DATA_ROOT" "$@"
