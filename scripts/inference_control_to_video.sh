#!/usr/bin/env bash
# Demo inference entry (reference inference_control_to_video.sh)
set -euo pipefail
python -m orv_tpu.pipelines.inference "$@"
