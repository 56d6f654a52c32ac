#!/usr/bin/env bash
# TFDS -> mp4 + annotations (reference extract_data_tfds.sh).
set -euo pipefail
python -m orv_tpu.pipelines.data_process "$@"
