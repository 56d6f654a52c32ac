#!/usr/bin/env bash
set -euo pipefail
python -m orv_tpu.pipelines.metrics "$@"
