#!/usr/bin/env bash
# 3x2x2 grid sweep (lr x model.dropout x modality_dropout), the reference
# sweep.sh's artifact-harvesting contract -> grid_sweep_results/<tag>/.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m multimodal_emotion_detection_tpu.tools.sweep --config configs/base.yaml "$@"
