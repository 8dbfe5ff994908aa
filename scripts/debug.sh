#!/usr/bin/env bash
# Debug probes: label audit, overfit-one-batch, activation/gradient stats.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m multimodal_emotion_detection_tpu.tools.debug --config configs/base.yaml "$@"
