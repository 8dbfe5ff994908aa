#!/usr/bin/env bash
# Single training run (the reference's run.slurm equivalent, minus SLURM:
# TPU VMs launch directly). Pass dotted overrides through.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m multimodal_emotion_detection_tpu.train --config configs/base.yaml "$@"
