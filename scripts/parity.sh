#!/usr/bin/env bash
# One-command real-data parity harness (round-4 verdict item 7).
#
#   scripts/parity.sh <RAVDESS_ROOT> [extra parity.py flags...]
#
# <RAVDESS_ROOT> must contain audio/ (*.wav) and video/ (*.mp4) — or pass
# two explicit roots via the flags.  Runs BOTH ETL pipelines (ours + the
# reference's /root/reference/src/dataprocessing.py), asserts split
# membership/content parity, then trains the reference's 3-lr big-config
# ladder (raw + logmel frontends) and prints the diff table vs BASELINE.md.
#
# CI-runnable synthetic smoke of the same flow:
#   scripts/parity.sh --synthetic --epochs 3 --platform cpu --max-raw-lrs 0 --lrs 0.001
set -euo pipefail
cd "$(dirname "$0")/.."
if [[ $# -ge 1 && -d "$1" ]]; then
  root="$1"; shift
  exec python scripts/parity.py --audio_root "$root/audio" \
       --video_root "$root/video" "$@"
fi
exec python scripts/parity.py "$@"
