#!/bin/bash
# Round-3 stage: the mechanism-targeted multi-video fix arm.
# alpha_scaled compensates the hinge's mean-over-pairs dilution
# (9 global states = 8 adjacent pairs vs the single-video flagship's 4),
# restoring the per-pair dissimilar gradient that the control arm's
# chinchess half never gets (ham_vector [0,0,0,0,...] from epoch 100).
set -uo pipefail
cd "$(dirname "$0")/.."

stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

stage "multi_video_alpha_scaled"
python -u scripts/multi_video_diagnose.py 700 alpha_scaled

stage "queue3 complete"
