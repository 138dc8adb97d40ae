#!/bin/bash
# Round-3 final multi-video stage: extend the mechanism-fix arms to a
# long horizon (resume from their 700-epoch checkpoints) for the
# headline multi-video number. beta_low validated the KL-dominance
# mechanism (all chinchess pairs separated, no late erosion at 700);
# alpha_scaled is the hinge-side compensation of the same imbalance.
set -uo pipefail
cd "$(dirname "$0")/.."

stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

stage "multi_video_beta_low_1500"
python -u scripts/multi_video_diagnose.py 1500 beta_low

stage "multi_video_alpha_scaled_1500"
python -u scripts/multi_video_diagnose.py 1500 alpha_scaled

stage "queue5 complete"
