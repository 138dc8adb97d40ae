#!/bin/bash
# Round-3 final multi-video stage. The 700-epoch diagnose arms settled
# the mechanism question:
#   beta_low (beta_kl 0.05): all four chinchess pairs separate (23 bits
#     at 700, still rising), no late erosion — THE fix.
#   alpha_scaled (alpha 8): chinchess pairs [0,0,0,0] for the entire
#     700 epochs — hinge-side compensation does NOT rescue the basin,
#     so the failure is KL dominance in absolute terms, not pair-count
#     hinge dilution. Measured negative; no point extending it.
# This stage extends ONLY beta_low to the full 1500-epoch horizon for
# the headline multi-video number, then runs the held-out 10-trial
# test protocol on its best + latest checkpoints.
set -uo pipefail
cd "$(dirname "$0")/.."

stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

stage "multi_video_beta_low_1500"
python -u scripts/multi_video_diagnose.py 1500 beta_low

stage "multi_video_eval_beta_low"
python -u scripts/multi_video_eval.py beta_low

stage "queue5 complete"
