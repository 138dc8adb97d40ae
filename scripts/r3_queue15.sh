#!/bin/bash
# Multi-video braked arm (RESULTS.md "hardened multi-video recipe"
# follow-up): replace the 0.95 anneal floor with the L1 logit brake
# (l1_logits 0.1) and anneal all the way to 0.2. On the single-video
# path the brake beats warm-floor arms on held-out consistency because
# training ends at the same cold temperature the hard-threshold eval
# uses; this measures whether that transfers to the multi-video path
# (hardened baseline: clean 0.871 +/- 0.034, min-sep 12).
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

stage "multi_video_braked_1500"
python -u scripts/multi_video_diagnose.py 1500 braked
stage "multi_video_eval_braked"
python -u scripts/multi_video_eval.py braked
stage "queue15 complete"
