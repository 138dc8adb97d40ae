#!/bin/bash
# Round-5 follow-up queue — chip work that must NOT contend with
# r5_queue1.sh (serial measurements on an idle chip, CLAUDE.md):
#   1. bench_fused_epoch at batch=128 — VERDICT r4 item 8's wall-clock
#      attribution link (the round-4 bullet attributes the residual b128
#      per-epoch gap to per-step dispatch + history writes; fused epochs
#      are the predicted cure, measured here directly rather than by a
#      full training run).
#   2. headline bench.py re-pin on the idle chip (round-end sanity).
# Run AFTER r5_queue1.sh exits.
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

if [ ! -f results/bench_fused_epoch_b128.txt ]; then
  stage "bench_fused_epoch batch=128"
  timeout 4800 python -u benchmarks/bench_suite.py fused_epoch 128 \
    2>&1 | tee results/bench_fused_epoch_b128.txt
fi

stage "headline bench"
timeout 2400 python -u bench.py 2>&1 | tee results/bench_r5_headline.txt

stage "queue r5.2 complete"
