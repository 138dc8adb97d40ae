#!/bin/bash
# Master runner for the two open experiment queues, sequenced for the
# degraded remote-compile service: queue14 (preset v2 seeds 3-7) reuses
# queue13's compiled executables (pure cache hits), so it runs first;
# queue15 (multi-video braked arm) needs a fresh train-step compile
# (l1_logits term at multi-video shapes) and goes last so a compile
# hang cannot block the cached work. Both queues are idempotent.
set -uo pipefail
cd "$(dirname "$0")/.."
bash scripts/r3_queue14.sh 2>&1 | tee results/r3_queue14.log
bash scripts/r3_queue15.sh 2>&1 | tee results/r3_queue15.log
echo "=== [$(date +%H:%M:%S)] queue16 (14+15) complete"
