#!/bin/bash
# Master runner for the two open experiment queues, sequenced for the
# degraded remote-compile service: queue14 (preset v2 seeds 3-7) reuses
# queue13's compiled executables (pure cache hits), so it runs first;
# queue15 (multi-video braked arm) needs a fresh train-step compile
# (l1_logits term at multi-video shapes) and goes last so a compile
# hang cannot block the cached work. Both queues are idempotent.
#
# ADVICE r3: fail fast on the frame-data precondition (queue15 once
# burned its slot on a missing data/frames dir), propagate each queue's
# exit status to an explicit FAILED line, and exit nonzero on any
# failure instead of printing unconditional success.
set -uo pipefail
cd "$(dirname "$0")/.."
if [ ! -f data/frames/chinese_chess/0000000000.jpg ]; then
  echo "FATAL: data/frames/chinese_chess is missing — run" \
       "'python -m svtpu.cli extract --video chinese_chess' first" >&2
  exit 1
fi
FAILED=0
bash scripts/r3_queue14.sh 2>&1 | tee results/r3_queue14.log
[ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== queue14 FAILED"; FAILED=1; }
bash scripts/r3_queue15.sh 2>&1 | tee results/r3_queue15.log
[ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== queue15 FAILED"; FAILED=1; }
if [ "$FAILED" -ne 0 ]; then
  echo "=== [$(date +%H:%M:%S)] queue16 (14+15) FAILED (see above)"
  exit 1
fi
echo "=== [$(date +%H:%M:%S)] queue16 (14+15) complete"
