#!/bin/bash
# Round-5 takeover of r5_queue1.sh's tail. Rationale: the serial queue1
# ordering (brake_defer -> hardened_s2 -> ... -> b128 seeds) does not fit
# the remaining round wall-clock, and VERDICT item 3's hard requirement
# ("names the recipe from >=5 total arms and >=2 seeds") needs
# hardened_s2 specifically — brake_defer is the bonus mechanism arm. So:
# wait for the orphaned s6 train (queue1's bash was killed at a safe
# point; its child kept running), eval it, then run BOTH multi arms
# CONCURRENTLY (per-step dispatch leaves the chip idle on relay
# round-trips; metrics unaffected, wall-clock fields flagged contended),
# then retry the transiently-failed lstm2_s3, then the b128 seeds.
# Usage: r5_queue4.sh <s6_train_pid>
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }
FAILED=0
OUT="results/flagship_replication"
S6PID="${1:-0}"

# ---- 0. wait for the orphaned s6 train, then eval it ------------------
if [ "$S6PID" -gt 0 ]; then
  stage "waiting for s6 train (pid $S6PID)"
  while kill -0 "$S6PID" 2>/dev/null; do sleep 30; done
fi
if [ ! -f "$OUT/eval_s6_v2minrestart/done.sentinel" ]; then
  stage "flagship_s6_v2minrestart eval"
  timeout 2400 python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_s6_v2minrestart" \
    --out-dir "$OUT/eval_s6_v2minrestart" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || FAILED=1
  timeout 2400 python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_s6_v2minrestart" \
    --out-dir "$OUT/eval_s6_v2minrestart" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || FAILED=1
  [ "$FAILED" -eq 0 ] && touch "$OUT/eval_s6_v2minrestart/done.sentinel"
fi

# ---- 1. both multi-video arms, concurrently ---------------------------
run_multi_train() {  # arm
  local ARM=$1
  stage "multi_${ARM} train"
  timeout 10800 python -u scripts/multi_video_diagnose.py 1500 "$ARM" \
    || { echo "=== multi ${ARM} train FAILED"; return 1; }
}
if [ ! -f "results/multi_diagnose/eval_hardened_s2/done.sentinel" ] \
   || [ ! -f "results/multi_diagnose/eval_brake_defer/done.sentinel" ]; then
  run_multi_train brake_defer > results/r5_multi_brake_defer.log 2>&1 &
  BD=$!
  run_multi_train hardened_s2 2>&1 | tail -5
  HS=${PIPESTATUS[0]}
  wait "$BD"; BDS=$?
  tail -4 results/r5_multi_brake_defer.log
  for ARM in hardened_s2 brake_defer; do
    if [ ! -f "results/multi_diagnose/eval_${ARM}/done.sentinel" ]; then
      stage "multi_${ARM} eval"
      timeout 2400 python -u scripts/multi_video_eval.py "$ARM" \
        && touch "results/multi_diagnose/eval_${ARM}/done.sentinel" \
        || { echo "=== multi ${ARM} eval FAILED"; FAILED=1; }
    fi
  done
  [ "$HS" -eq 0 ] || FAILED=1
  [ "$BDS" -eq 0 ] || FAILED=1
fi

# ---- 2. lstm2_s3 retry (transient TPU backend error in queue3) --------
if [ ! -f "results/percep_fix/eval_lstm2_full_s3/done.sentinel" ]; then
  stage "percep_lstm2_full_s3 (retry)"
  EPOCHS_lstm2_full=600 timeout 7200 \
    python -u scripts/percep_fix_runs.py "lstm2_full@3" \
    && {
      timeout 2400 python -u -m svtpu.cli eval-consistency \
        --video chinese_chess --embeddings data/embeddings_synth.npy \
        --variant percep --latent-dim 25 --lstm-layers 2 \
        --ckpt "data/ckpt/percep_lstm2_full_s3" \
        --out-dir "results/percep_fix/eval_lstm2_full_s3" 2>&1 | tail -4
      timeout 2400 python -u -m svtpu.cli eval-hamming \
        --video chinese_chess --embeddings data/embeddings_synth.npy \
        --variant percep --latent-dim 25 --lstm-layers 2 \
        --ckpt "data/ckpt/percep_lstm2_full_s3" \
        --out-dir "results/percep_fix/eval_lstm2_full_s3" 2>&1 | tail -3
      touch "results/percep_fix/eval_lstm2_full_s3/done.sentinel"
    } || { echo "=== lstm2_s3 retry FAILED"; FAILED=1; }
fi

# ---- 3. b128 seeds (items 6+8), serial --------------------------------
run_arm() {  # name seed extra-flags...
  local NAME=$1 SEED=$2; shift 2
  if [ -f "$OUT/eval_${NAME}/done.sentinel" ]; then
    stage "flagship_${NAME} (cached)"; return 0
  fi
  stage "flagship_${NAME}"
  SVTPU_EPOCH_LOG=100 timeout 7200 python -u -m svtpu.cli train \
    --preset flagship --video chinese_chess \
    --frames-dir data/frames/chinese_chess --seed "$SEED" \
    --no-fused-epoch "$@" \
    --save-path "data/ckpt/flagship_${NAME}" --resume \
    --history-out "$OUT/history_${NAME}.jsonl" 2>&1 | tail -8
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} train FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "$OUT/eval_${NAME}" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} eval FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "$OUT/eval_${NAME}" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} eval-hamming FAILED"; return 1; }
  touch "$OUT/eval_${NAME}/done.sentinel"
}
run_arm s4_b128 4 --batch-size 128 --lr 1.2e-3 --anneal-rate 4e-3 || FAILED=1
run_arm s6_b128 6 --batch-size 128 --lr 1.2e-3 --anneal-rate 4e-3 || FAILED=1

if [ "$FAILED" -ne 0 ]; then
  stage "queue r5.4 FAILED (one or more stages, see above)"
  exit 1
fi
stage "queue r5.4 complete"
