#!/bin/bash
# Round-5 triplet-repair follow-up: the mechanism-matched PUSH arm(s).
# The pull arms measured the round-4 prediction wrong by mechanism (pull
# inert at the |h|~0 fixed point); triplet_push wires the scale-growing
# dissimilar hinge instead. Protocol identical to the pull arms
# (flagship-constants triplet, 400 epochs, seed 1, per-step).
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }
FAILED=0

run_triplet() {  # tag extra-flags...
  local TAG=$1; shift
  local OUTD="results/eval_triplet_${TAG}"
  if [ -f "$OUTD/done.sentinel" ]; then
    stage "triplet_${TAG} (cached)"; return 0
  fi
  stage "triplet_${TAG}"
  SVTPU_EPOCH_LOG=50 timeout 4800 python -u -m svtpu.cli train \
    --variant triplet --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 400 --batch-size 32 --lr 1e-3 \
    --init-temp 1.0 --final-temp 0.5 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --margin 2.0 --alpha 1.0 --beta-kl 0.2 \
    --triplet-distance l2 --contrast-on p "$@" \
    --select-by combined --seed 1 --no-fused-epoch \
    --save-path "data/ckpt/triplet_${TAG}" --resume \
    --history-out "$OUTD/history.jsonl" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_${TAG} train FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt "data/ckpt/triplet_${TAG}" \
    --out-dir "$OUTD" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_${TAG} eval FAILED"; return 1; }
  timeout 2400 python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt "data/ckpt/triplet_${TAG}" \
    --out-dir "$OUTD" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== triplet_${TAG} eval-hamming FAILED"; return 1; }
  touch "$OUTD/done.sentinel"
}

# Primary: push alone (tests "the missing force is the dissimilar hinge").
run_triplet push1 --triplet-push 1.0 || FAILED=1
# Secondary: push + pull — once scale grows the pull is no longer inert;
# does adding it recover within-state identity (full contrastive forces)?
run_triplet pushpull --triplet-push 1.0 --triplet-pull 1.0 || FAILED=1

if [ "$FAILED" -ne 0 ]; then
  stage "queue r5.5 FAILED"; exit 1
fi
stage "queue r5.5 complete"
