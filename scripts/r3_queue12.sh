#!/bin/bash
# Combined hardened-recipe arms (RESULTS.md "Hardening synthesis"): the
# three pathological flagship seeds each have a distinct, causally
# confirmed failure mechanism and fix —
#   seed 8  ratio trap            -> tracking trap guard (queue10)
#   seed 9  unbounded |h| growth  -> L1 logit brake 0.1  (queue10)
#   seed 10 marginal basin        -> restart_min_sep 10  (queue11)
# This queue measures all three fixes TOGETHER (the candidate hardened
# `--preset flagship`) on seeds 8-10, plus seed 1 (the best converging
# seed) as a no-regression check that the brake+guard do not cost a
# healthy run anything.
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

run_arm() {  # name seed
  local NAME=$1 SEED=$2; shift 2
  if [ -f "results/flagship_replication/eval_${NAME}/consistency.csv" ]; then
    return
  fi
  stage "flagship_${NAME}"
  SVTPU_EPOCH_LOG=100 python -u -m svtpu.cli train \
    --variant contrastive --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 1000 --batch-size 32 --lr 3e-4 \
    --init-temp 2.0 --final-temp 0.2 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --contrast-on p --contextfree-contrast --margin 3.5 \
    --noise-ratio 0.3 --eval-noise-ratio 0.1 --beta-kl 0.2 --alpha 4.0 \
    --select-by combined --seed "$SEED" \
    --trap-guard-ratio 0.15 --l1-logits 0.1 \
    --restart-check-epoch 250 --restart-min-sep 10 --max-restarts 3 \
    "$@" \
    --save-path "data/ckpt/flagship_${NAME}" --resume \
    --history-out "results/flagship_replication/history_${NAME}.jsonl" \
    2>&1 | tail -6
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "results/flagship_replication/eval_${NAME}" 2>&1 | tail -4
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "results/flagship_replication/eval_${NAME}" 2>&1 | tail -3
}

run_arm s9_combo 9
run_arm s10_combo 10
run_arm s8_combo 8
run_arm s1_combo 1
stage "queue12 complete"
