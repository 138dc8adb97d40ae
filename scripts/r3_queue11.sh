#!/bin/bash
# Seed-10 marginal-basin causal arm. The 7-seed replication left seed 10
# in a "marginal basin" (max sep 8 bits, decayed to 0 by ~600) that the
# default restart_min_sep=3 correctly-by-its-rule did not restart.
# RESULTS.md predicts restart_min_sep ~10 (converged seeds sit at 17-21
# bits by epoch 250) converts it into a restart. Arm = plain flagship +
# tracking trap guard + the stricter restart threshold.
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

run_arm() {  # name seed extra_flags...
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
    --max-restarts 3 \
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

run_arm s10_strict 10 \
  --restart-check-epoch 250 --restart-min-sep 10 --trap-guard-ratio 0.15
stage "queue11 complete"
