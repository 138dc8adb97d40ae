#!/bin/bash
# Round-3 adaptive-trap-guard stage: causal test of
# TrainConfig.trap_guard_ratio on the seed that trapped AT the fixed
# 0.55 floor (seed 8 hardened: erosion at epochs 937-942, RESULTS.md).
# Identical config except the guard replaces the fixed floor
# (final_temp back to the flagship 0.2 so the guard — not a floor — is
# the only thing standing between the run and the trap band).
# Prediction: the guard freezes the anneal when ctx-free |h|/T crosses
# 0.15 and separation survives to the 1000-epoch horizon.
set -uo pipefail
cd "$(dirname "$0")/.."

stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

for SEED in 8 9; do
  if [ -f "results/flagship_replication/eval_s${SEED}_guard/consistency.csv" ]; then
    continue
  fi
  stage "flagship_s${SEED}_guard"
  SVTPU_EPOCH_LOG=100 python -u -m svtpu.cli train \
    --variant contrastive --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 1000 --batch-size 32 --lr 3e-4 \
    --init-temp 2.0 --final-temp 0.2 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --contrast-on p --contextfree-contrast --margin 3.5 \
    --noise-ratio 0.3 --eval-noise-ratio 0.1 --beta-kl 0.2 --alpha 4.0 \
    --select-by combined --seed "$SEED" \
    --restart-check-epoch 250 --restart-min-sep 3.0 --max-restarts 3 \
    --trap-guard-ratio 0.15 \
    --save-path "data/ckpt/flagship_s${SEED}_guard" --resume \
    --history-out "results/flagship_replication/history_s${SEED}_guard.jsonl" \
    2>&1 | tail -4
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_s${SEED}_guard" \
    --out-dir "results/flagship_replication/eval_s${SEED}_guard" 2>&1 | tail -4
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_s${SEED}_guard" \
    --out-dir "results/flagship_replication/eval_s${SEED}_guard" 2>&1 | tail -3
done

stage "queue9 complete"
