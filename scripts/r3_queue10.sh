#!/bin/bash
# Tracking trap-guard causal arms (the freeze-mode arms in queue9 showed
# a one-time freeze is insufficient: |h| keeps growing at the frozen
# temperature). Same seeds, the guard now tracks |h|/0.15.
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

# Arms:
#  s8_track  - tracking guard on the seed whose freeze arm eroded
#  s9_l1a/b  - L1 logit brake at the plain flagship config (final_temp
#              0.2, no guard): the mechanism-rooted fix for the |h|
#              growth itself, two coefficients
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
    --restart-check-epoch 250 --restart-min-sep 3.0 --max-restarts 3 \
    "$@" \
    --save-path "data/ckpt/flagship_${NAME}" --resume \
    --history-out "results/flagship_replication/history_${NAME}.jsonl" \
    2>&1 | tail -4
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "results/flagship_replication/eval_${NAME}" 2>&1 | tail -4
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "results/flagship_replication/eval_${NAME}" 2>&1 | tail -3
}

run_arm s8_track 8 --trap-guard-ratio 0.15
run_arm s9_l1a 9 --l1-logits 0.1
run_arm s9_l1b 9 --l1-logits 0.3
stage "queue10 complete"
exit 0

for SEED in 8 9; do
  if [ -f "results/flagship_replication/eval_s${SEED}_track/consistency.csv" ]; then
    continue
  fi
  stage "flagship_s${SEED}_track"
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
    --save-path "data/ckpt/flagship_s${SEED}_track" --resume \
    --history-out "results/flagship_replication/history_s${SEED}_track.jsonl" \
    2>&1 | tail -4
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_s${SEED}_track" \
    --out-dir "results/flagship_replication/eval_s${SEED}_track" 2>&1 | tail -4
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_s${SEED}_track" \
    --out-dir "results/flagship_replication/eval_s${SEED}_track" 2>&1 | tail -3
done
stage "queue10 complete"
