#!/bin/bash
# Preset v2 causal arms (RESULTS.md "Combined hardened preset"):
# queue12 rejected the arm-everything preset — the tracking guard and
# the L1 brake are incompatible (braked |h| ~0.7/logit forces the
# guard's floor to T~4.5 from epoch 0; the anneal never happens and the
# healthy control pays 0.12 held-out). Candidate shipping preset v2 is
#   --l1-logits 0.1 --restart-check-epoch 250 --restart-min-sep 10
# (no trap guard): the brake bounds the |h| growth that causes the
# ratio trap, the restart handles basin failures, healthy runs anneal
# normally. Arms: seeds 1 (healthy control), 8 (ratio-trap seed),
# 10 (marginal basin), 2 (sub-mode seed). Seed 9's brake-only arm
# (s9_l1a, queue10) already measures this preset there: 0.949/0.849.
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
    --l1-logits 0.1 \
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

run_arm s1_v2 1
run_arm s8_v2 8
run_arm s10_v2 10
run_arm s2_v2 2
stage "queue13 complete"
