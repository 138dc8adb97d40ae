#!/bin/bash
# Hardened-preset follow-ups after queue12:
#  s9_combo_min - queue12's s9_combo held 18-bit MEAN separation but its
#    selected checkpoint has adjacent pair 3-4 at 1 bit (mean-aggregated
#    selection is blind to one weak pair - the same blindness the
#    multi-video diagnosis found across videos). Arm = combo recipe +
#    sep_aggregate=min so selection cannot reward a near-merged pair.
#  s11/s12_combo - fresh seeds never used to tune any mitigation: the
#    out-of-sample check that the hardened recipe generalizes.
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

run_arm() {  # name seed extra...
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

run_arm s9_combo_min 9 --sep-aggregate min
run_arm s11_combo 11
run_arm s12_combo 12
stage "queue13 complete"
