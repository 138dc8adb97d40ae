#!/bin/bash
# Round-4 follow-up arms, decided from queue1's s7_v2min replay analysis:
# seed 7 is a PARTIAL basin failure (pair 3 pinned at 0 bits from epoch
# 100 through the full run; no epoch in the whole trajectory has
# min-pair >= 2 AND consistency > 0.6), so min-aggregated SELECTION can
# only trade 0.385 of consistency for the separated pair (0.487 vs
# 0.872 clean). The right lever is the min-based RESTART: the per-pair
# run-max min by epoch 250 is 2.0, so `--restart-on min
# --restart-min-sep 3` re-rolls the init instead of shipping the merged
# pair. Selection stays mean-aggregated (the measured winner).
set -uo pipefail
cd "$(dirname "$0")/.."
stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }
FAILED=0

if [ ! -f data/frames/chinese_chess/0000000000.jpg ]; then
  echo "FATAL: data/frames/chinese_chess is missing" >&2
  exit 1
fi

run_arm() {  # name seed extra-flags...
  local NAME=$1 SEED=$2; shift 2
  local OUT="results/flagship_replication"
  if [ -f "$OUT/eval_${NAME}/done.sentinel" ]; then
    stage "flagship_${NAME} (cached)"
    return 0
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
    --history-out "$OUT/history_${NAME}.jsonl" \
    2>&1 | tail -8
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} train FAILED"; return 1; }
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "$OUT/eval_${NAME}" 2>&1 | tail -4
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} eval-consistency FAILED"; return 1; }
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant contrastive \
    --latent-dim 25 --ckpt "data/ckpt/flagship_${NAME}" \
    --out-dir "$OUT/eval_${NAME}" 2>&1 | tail -3
  [ "${PIPESTATUS[0]}" -eq 0 ] || { echo "=== flagship_${NAME} eval-hamming FAILED"; return 1; }
  touch "$OUT/eval_${NAME}/done.sentinel"
}

# preset v2 + min-based basin check (selection stays mean-aggregated)
run_arm s7_v2minrestart 7 --restart-on min --restart-min-sep 3 || FAILED=1

if [ "$FAILED" -ne 0 ]; then
  stage "queue r4.2 FAILED (see above)"
  exit 1
fi
stage "queue r4.2 complete"
