#!/bin/bash
# Round-3 follow-up hardware stages (run after r3_queue.sh drains):
# the multi-video diagnose rerun (API fix), the triplet-JS rerun with a
# durable history file, the multi-image Pallas trunk A/B, and a fresh
# headline bench on the then-idle chip.
set -uo pipefail
cd "$(dirname "$0")/.."

stage() { echo "=== [$(date +%H:%M:%S)] stage: $1"; }

# ---- 1. multi-video erosion diagnosis (fixed probe call) ---------------
if [ ! -f results/multi_diagnose/beta_low.jsonl ] || \
   ! tail -1 results/multi_diagnose/beta_low.jsonl 2>/dev/null | grep -q '"epoch": 700'; then
  stage "multi_video_diagnose"
  python -u scripts/multi_video_diagnose.py 700 control beta_low
fi

# ---- 2. triplet-JS rerun with durable history (best-val-loss number) ---
if [ ! -f results/eval_triplet_js/history.jsonl ]; then
  stage "triplet_js_history"
  rm -rf data/ckpt/triplet_js
  mkdir -p results/eval_triplet_js
  SVTPU_EPOCH_LOG=50 python -u -m svtpu.cli train \
    --variant triplet --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs 300 --batch-size 32 --lr 1e-3 \
    --init-temp 1.0 --final-temp 0.5 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --margin 0.2 --alpha 1.0 --beta-kl 1.0 \
    --triplet-distance js --select-by val_loss --seed 1 \
    --save-path data/ckpt/triplet_js \
    --history-out results/eval_triplet_js/history.jsonl 2>&1 | tail -4
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt data/ckpt/triplet_js \
    --out-dir results/eval_triplet_js 2>&1 | tail -3
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt data/ckpt/triplet_js \
    --out-dir results/eval_triplet_js 2>&1 | tail -3
fi

# ---- 3. multi-image Pallas trunk A/B (idle chip) -----------------------
stage "trunk_ab"
python -u benchmarks/bench_suite.py trunk_ab 2>&1 | tail -12 \
  | tee results/bench_r3/trunk_ab.txt

# ---- 4. fresh headline bench ------------------------------------------
stage "bench_headline"
python -u bench.py | tee results/bench_r3/bench_headline.txt

stage "queue2 complete"
