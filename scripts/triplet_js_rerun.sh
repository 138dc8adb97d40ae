#!/bin/bash
# Rerun the triplet Bernoulli-JS training after the bf16-saturation NaN
# fix in ``svtpu/ops/losses.py::js_distance_bernoulli`` (the first js run
# NaN'd from epoch 0; see RESULTS.md "Triplet and simple variants").
# Reference hyperparameters as in triplet_simple_runs.sh
# (``triplet_RBVAE_train.py:626-679``), fresh checkpoint (no resume from
# the NaN state).
set -uo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${EPOCHS:-300}"
rm -rf data/ckpt/triplet_js
SVTPU_EPOCH_LOG=25 python -u -m svtpu.cli train \
  --variant triplet --video chinese_chess \
  --frames-dir data/frames/chinese_chess --latent-dim 25 \
  --epochs "$EPOCHS" --batch-size 32 --lr 1e-3 \
  --init-temp 1.0 --final-temp 0.5 --anneal-rate 1e-3 \
  --num-steps-to-update 4 --bernoulli-p 0.1 \
  --margin 0.2 --alpha 1.0 --beta-kl 1.0 \
  --triplet-distance js --select-by val_loss --seed 1 \
  --save-path data/ckpt/triplet_js 2>&1 | tail -4
echo "=== triplet (js, post-fix) done"

python -u -m svtpu.cli eval-consistency --video chinese_chess \
  --frames-dir data/frames/chinese_chess --variant triplet \
  --latent-dim 25 --ckpt data/ckpt/triplet_js \
  --out-dir results/eval_triplet_js 2>&1 | tail -3
python -u -m svtpu.cli eval-hamming --video chinese_chess \
  --frames-dir data/frames/chinese_chess --variant triplet \
  --latent-dim 25 --ckpt data/ckpt/triplet_js \
  --out-dir results/eval_triplet_js 2>&1 | tail -3
