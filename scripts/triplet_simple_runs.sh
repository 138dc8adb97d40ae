#!/bin/bash
# VERDICT r2 item 3: real-data training for the triplet and simple
# variants on the bundled chinchess clip (480 frames, 5 states).
#
# Triplet: reference __main__ hyperparameters where they exist
# (``triplet_RBVAE_train.py:626-679``: lr 1e-3, temps 1.0->0.5, anneal
# 1e-3, margin 0.2, alpha 1, beta_kl 1, bernoulli_p 0.1, batch 32),
# latent 25 per the eval protocol, val-loss selection. One run with the
# reference L2 distance and one with the Bernoulli-JS distance (the
# reference's dead code path, fixed in svtpu — measured comparison).
#
# Simple: recon+KL loop at 64x64 (the variant the reference runs on raw
# segments, ``simple_RBVAE_train.py:143-188``), loss trajectory printed.
set -uo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${EPOCHS:-400}"
SIMPLE_EPOCHS="${SIMPLE_EPOCHS:-60}"

run_triplet () {  # $1 = distance, $2 = ckpt dir
  SVTPU_EPOCH_LOG=25 python -u -m svtpu.cli train \
    --variant triplet --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs "$EPOCHS" --batch-size 32 --lr 1e-3 \
    --init-temp 1.0 --final-temp 0.5 --anneal-rate 1e-3 \
    --num-steps-to-update 4 --bernoulli-p 0.1 \
    --margin 0.2 --alpha 1.0 --beta-kl 1.0 \
    --triplet-distance "$1" --select-by val_loss --seed 1 \
    --save-path "$2" --resume 2>&1 | tail -4
  echo "=== triplet ($1) done -> $2"
}

run_triplet l2 data/ckpt/triplet_l2
run_triplet js data/ckpt/triplet_js

for D in l2 js; do
  python -u -m svtpu.cli eval-consistency --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt "data/ckpt/triplet_$D" \
    --out-dir "results/eval_triplet_$D" 2>&1 | tail -3
  python -u -m svtpu.cli eval-hamming --video chinese_chess \
    --frames-dir data/frames/chinese_chess --variant triplet \
    --latent-dim 25 --ckpt "data/ckpt/triplet_$D" \
    --out-dir "results/eval_triplet_$D" 2>&1 | tail -3
done

SVTPU_EPOCH_LOG=10 python -u -m svtpu.cli train \
  --variant simple --video chinese_chess \
  --frames-dir data/frames/chinese_chess --resolution 64 \
  --latent-dim 16 --epochs "$SIMPLE_EPOCHS" --batch-size 1 --lr 1e-3 \
  --beta-kl 0.1 --bernoulli-p 0.1 \
  --save-path data/ckpt/simple_chinchess --seed 1
echo "=== simple done"
