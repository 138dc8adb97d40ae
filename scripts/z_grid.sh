#!/bin/bash
# Serial hardware grid over the boundary-coupled contrastive formulations
# (contrast_on="p" vs "z", DESIGN.md §8): seeds x anneal rates at a horizon
# where consistency has started to climb (RESULTS.md round-1 trajectory).
# Each run selects by the combined score (consistency x min(separation/3,1));
# checkpoints land under data/zgrid/<tag> and are swept into one trade-off
# chart by `python -m svtpu.cli eval-tradeoff`.
set -uo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${EPOCHS:-500}"
run() {  # tag contrast_on seed anneal
  SVTPU_EPOCH_LOG=25 python -u -m svtpu.cli train \
    --variant contrastive --video chinese_chess \
    --frames-dir data/frames/chinese_chess --latent-dim 25 \
    --epochs "$EPOCHS" --batch-size 32 --lr 3e-4 \
    --init-temp 2.0 --final-temp 0.2 --anneal-rate "$4" \
    --num-steps-to-update 4 --bernoulli-p 0.1 --margin 2.0 \
    --alpha 4.0 --beta-kl 0.2 --contrast-on "$2" --select-by combined \
    --seed "$3" --save-path "data/zgrid/$1" --resume 2>&1 | tail -4
  echo "=== $1 done"
}

run p_s0   p 0 1e-3
run p_s1   p 1 1e-3
run p_a3e4 p 0 3e-4
run z_s1   z 1 1e-3
